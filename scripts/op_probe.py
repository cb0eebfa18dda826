"""Micro-probe: which op class kills the grid pass on TPU?

Times elementwise chains, shifted-slice adds via .at[].add vs pad-based,
and sqrt/divide, on (H, W, 3) f32, all under one jitted fori_loop.
"""
import sys
import time

import jax
import jax.numpy as jnp

H = int(sys.argv[1]) if len(sys.argv) > 1 else 320
W = int(sys.argv[2]) if len(sys.argv) > 2 else 320
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 200


def bench(name, fn, g):
    f = jax.jit(lambda g: jax.lax.fori_loop(0, ITERS, lambda _, s: fn(s), g))
    jax.block_until_ready(f(g))
    t0 = time.perf_counter()
    jax.block_until_ready(f(g))
    per = (time.perf_counter() - t0) / ITERS * 1e6
    print(f"{name:34s}: {per:9.1f} us/iter")
    return per


def ew1(g):  # 1 elementwise op
    return g * 1.0001


def ew10(g):  # 10 chained elementwise ops
    for _ in range(10):
        g = g * 1.0001 + 0.0001
    return g


def slice_diff(g):  # shifted-slice subtract, no scatter
    n = g[:, :-1] - g[:, 1:]
    return g + jnp.pad(n, ((0, 0), (0, 1), (0, 0)))


def at_add_w(g):  # .at[].add along W
    n = g[:, :-1] - g[:, 1:]
    acc = jnp.zeros_like(g)
    acc = acc.at[:, :-1].add(n)
    acc = acc.at[:, 1:].add(-n)
    return g + acc


def pad_add_w(g):  # same math via pad
    n = g[:, :-1] - g[:, 1:]
    acc = jnp.pad(n, ((0, 0), (0, 1), (0, 0))) - jnp.pad(n, ((0, 0), (1, 0), (0, 0)))
    return g + acc


def at_add_h(g):  # .at[].add along H
    n = g[:-1, :] - g[1:, :]
    acc = jnp.zeros_like(g)
    acc = acc.at[:-1, :].add(n)
    acc = acc.at[1:, :].add(-n)
    return g + acc


def sqrt_norm(g):  # the normalize part
    d = jnp.sqrt(jnp.sum(g * g, -1, keepdims=True))
    return g / jnp.maximum(d, 1e-6)


def full_dist_pad(g):  # distance pass (h+v families) all-pad version
    acc = jnp.zeros_like(g)
    for ax in (0, 1):
        sl_a = [slice(None)] * 3
        sl_b = [slice(None)] * 3
        sl_a[ax] = slice(None, -1)
        sl_b[ax] = slice(1, None)
        pa, pb = g[tuple(sl_a)], g[tuple(sl_b)]
        n = pa - pb
        d = jnp.sqrt(jnp.sum(n * n, -1, keepdims=True))
        nn = n / jnp.maximum(d, 1e-6)
        c = d - 0.01
        pt = nn * (-c / 2.0)
        pad_lo = [(0, 0), (0, 0), (0, 0)]
        pad_hi = [(0, 0), (0, 0), (0, 0)]
        pad_lo[ax] = (0, 1)
        pad_hi[ax] = (1, 0)
        acc = acc + jnp.pad(pt, pad_lo) - jnp.pad(pt, pad_hi)
    return g + 0.25 * acc


if __name__ == "__main__":
    g = jax.random.normal(jax.random.PRNGKey(0), (H, W, 3), jnp.float32)
    print(f"grid {H}x{W}x3, {ITERS} iters, backend={jax.devices()[0].platform}")
    bench("1 elementwise", ew1, g)
    bench("10 elementwise", ew10, g)
    bench("slice diff + pad", slice_diff, g)
    bench(".at[].add along W (lane-ish)", at_add_w, g)
    bench("pad add along W", pad_add_w, g)
    bench(".at[].add along H", at_add_h, g)
    bench("sqrt+normalize", sqrt_norm, g)
    bench("full dist pass (pad, h+v)", full_dist_pad, g)

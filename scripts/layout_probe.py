"""Layout probe: is the grid-cloth pass bound by the minor-dim-3 layout?

Times 100 iterations of the distance-family pass over a (H, W) grid in two
forms: vector-minor (H, W, 3) — the current grid_cloth layout — and
component-leading (3, H, W) where the lane dimension is W. On TPU the
latter should vectorize ~40x better (lane padding 3 -> 128 vs W native).

Run:  python scripts/layout_probe.py [H W iters]
"""
import sys
import time

import jax
import jax.numpy as jnp

H = int(sys.argv[1]) if len(sys.argv) > 1 else 320
W = int(sys.argv[2]) if len(sys.argv) > 2 else 320
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 100


def pass_hw3(g, rest_h, rest_v):
    """Distance pass, (H, W, 3) layout (current grid_cloth form)."""
    acc = jnp.zeros_like(g)
    for (pa, pb, rest, sa, sb) in [
        (g[:, :-1], g[:, 1:], rest_h, (slice(None), slice(None, -1)),
         (slice(None), slice(1, None))),
        (g[:-1, :], g[1:, :], rest_v, (slice(None, -1), slice(None)),
         (slice(1, None), slice(None))),
    ]:
        n = pa - pb
        d = jnp.sqrt(jnp.sum(n * n, -1, keepdims=True))
        c = d[..., 0] - rest
        nn = n / jnp.maximum(d, 1e-6)
        dlam = -(c) / 2.0
        pt = nn * dlam[..., None]
        acc = acc.at[sa].add(pt)
        acc = acc.at[sb].add(-pt)
    return g + 0.25 * acc


def pass_3hw(g, rest_h, rest_v):
    """Same math, (3, H, W) layout."""
    acc = jnp.zeros_like(g)
    for (pa, pb, rest, sa, sb) in [
        (g[:, :, :-1], g[:, :, 1:], rest_h,
         (slice(None), slice(None), slice(None, -1)),
         (slice(None), slice(None), slice(1, None))),
        (g[:, :-1, :], g[:, 1:, :], rest_v,
         (slice(None), slice(None, -1), slice(None)),
         (slice(None), slice(1, None), slice(None))),
    ]:
        n = pa - pb
        d = jnp.sqrt(jnp.sum(n * n, 0, keepdims=True))
        c = d[0] - rest
        nn = n / jnp.maximum(d, 1e-6)
        dlam = -(c) / 2.0
        pt = nn * dlam[None]
        acc = acc.at[sa].add(pt)
        acc = acc.at[sb].add(-pt)
    return g + 0.25 * acc


def bench(name, fn, *args):
    f = jax.jit(lambda g: jax.lax.fori_loop(
        0, ITERS, lambda _, s: fn(s, *args[1:]), g))
    out = f(args[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(args[0])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    per = dt / ITERS * 1e6
    # bytes: read g + write g + acc traffic, ~6 passes over 3*H*W*4B
    sol = 6 * 3 * H * W * 4 / 2.4e12 * 1e6  # ~2.4 TB/s HBM shorthand
    print(f"{name}: {per:9.1f} us/iter   (naive SoL ~{sol:.1f} us)")
    return per


if __name__ == "__main__":
    key = jax.random.PRNGKey(0)
    g = jax.random.normal(key, (H, W, 3), jnp.float32)
    rest_h = jnp.ones((H, W - 1), jnp.float32) * 0.01
    rest_v = jnp.ones((H - 1, W), jnp.float32) * 0.01
    print(f"grid {H}x{W}, {ITERS} iters, backend={jax.devices()[0].platform}")
    bench("(H, W, 3) vec-minor  ", pass_hw3, g, rest_h, rest_v)
    g2 = jnp.transpose(g, (2, 0, 1))
    bench("(3, H, W) comp-lead  ", pass_3hw, g2, rest_h, rest_v)

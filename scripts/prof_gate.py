"""Time the per-tet sphere pre-gate formulations at the contact-MPC
batch shape: component planes (VPU) vs |p|²+|c|²−2p·c (MXU cross term).
"""
import time
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from positionbaseddynamics_tpu.scene import load_scene
from positionbaseddynamics_tpu.collision.batched import _compact

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8

s = load_scene(
    "/root/reference/data/scenes/ArmadilloCollisionScene.json",
    cache_dir="/tmp/pbd_bench_sdf_cache", max_sdf_resolution=14)
state0, cset, cfg, pipe = s.state, s.cset, s.config, s.pipeline
pairs = pipe.solid_pairs

x0 = state0.particles.x
xb = jnp.broadcast_to(x0, (B,) + x0.shape) + 1e-4 * jax.random.normal(
    jax.random.PRNGKey(0), (B,) + x0.shape)


def timeit(name, fn, iters=50):
    f = jax.jit(jax.vmap(fn))
    out = jax.block_until_ready(f(xb))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(xb + out.sum() * 1e-20)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:8.2f} ms")
    return dt


def spheres(tc, x, cache={}):
    verts = x[tc.tets]
    c3 = verts.mean(axis=1)
    r2 = jnp.max(jnp.sum((verts - c3[:, None, :]) ** 2, -1), axis=1)
    return c3, r2


def gate_planes(x):
    acc = 0.0
    for (off, cnt, fric), tc in pairs:
        px = x[off:off + cnt]
        tc3, tr2 = spheres(tc, x)
        d2 = sum((px[:, None, c] - tc3[None, :, c]) ** 2
                 for c in range(3))
        ok_p = (d2 < tr2[None, :]).any(-1)
        acc = acc + ok_p.sum()
    return acc


def gate_mxu(x):
    acc = 0.0
    for (off, cnt, fric), tc in pairs:
        px = x[off:off + cnt]
        tc3, tr2 = spheres(tc, x)
        cross = px @ tc3.T                      # (P, T) via MXU
        p2 = jnp.sum(px * px, -1)
        thr = tr2 - jnp.sum(tc3 * tc3, -1)      # (T,)
        ok_p = ((p2[:, None] - 2.0 * cross) < thr[None, :]).any(-1)
        acc = acc + ok_p.sum()
    return acc


def gate_compact(x):
    acc = 0.0
    for (off, cnt, fric), tc in pairs:
        px = x[off:off + cnt]
        tc3, tr2 = spheres(tc, x)
        d2 = sum((px[:, None, c] - tc3[None, :, c]) ** 2
                 for c in range(3))
        ok_p = (d2 < tr2[None, :]).any(-1)
        sel0, act0, drop0 = _compact(ok_p, 256, cnt)
        acc = acc + px[sel0].sum() + act0.sum()
    return acc


def full(x):
    sc = pipe.detect_solids(x, jnp.zeros_like(x),
                            state0.particles.inv_mass)
    return sc.cp1_frozen.sum() + sc.mask.sum()


timeit("sphere gate, component planes", gate_planes)
timeit("sphere gate, MXU cross term", gate_mxu)
timeit("gate + compaction + gathers", gate_compact)
timeit("full detect_solids (new)", full)

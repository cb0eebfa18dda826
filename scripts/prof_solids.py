"""Incremental timing of detect_solid_contacts stages under vmap at the
contact-MPC batch shape."""
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
print(f"{len(pairs)} solid pairs")
for (off, cnt, fric), tc in pairs:
    print(f"  pts[{off}:{off + cnt}] vs tets {tc.tets.shape} "
          f"faces {tc.surf_a.shape}")

x0 = state0.particles.x
xb = jnp.broadcast_to(x0, (B,) + x0.shape) + 1e-4 * jax.random.normal(
    jax.random.PRNGKey(0), (B,) + x0.shape)


def timeit(name, fn, iters=50):
    f = jax.jit(jax.vmap(fn))
    out = jax.block_until_ready(f(xb))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(xb + out.sum() * 1e-20)   # defeat tunnel result caching
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt * 1e3:8.2f} ms")
    return dt


from positionbaseddynamics_tpu.ops.mathutils import inv3


def stage_inside(x):
    acc = 0.0
    for (off, cnt, fric), tc in pairs:
        px = x[off:off + cnt]
        xt0 = x[tc.tets[:, 0]]
        a = jnp.stack([x[tc.tets[:, 1]] - xt0,
                       x[tc.tets[:, 2]] - xt0,
                       x[tc.tets[:, 3]] - xt0], axis=-1)
        inv_a = inv3(a)
        rel = [px[:, None, c] - xt0[None, :, c] for c in range(3)]
        b3 = [sum(inv_a[None, :, i, c] * rel[c] for c in range(3))
              for i in range(3)]
        inside = ((b3[0] >= 0.0) & (b3[1] >= 0.0) & (b3[2] >= 0.0)
                  & (b3[0] + b3[1] + b3[2] <= 1.0))
        acc = acc + inside.sum()
    return acc


def stage_inside_argmax(x):
    acc = 0.0
    for (off, cnt, fric), tc in pairs:
        px = x[off:off + cnt]
        xt0 = x[tc.tets[:, 0]]
        a = jnp.stack([x[tc.tets[:, 1]] - xt0,
                       x[tc.tets[:, 2]] - xt0,
                       x[tc.tets[:, 3]] - xt0], axis=-1)
        inv_a = inv3(a)
        rel = [px[:, None, c] - xt0[None, :, c] for c in range(3)]
        b3 = [sum(inv_a[None, :, i, c] * rel[c] for c in range(3))
              for i in range(3)]
        inside = ((b3[0] >= 0.0) & (b3[1] >= 0.0) & (b3[2] >= 0.0)
                  & (b3[0] + b3[1] + b3[2] <= 1.0))
        has = inside.any(-1)
        tet_idx = jnp.argmax(inside, axis=-1)
        bary = jnp.stack(
            [jnp.take_along_axis(b, tet_idx[:, None], axis=1)[:, 0]
             for b in b3], axis=-1)
        acc = acc + bary.sum() + has.sum() + tet_idx.sum()
    return acc


def stage_compacted(x):
    acc = 0.0
    for (off, cnt, fric), tc in pairs:
        px = x[off:off + cnt]
        xt0 = x[tc.tets[:, 0]]
        a = jnp.stack([x[tc.tets[:, 1]] - xt0,
                       x[tc.tets[:, 2]] - xt0,
                       x[tc.tets[:, 3]] - xt0], axis=-1)
        inv_a = inv3(a)
        rel = [px[:, None, c] - xt0[None, :, c] for c in range(3)]
        b3 = [sum(inv_a[None, :, i, c] * rel[c] for c in range(3))
              for i in range(3)]
        inside = ((b3[0] >= 0.0) & (b3[1] >= 0.0) & (b3[2] >= 0.0)
                  & (b3[0] + b3[1] + b3[2] <= 1.0))
        has = inside.any(-1)
        tet_idx = jnp.argmax(inside, axis=-1)
        bary = jnp.stack(
            [jnp.take_along_axis(b, tet_idx[:, None], axis=1)[:, 0]
             for b in b3], axis=-1)
        sel, act, dropped = _compact(has, 192, cnt)
        acc = (acc + px[sel].sum() + bary[sel].sum()
               + tet_idx[sel].sum() + act.sum())
    return acc


def stage_surface(x):
    acc = 0.0
    for (off, cnt, fric), tc in pairs:
        px = x[off:off + cnt]
        xt0 = x[tc.tets[:, 0]]
        a = jnp.stack([x[tc.tets[:, 1]] - xt0,
                       x[tc.tets[:, 2]] - xt0,
                       x[tc.tets[:, 3]] - xt0], axis=-1)
        inv_a = inv3(a)
        rel = [px[:, None, c] - xt0[None, :, c] for c in range(3)]
        b3 = [sum(inv_a[None, :, i, c] * rel[c] for c in range(3))
              for i in range(3)]
        inside = ((b3[0] >= 0.0) & (b3[1] >= 0.0) & (b3[2] >= 0.0)
                  & (b3[0] + b3[1] + b3[2] <= 1.0))
        has = inside.any(-1)
        tet_idx = jnp.argmax(inside, axis=-1)
        bary = jnp.stack(
            [jnp.take_along_axis(b, tet_idx[:, None], axis=1)[:, 0]
             for b in b3], axis=-1)
        sel, act, dropped = _compact(has, 192, cnt)
        tet_i = tet_idx[sel]
        rx = (tc.rest_x0[tet_i]
              + jnp.einsum("pij,pj->pi", tc.rest_a[tet_i], bary[sel]))
        cp0, cp_dropped = tc.closest_surface_point_gated(
            rx, need=has[sel] & act)
        acc = acc + cp0.sum()
    return acc


def stage_full(x):
    sc = pipe.detect_solids(x, jnp.zeros_like(x),
                            state0.particles.inv_mass)
    return sc.cp1_frozen.sum() + sc.mask.sum()


timeit("A: (P,T) inside planes", stage_inside)
timeit("B: + argmax/bary take", stage_inside_argmax)
timeit("C: + compaction + gathers", stage_compacted)
timeit("D: + rest-surface closest point", stage_surface)
timeit("E: full detect_solids", stage_full)

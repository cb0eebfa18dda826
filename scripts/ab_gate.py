"""Same-session A/B of the detect_solids sphere-gate formulation
(MXU cross-term vs VPU component planes) — the axon tunnel drifts ~35%
between sessions, so only same-process deltas count."""
import time
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from positionbaseddynamics_tpu.scene import load_scene
from positionbaseddynamics_tpu.collision import solid

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8

s = load_scene(
    "/root/reference/data/scenes/ArmadilloCollisionScene.json",
    cache_dir="/tmp/pbd_bench_sdf_cache", max_sdf_resolution=14)
state0, cset, cfg, pipe = s.state, s.cset, s.config, s.pipeline

x0 = state0.particles.x
xb = jnp.broadcast_to(x0, (B,) + x0.shape) + 1e-4 * jax.random.normal(
    jax.random.PRNGKey(0), (B,) + x0.shape)


def run(name, iters=50):
    def f1(x):
        sc = pipe.detect_solids(x, jnp.zeros_like(x),
                                state0.particles.inv_mass)
        return sc.cp1_frozen.sum() + sc.mask.sum()
    f = jax.jit(jax.vmap(f1))
    out = jax.block_until_ready(f(xb))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(xb + out.sum() * 1e-20)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:8.2f} ms")


for flag in (True, False, True, False):
    solid._PRE_GATE_MXU = flag
    run(f"detect_solids, MXU gate={flag}")

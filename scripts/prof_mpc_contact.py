"""Profile the vmapped full-pipeline ArmadilloCollisionScene step at the
contact-MPC batch shape: which phase eats the time under vmap?"""
import time
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from positionbaseddynamics_tpu.scene import load_scene
from positionbaseddynamics_tpu.solver.step import (
    step as step_fn, velocity_constraint_projection, _substep)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8

s = load_scene(
    "/root/reference/data/scenes/ArmadilloCollisionScene.json",
    cache_dir="/tmp/pbd_bench_sdf_cache", max_sdf_resolution=14)
state0, cset, cfg, pipe = s.state, s.cset, s.config, s.pipeline

batch = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), state0)


def timeit(name, fn, arg, iters=30):
    out = jax.block_until_ready(fn(arg))
    t0 = time.perf_counter()
    x = arg
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1e3:8.2f} ms/step   {1 / dt:8.1f} steps/s "
          f"({1 / dt * B:8.1f} aggregate)")
    return dt


# full step
full = jax.jit(jax.vmap(lambda st: step_fn(st, cset, cfg, pipe)))
t_full = timeit("full pipeline", full, batch)

# no pipeline (pure solver)
nop = jax.jit(jax.vmap(lambda st: step_fn(st, cset, cfg, None)))
t_nop = timeit("solver only (no collision)", nop, batch)

# solids detection only
def solids_only(st):
    p = st.particles
    sc = pipe.detect_solids(p.x, p.v, p.inv_mass)
    return dataclasses.replace(
        st, particles=dataclasses.replace(
            p, x=p.x + 1e-12 * sc.cp1_frozen[:1, :1].sum()))
so = jax.jit(jax.vmap(solids_only))
t_so = timeit("detect_solids only", so, batch)

# rigid detection + velocity projection (pipeline pass, no substep)
def vel_only(st):
    return velocity_constraint_projection(st, cset, cfg, pipe, None)
vo = jax.jit(jax.vmap(vel_only))
t_vo = timeit("rigid CD + velocity projection", vo, batch)

print(f"\nsum of parts: {1e3 * (t_nop + t_so + t_vo):.2f} ms vs full "
      f"{1e3 * t_full:.2f} ms")

"""Split the rigid-CD + velocity-projection 7.8 ms at the contact-MPC
batch shape into detect_rigid / detect_particles / solve passes."""
import time
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from positionbaseddynamics_tpu.scene import load_scene

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8

s = load_scene(
    "/root/reference/data/scenes/ArmadilloCollisionScene.json",
    cache_dir="/tmp/pbd_bench_sdf_cache", max_sdf_resolution=14)
state0, cset, cfg, pipe = s.state, s.cset, s.config, s.pipeline
print("rigid bodies:", state0.rigid.x.shape if state0.rigid is not None
      else None, " max_iterations_v:", cfg.max_iterations_v,
      " contact_mode:", cfg.contact_solver_mode)

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
    print(f"{name:40s} {dt * 1e3:8.2f} ms")
    return dt


def f_rigid(x):
    rc = pipe.detect_rigid(state0.rigid)
    if rc is None:
        return x[0, 0] * 0
    return rc.mask.sum() + x[0, 0] * 0


def f_particles(x):
    pc = pipe.detect_particles(x, jnp.zeros_like(x),
                               state0.particles.inv_mass, state0.rigid)
    return pc.mask.sum() + pc.normal.sum()


import dataclasses
from positionbaseddynamics_tpu.solver.step import (
    velocity_constraint_projection)


def f_vel_full(x):
    st = dataclasses.replace(
        state0, particles=dataclasses.replace(state0.particles, x=x))
    st = velocity_constraint_projection(st, cset, cfg, pipe, None)
    return st.particles.v.sum() + st.rigid.v.sum()


timeit("detect_rigid", f_rigid)
timeit("detect_particles", f_particles)
timeit("full velocity projection", f_vel_full)

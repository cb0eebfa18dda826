"""Time the REAL solver components on the bench scene (320x320 cloth).

Each component is scanned ITERS times inside one jit so dispatch cost
amortizes; prints us/iteration per component.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
N = int(sys.argv[2]) if len(sys.argv) > 2 else 320

from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig, rollout
from positionbaseddynamics_tpu.solver.step import _substep
from positionbaseddynamics_tpu.ops import integration

b = SceneBuilder()
tm = b.add_regular_triangle_model(N, N, scale=(2.0, 2.0))
b.set_mass(tm.offset, 0.0)
b.set_mass(tm.offset + N - 1, 0.0)
b.add_cloth_constraints(tm, method=4, distance_stiffness=1e5)
b.add_bending_constraints(tm, method=3, stiffness=0.05)
state, cset = b.build()
cfg = StepConfig()
gc = cset.grid_cloths[0]
h = cfg.dt / cfg.substeps

x0 = state.particles.x
w0 = state.particles.inv_mass
lam0 = gc.init_lambda()


def timed(name, init, body):
    f = jax.jit(lambda c: jax.lax.fori_loop(0, ITERS, lambda _, s: body(s), c))
    jax.block_until_ready(f(init))
    t0 = time.perf_counter()
    jax.block_until_ready(f(init))
    per = (time.perf_counter() - t0) / ITERS * 1e6
    print(f"{name:30s}: {per:10.1f} us/iter")


print(f"scene {N}x{N} = {N*N} particles, {ITERS} iters, "
      f"backend={jax.devices()[0].platform}")

timed("integrate (euler+velupd)", x0, lambda x: integration.velocity_update_first_order(
    h, w0, *integration.semi_implicit_euler(
        h, w0, x, jnp.zeros_like(x), jnp.broadcast_to(
            jnp.asarray(cfg.gravity, jnp.float32), x.shape))[:1], x,
    jnp.zeros_like(x))[0] if False else integration.semi_implicit_euler(
        h, w0, x, jnp.zeros_like(x), jnp.broadcast_to(
            jnp.asarray(cfg.gravity, jnp.float32), x.shape))[0])

g0 = x0[:N * N].reshape(N, N, 3)
wg = w0[:N * N].reshape(N, N, 1)
dl0, bl0 = gc.init_lambda()

timed("dist pass only", (g0, dl0),
      lambda c: gc._distance_pass(c[0], wg, c[1], jnp.float32(h), 1.0))
timed("bend pass only", (g0, bl0),
      lambda c: gc._bending_pass(c[0], wg, c[1], jnp.float32(h), 1.0))
timed("gc.project full", (x0, lam0),
      lambda c: gc.project(c[0], w0, c[1], h, 1.0))
timed("substep full", state, lambda s: _substep(s, cset, h, cfg))

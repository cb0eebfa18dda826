import os
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig, rollout
from positionbaseddynamics_tpu.solver.grid_tet_pallas import make_pallas_tet_step
w, h, d = 24, 12, 12
b = SceneBuilder()
tm = b.add_regular_tet_model(w, h, d, scale=(4.0, 1.0, 1.0))
for j in range(h):
    for k in range(d):
        b.set_mass(tm.offset + j * d + k, 0.0)
b.add_solid_constraints(tm, method=3, stiffness=1e5, poisson_ratio=0.3)
state, cset = b.build()
gt = cset.grid_tets[0]
for substeps, mi, ns in ((5, 5, 10), (5, 2, 10)):
    cfg = StepConfig(substeps=substeps, max_iterations=mi)
    fin, _ = jax.jit(lambda s: rollout(s, cset, cfg, ns))(state)
    ps = make_pallas_tet_step(gt, state.particles.inv_mass, dt=cfg.dt,
                              substeps=substeps, max_iterations=mi, n_steps=ns)
    xc, vc = ps(state.particles.x, state.particles.v)
    dev = float(jnp.max(jnp.abs(xc - fin.particles.x)))
    print(f"substeps={substeps} maxIter={mi} steps={ns}: dev={dev:.3e}")

"""Pallas tet kernel vs the XLA structured-grid path — same math, one
fused kernel; trajectories must match."""
import numpy as np

import jax

from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig, rollout


def _build(w=10, h=6, d=6):
    b = SceneBuilder()
    tm = b.add_regular_tet_model(w, h, d, scale=(2.0, 0.5, 0.5))
    for j in range(h):
        for k in range(d):
            b.set_mass(tm.offset + j * d + k, 0.0)
    b.add_solid_constraints(tm, method=3, stiffness=1e5,
                            poisson_ratio=0.3)
    return b.build()


def test_pallas_tet_step_matches_xla_grid_path():
    from positionbaseddynamics_tpu.solver.grid_tet_pallas import (
        make_pallas_tet_step)

    state, cset = _build()
    assert cset.grid_tets, "expected the structured tet fast path"
    cfg = StepConfig(dt=0.005, substeps=5, max_iterations=1)
    gt = cset.grid_tets[0]
    step = make_pallas_tet_step(
        gt, state.particles.inv_mass, dt=cfg.dt, substeps=cfg.substeps,
        max_iterations=cfg.max_iterations)

    fin, _ = jax.jit(lambda s: rollout(s, cset, cfg, 20))(state)
    x_ref = np.asarray(fin.particles.x)

    x, v = state.particles.x, state.particles.v
    for _ in range(20):
        x, v = step(x, v)
    x_pl = np.asarray(x)
    assert np.isfinite(x_pl).all()
    # the bar must actually have sagged
    assert np.abs(x_pl - np.asarray(state.particles.x)).max() > 1e-3
    np.testing.assert_allclose(x_pl, x_ref, atol=2e-5)

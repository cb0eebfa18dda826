"""Structured tet-grid fast path (solver/grid_tet.py) vs the generic
unstructured FEM-tet batch — identical Jacobi math, so a regular tet bar
built both ways must produce the same trajectory (BarDemo workload,
``Demos/BarDemo/main.cpp`` / ``SimulationModel.cpp:921-1005``)."""
import numpy as np

import jax

from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig, rollout


def _build(structured, w=8, h=4, d=4, stiffness=1e5):
    b = SceneBuilder(use_structured_grid=structured)
    tm = b.add_regular_tet_model(w, h, d, scale=(2.0, 0.5, 0.5))
    # cantilever: pin the i=0 face (BarDemo pins one end)
    for j in range(h):
        for k in range(d):
            b.set_mass(tm.offset + 0 * h * d + j * d + k, 0.0)
    b.add_solid_constraints(tm, method=3, stiffness=stiffness,
                            poisson_ratio=0.3)
    return b.build()


def test_grid_tet_batch_is_built():
    state, cset = _build(True)
    assert len(cset.grid_tets) == 1
    assert cset.fem_tetra is None
    gt = cset.grid_tets[0]
    assert (gt.width, gt.height, gt.depth) == (8, 4, 4)
    state_u, cset_u = _build(False)
    assert cset_u.grid_tets == ()
    assert cset_u.fem_tetra is not None
    # same tet count: 5 per cell
    assert cset_u.fem_tetra.idx.shape[0] == 7 * 3 * 3 * 5


def test_grid_tet_matches_unstructured_trajectory():
    cfg = StepConfig(dt=0.005, substeps=5, max_iterations=1)
    state_s, cset_s = _build(True)
    state_u, cset_u = _build(False)
    fin_s, _ = jax.jit(lambda s: rollout(s, cset_s, cfg, 20))(state_s)
    fin_u, _ = jax.jit(lambda s: rollout(s, cset_u, cfg, 20))(state_u)
    x_s = np.asarray(fin_s.particles.x)
    x_u = np.asarray(fin_u.particles.x)
    assert np.isfinite(x_s).all()
    # the bar actually bent under gravity
    assert np.abs(x_s - np.asarray(state_s.particles.x)).max() > 1e-3
    np.testing.assert_allclose(x_s, x_u, atol=2e-5)


def test_grid_tet_pinned_face_stays():
    state, cset = _build(True)
    cfg = StepConfig()
    fin, _ = jax.jit(lambda s: rollout(s, cset, cfg, 10))(state)
    x0 = np.asarray(state.particles.x)
    x = np.asarray(fin.particles.x)
    pinned = np.asarray(state.particles.inv_mass) == 0.0
    np.testing.assert_allclose(x[pinned], x0[pinned], atol=1e-7)
    # free end fell
    assert x[~pinned, 1].mean() < x0[~pinned, 1].mean() - 1e-4

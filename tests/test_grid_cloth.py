"""Structured-grid cloth fast path (``solver/grid_cloth.py``) parity vs the
generic unstructured Jacobi path — same constraint topology
(``SimulationModel::addRegularTriangleModel``, ``SimulationModel.cpp:831``;
``addClothConstraints``/``addBendingConstraints``, ``:1125-1240``), same
Jacobi solve semantics, different execution form (dense shifted slices vs
gather/scatter)."""
import jax
import numpy as np
import pytest

from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig, rollout


def _build(n, structured, method=4, bend_method=3, bend=0.05, stiff=1e5):
    b = SceneBuilder(use_structured_grid=structured)
    tm = b.add_regular_triangle_model(n, n, scale=(2.0, 2.0))
    b.set_mass(tm.offset, 0.0)
    b.set_mass(tm.offset + n - 1, 0.0)
    b.add_cloth_constraints(tm, method=method, distance_stiffness=stiff)
    if bend_method:
        b.add_bending_constraints(tm, method=bend_method, stiffness=bend)
    return b.build()


@pytest.mark.parametrize("method,bend_method", [(4, 3), (1, 2), (4, 0)])
def test_grid_matches_unstructured(method, bend_method):
    """Trajectory parity between the stencil fast path and the generic
    batches for XPBD (4/3) and classic (1/2) cloth, bending on/off."""
    n = 12
    s_state, s_cset = _build(n, True, method, bend_method)
    u_state, u_cset = _build(n, False, method, bend_method)
    assert len(s_cset.grid_cloths) == 1
    assert s_cset.distance is None and s_cset.isometric_bending is None
    cfg = StepConfig()
    sf, _ = jax.jit(lambda s: rollout(s, s_cset, cfg, 30))(s_state)
    uf, _ = jax.jit(lambda s: rollout(s, u_cset, cfg, 30))(u_state)
    np.testing.assert_allclose(
        np.asarray(sf.particles.x), np.asarray(uf.particles.x),
        atol=2e-4, rtol=0)
    np.testing.assert_allclose(
        np.asarray(sf.particles.v), np.asarray(uf.particles.v),
        atol=2e-2, rtol=0)


def test_grid_constraint_counts():
    """Stencil families cover exactly the unstructured edge/stencil sets."""
    n = 9
    _, s_cset = _build(n, True)
    _, u_cset = _build(n, False)
    gc = s_cset.grid_cloths[0]
    n_dist = sum(int(np.prod(gc._family_shape(f))) for f in gc.rest)
    n_bend = sum(int(np.prod(gc._family_shape(f))) for f in gc.q_mat)
    assert n_dist == u_cset.distance.idx.shape[0]
    assert n_bend == u_cset.isometric_bending.idx.shape[0]


def test_grid_rejects_gauss_seidel():
    state, cset = _build(8, True)
    cfg = StepConfig(solver_mode="gauss_seidel")
    with pytest.raises(ValueError, match="jacobi"):
        rollout(state, cset, cfg, 1)


def test_grid_vmap_batch():
    """The stencil path vmaps over rollout batches like the generic path."""
    import jax.numpy as jnp
    state, cset = _build(8, True)
    cfg = StepConfig()
    batched = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (3,) + a.shape), state)
    fin = jax.jit(jax.vmap(lambda s: rollout(s, cset, cfg, 5)[0]))(batched)
    x = np.asarray(fin.particles.x)
    assert np.isfinite(x).all()
    np.testing.assert_allclose(x[0], x[2])

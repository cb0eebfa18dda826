"""End-to-end cloth tests: physics invariants + exact parity of the colored
Gauss-Seidel mode against an independent sequential numpy XPBD stepper
(the SURVEY §4 test strategy: trajectory parity at fixed substeps/iterations).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig, make_step_fn, rollout


def build_cloth(n=10, method=4, stiffness=1e5, bending=True,
                structured=False):
    b = SceneBuilder(use_structured_grid=structured)
    tm = b.add_regular_triangle_model(n, n, scale=(2.0, 2.0))
    b.set_mass(tm.offset, 0.0)
    b.set_mass(tm.offset + n - 1, 0.0)
    b.add_cloth_constraints(tm, method=method, distance_stiffness=stiffness)
    if bending:
        b.add_bending_constraints(tm, method=3, stiffness=0.05)
    return b.build()


@pytest.mark.parametrize("mode", ["jacobi", "gauss_seidel"])
def test_cloth_hangs_stably(mode):
    state, cset = build_cloth()
    cfg = StepConfig(solver_mode=mode)
    final, _ = jax.jit(lambda s: rollout(s, cset, cfg, 200))(state)
    x = np.asarray(final.particles.x)
    assert np.isfinite(x).all()
    # pinned corners never move
    np.testing.assert_allclose(x[0], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(x[9], [2, 0, 0], atol=1e-6)
    # cloth fell: mean height below initial 1.0
    assert x[:, 1].mean() < 1.0
    # nothing exploded
    assert np.abs(x).max() < 10.0


def test_cloth_edge_lengths_preserved_gs():
    # With stiff XPBD distance constraints and GS, edge strain stays small.
    state, cset = build_cloth(stiffness=1e6, bending=False)
    cfg = StepConfig(solver_mode="gauss_seidel", substeps=10)
    final, _ = jax.jit(lambda s: rollout(s, cset, cfg, 300))(state)
    x = np.asarray(final.particles.x)
    idx = np.asarray(cset.distance.idx)
    rest = np.asarray(cset.distance.rest_length)
    lengths = np.linalg.norm(x[idx[:, 0]] - x[idx[:, 1]], axis=-1)
    strain = np.abs(lengths - rest) / rest
    assert strain.max() < 0.02, strain.max()


def _numpy_reference_step(x, v, inv_mass, idx, rest, k_stiff, colors, cfg):
    """Independent sequential XPBD stepper (float64 numpy): substep loop of
    integrate → color-major sequential constraint solve → velocity update,
    with λ reset per projection (Constraints.cpp:1240-1241 semantics)."""
    h = cfg.dt / cfg.substeps
    g = np.array(cfg.gravity)
    order = np.argsort(colors, kind="stable")
    for _ in range(cfg.substeps):
        old_x = x.copy()
        act = inv_mass > 0
        v = v + np.where(act[:, None], g * h, 0.0)
        x = x + np.where(act[:, None], v * h, 0.0)
        lam = np.zeros(len(idx))
        for _ in range(cfg.max_iterations):
            for ci in order:
                i, j = idx[ci]
                w0, w1 = inv_mass[i], inv_mass[j]
                n = x[i] - x[j]
                d = np.linalg.norm(n)
                if d < 1e-6:
                    continue
                n = n / d
                c = d - rest[ci]
                alpha = 0.0 if k_stiff == 0 else 1.0 / (k_stiff * h * h)
                kk = w0 + w1 + alpha
                if abs(kk) < 1e-6:
                    continue
                dlam = -(c + alpha * lam[ci]) / kk
                lam[ci] += dlam
                x[i] += w0 * dlam * n
                x[j] -= w1 * dlam * n
        v = np.where(act[:, None], (x - old_x) / h, v)
    return x, v


def test_gauss_seidel_matches_sequential_reference():
    """Colored-GS on device must equal the sequential reference in
    color-major order — validating that within-color scatter is
    conflict-free and the projection order matches (SURVEY §2.6)."""
    n = 6
    state, cset = build_cloth(n=n, stiffness=1e4, bending=False)
    cfg = StepConfig(solver_mode="gauss_seidel", substeps=3, max_iterations=2)
    step_fn = make_step_fn(cset, cfg)

    s = state
    for _ in range(3):
        s = step_fn(s)
    x_jax = np.asarray(s.particles.x)

    x = np.asarray(state.particles.x, np.float64).copy()
    v = np.zeros_like(x)
    inv_mass = np.asarray(state.particles.inv_mass, np.float64)
    idx = np.asarray(cset.distance.idx)
    rest = np.asarray(cset.distance.rest_length, np.float64)
    colors = np.asarray(cset.distance.color)
    for _ in range(3):
        x, v = _numpy_reference_step(x, v, inv_mass, idx, rest, 1e4,
                                     colors, cfg)

    np.testing.assert_allclose(x_jax, x, atol=2e-4)


def test_classic_pbd_cloth_runs():
    state, cset = build_cloth(method=1, stiffness=1.0, bending=False)
    cfg = StepConfig()
    final, _ = jax.jit(lambda s: rollout(s, cset, cfg, 50))(state)
    x = np.asarray(final.particles.x)
    assert np.isfinite(x).all()


def test_reset_restores_initial_state():
    state, cset = build_cloth()
    cfg = StepConfig()
    final, _ = jax.jit(lambda s: rollout(s, cset, cfg, 10))(state)
    restored = final.reset()
    np.testing.assert_allclose(np.asarray(restored.particles.x),
                               np.asarray(state.particles.x))
    np.testing.assert_allclose(np.asarray(restored.particles.v), 0.0)


def test_vmapped_rollout_batch():
    """Rollout vmaps over a leading batch axis (the MPC/rollout harness)."""
    state, cset = build_cloth(n=6)
    cfg = StepConfig()
    batch = jax.tree.map(lambda a: jnp.broadcast_to(a, (4,) + a.shape), state)
    step_b = jax.jit(jax.vmap(lambda s: rollout(s, cset, cfg, 5)[0]))
    out = step_b(batch)
    x = np.asarray(out.particles.x)
    assert x.shape[0] == 4
    assert np.isfinite(x).all()
    # all batch members identical (same initial state)
    np.testing.assert_allclose(x[0], x[1])


def test_cloth_fem_method():
    """Cloth method 2 (FEM triangle) of ``addClothConstraints``
    (SimulationModel.cpp:1144-1156): stable and membrane strain bounded.
    The FEM rest basis is built in-plane, so any cloth orientation works."""
    n = 8
    b = SceneBuilder()
    rot = np.array([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]])
    tm = b.add_regular_triangle_model(n, n, rotation=rot, scale=(1.0, 1.0))
    b.set_mass(tm.offset, 0.0)
    b.set_mass(tm.offset + n - 1, 0.0)
    b.add_cloth_constraints(tm, method=2, xx_stiffness=1.0,
                            yy_stiffness=1.0, xy_stiffness=1.0)
    state, cset = b.build()
    final, _ = jax.jit(lambda s: rollout(s, cset, StepConfig(), 100))(state)
    x = np.asarray(final.particles.x)
    assert np.isfinite(x).all()
    # free region sagged below the pinned edge, bounded membrane strain
    assert x[:, 1].mean() < -0.05
    assert np.abs(x).max() < 5.0


def test_cloth_strain_method():
    """Cloth method 3 (strain triangle, SimulationModel.cpp:1158-1170).
    The reference builds the rest matrix from global x/y components
    (init_StrainTriangleConstraint), so the cloth must lie in the xy
    plane; gravity pulls along −z out of plane and the in-plane membrane
    resists stretching."""
    n = 8
    b = SceneBuilder()
    tm = b.add_regular_triangle_model(n, n, scale=(1.0, 1.0))
    b.set_mass(tm.offset, 0.0)
    b.set_mass(tm.offset + n - 1, 0.0)
    b.add_cloth_constraints(tm, method=3, xx_stiffness=1.0,
                            yy_stiffness=1.0, xy_stiffness=1.0)
    state, cset = b.build()
    # non-singular planar rest matrices: the kernel is actually live
    inv = np.asarray(cset.strain_triangle.inv_rest_mat)
    assert (np.abs(np.linalg.det(inv)) > 1e-6).all()
    cfg = StepConfig(gravity=(0.0, 0.0, -9.81))
    final, _ = jax.jit(lambda s: rollout(s, cset, cfg, 100))(state)
    x = np.asarray(final.particles.x)
    assert np.isfinite(x).all()
    # sagged out of plane but in-plane strain bounded by the constraints
    assert x[:, 2].mean() < -0.05
    e = np.asarray(cset.strain_triangle.idx)
    p = x[e]  # (C, 3, 3)
    d01 = np.linalg.norm(p[:, 1] - p[:, 0], axis=-1)
    x0 = np.asarray(state.particles.x)[e]
    r01 = np.linalg.norm(x0[:, 1] - x0[:, 0], axis=-1)
    assert np.abs(d01 / r01 - 1.0).max() < 0.25
    assert np.abs(x).max() < 5.0


def test_shape_matching_translation_invariant():
    """A rigidly-translated cluster is already matched: zero correction
    (PositionBasedDynamics.cpp:501-558 — goal equals current positions)."""
    from positionbaseddynamics_tpu.ops.pbd import solve_shape_matching_cluster
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(6, 3)).astype(np.float32)
    w = np.ones(6, np.float32)
    from positionbaseddynamics_tpu.ops.mathutils import EPS
    m = 1.0 / (w + EPS)
    cm0 = (m[:, None] * x0).sum(0) / m.sum()
    x = x0 + np.float32([1.5, -0.3, 2.0])
    corr = np.asarray(solve_shape_matching_cluster(
        jnp.asarray(x), jnp.asarray(x0), jnp.asarray(w),
        jnp.asarray(cm0), jnp.float32(1.0), jnp.ones(6)))
    np.testing.assert_allclose(corr, 0.0, atol=1e-5)


def test_mixed_xpbd_and_classic_families_in_one_scene():
    """The reference freely mixes constraint methods per model
    (SimulationModel::addSolidConstraints); mixed classic/XPBD families
    partition into separate batches instead of being rejected."""
    b = SceneBuilder(use_structured_grid=False)
    t1 = b.add_regular_triangle_model(6, 6)
    t2 = b.add_regular_triangle_model(6, 6, translation=(2.0, 0, 0))
    b.set_mass(t1.offset, 0.0)
    b.set_mass(t2.offset, 0.0)
    b.add_cloth_constraints(t1, method=1, distance_stiffness=1.0)   # classic
    b.add_cloth_constraints(t2, method=4, distance_stiffness=1e5)   # XPBD
    b.add_bending_constraints(t1, method=2, stiffness=0.05)         # classic
    b.add_bending_constraints(t2, method=3, stiffness=0.05)         # XPBD
    state, cset = b.build()
    assert len(cset.extra_batches) == 2
    final, _ = jax.jit(lambda s: rollout(s, cset, StepConfig(), 40))(state)
    x = np.asarray(final.particles.x)
    assert np.isfinite(x).all()
    # both cloths hang from their pins and stay coherent
    assert x[:, 1].min() > -2.0

"""Golden-value unit tests for the XPBD constraint kernels (ops/xpbd.py)
against independently derived closed-form updates."""
import numpy as np
import jax.numpy as jnp

from positionbaseddynamics_tpu.ops import xpbd


def test_distance_constraint_hand_computed():
    # Two unit-mass particles 2 apart, rest length 1, infinitely stiff
    # (k=0 → α=0): Δλ = −C/(w0+w1) = −0.5; each moves 0.5 toward the other.
    p0 = jnp.array([0.0, 0.0, 0.0])
    p1 = jnp.array([2.0, 0.0, 0.0])
    # Δλ = −C/(w0+w1) = −0.5; corr0 = Δλ·w0·n with n = (p0−p1)/d = (−1,0,0),
    # so p0 moves +x (toward p1) by 0.5.
    corr, lam = xpbd.solve_distance(p0, 1.0, p1, 1.0, 1.0, 0.0, 0.1, 0.0)
    np.testing.assert_allclose(np.asarray(corr[0]), [0.5, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(corr[1]), [-0.5, 0, 0], atol=1e-6)
    np.testing.assert_allclose(float(lam), -0.5, atol=1e-6)


def test_distance_constraint_compliance():
    # Finite stiffness k: α = 1/(k dt²); Δλ = −C/(w0+w1+α).
    k, dt = 100.0, 0.1
    alpha = 1.0 / (k * dt * dt)
    p0 = jnp.array([0.0, 0.0, 0.0])
    p1 = jnp.array([2.0, 0.0, 0.0])
    corr, lam = xpbd.solve_distance(p0, 1.0, p1, 1.0, 1.0, k, dt, 0.0)
    expected_dlam = -1.0 / (2.0 + alpha)
    np.testing.assert_allclose(float(lam), expected_dlam, rtol=1e-5)
    # corr0_x = Δλ·w0·n_x with n_x = −1
    np.testing.assert_allclose(np.asarray(corr[0, 0]), -expected_dlam, rtol=1e-5)


def test_distance_constraint_lambda_accumulates():
    # Second iteration with carried λ must use C + αλ.
    k, dt = 100.0, 0.1
    alpha = 1.0 / (k * dt * dt)
    p0 = jnp.array([0.0, 0.0, 0.0])
    p1 = jnp.array([2.0, 0.0, 0.0])
    lam0 = -0.3
    corr, lam = xpbd.solve_distance(p0, 1.0, p1, 1.0, 1.0, k, dt, lam0)
    expected_dlam = -(1.0 + alpha * lam0) / (2.0 + alpha)
    np.testing.assert_allclose(float(lam) - lam0, expected_dlam, rtol=1e-5)


def test_distance_static_particle():
    # w0=0: only p1 moves, by the full correction.
    p0 = jnp.array([0.0, 0.0, 0.0])
    p1 = jnp.array([2.0, 0.0, 0.0])
    corr, _ = xpbd.solve_distance(p0, 0.0, p1, 1.0, 1.0, 0.0, 0.1, 0.0)
    np.testing.assert_allclose(np.asarray(corr[0]), 0.0)
    np.testing.assert_allclose(np.asarray(corr[1]), [-1.0, 0, 0], atol=1e-6)


def test_volume_constraint_restores_volume():
    # Unit tet compressed along z; infinitely stiff volume constraint must
    # push back toward rest volume (positive z correction on apex).
    p0 = jnp.array([0.0, 0.0, 0.0])
    p1 = jnp.array([1.0, 0.0, 0.0])
    p2 = jnp.array([0.0, 1.0, 0.0])
    p3 = jnp.array([0.0, 0.0, 0.5])  # rest was z=1
    rest_v = 1.0 / 6.0
    corr, lam = xpbd.solve_volume(p0, 1.0, p1, 1.0, p2, 1.0, p3, 1.0,
                                  rest_v, 0.0, 0.01, 0.0)
    assert float(corr[3, 2]) > 0.0
    # gradient of V wrt p3 is (p1−p0)×(p2−p0)/6 — direction +z
    assert float(lam) > 0.0


def test_isometric_bending_flat_is_zero():
    # Flat stencil: bending energy 0 → zero correction.
    p2 = jnp.array([0.0, 0.0, 0.0])
    p3 = jnp.array([1.0, 0.0, 0.0])
    p0 = jnp.array([0.5, 1.0, 0.0])
    p1 = jnp.array([0.5, -1.0, 0.0])
    q = xpbd.init_isometric_bending(p0, p1, p2, p3)
    corr, lam = xpbd.solve_isometric_bending(
        p0, 1.0, p1, 1.0, p2, 1.0, p3, 1.0, q, 1.0, 0.01, 0.0)
    np.testing.assert_allclose(np.asarray(corr), 0.0, atol=1e-6)


def test_isometric_bending_bent_corrects():
    p2 = jnp.array([0.0, 0.0, 0.0])
    p3 = jnp.array([1.0, 0.0, 0.0])
    p0 = jnp.array([0.5, 1.0, 0.0])
    p1 = jnp.array([0.5, -1.0, 0.0])
    q = xpbd.init_isometric_bending(p0, p1, p2, p3)
    # lift flap p0 out of plane
    p0b = jnp.array([0.5, 0.8, 0.6])
    corr, lam = xpbd.solve_isometric_bending(
        p0b, 1.0, p1, 1.0, p2, 1.0, p3, 1.0, q, 0.0, 0.01, 0.0)
    assert float(jnp.abs(corr).max()) > 0.0
    assert not np.isnan(np.asarray(corr)).any()


def test_fem_tetra_rest_is_zero():
    p0 = jnp.array([0.0, 0.0, 0.0])
    p1 = jnp.array([1.0, 0.0, 0.0])
    p2 = jnp.array([0.0, 1.0, 0.0])
    p3 = jnp.array([0.0, 0.0, 1.0])
    dm = jnp.stack([p0 - p3, p1 - p3, p2 - p3], axis=-1)
    inv_rest = jnp.linalg.inv(dm)
    corr, lam = xpbd.solve_fem_tetra(
        p0, 1.0, p1, 1.0, p2, 1.0, p3, 1.0,
        1.0 / 6.0, inv_rest, 1e5, 0.3, 0.01, 0.0)
    np.testing.assert_allclose(np.asarray(corr), 0.0, atol=1e-5)


def test_fem_tetra_stretched_pulls_back():
    p0 = jnp.array([0.0, 0.0, 0.0])
    p1 = jnp.array([1.0, 0.0, 0.0])
    p2 = jnp.array([0.0, 1.0, 0.0])
    p3 = jnp.array([0.0, 0.0, 1.0])
    dm = jnp.stack([p0 - p3, p1 - p3, p2 - p3], axis=-1)
    inv_rest = jnp.linalg.inv(dm)
    p3s = jnp.array([0.0, 0.0, 2.0])  # stretch apex
    corr, lam = xpbd.solve_fem_tetra(
        p0, 1.0, p1, 1.0, p2, 1.0, p3s, 1.0,
        1.0 / 6.0, inv_rest, 1e5, 0.3, 0.01, 0.0)
    assert float(corr[3, 2]) < 0.0  # apex pulled back down
    assert not np.isnan(np.asarray(corr)).any()


def test_fem_tetra_inverted_recovers():
    # Inverted tet (apex pushed through base) must produce finite corrections
    # via the SVD inversion path (XPBD.cpp:217-294).
    p0 = jnp.array([0.0, 0.0, 0.0])
    p1 = jnp.array([1.0, 0.0, 0.0])
    p2 = jnp.array([0.0, 1.0, 0.0])
    p3 = jnp.array([0.0, 0.0, 1.0])
    dm = jnp.stack([p0 - p3, p1 - p3, p2 - p3], axis=-1)
    inv_rest = jnp.linalg.inv(dm)
    p3i = jnp.array([0.1, 0.1, -0.5])
    corr, lam = xpbd.solve_fem_tetra(
        p0, 1.0, p1, 1.0, p2, 1.0, p3i, 1.0,
        1.0 / 6.0, inv_rest, 1e5, 0.3, 0.01, 0.0)
    a = np.asarray(corr)
    assert np.isfinite(a).all()
    assert np.abs(a).max() > 0.0


def test_compliance_zero_stiffness_is_rigid():
    np.testing.assert_allclose(float(xpbd.compliance(0.0, 0.01)), 0.0)
    np.testing.assert_allclose(float(xpbd.compliance(100.0, 0.1)), 1.0,
                               rtol=1e-6)

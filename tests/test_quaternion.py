"""Unit tests for quaternion algebra (ops/quaternion.py)."""
import numpy as np
import jax.numpy as jnp

from positionbaseddynamics_tpu.ops import quaternion as quat


def _rand_q(rng, n=16):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_multiply_matches_matrix_composition():
    rng = np.random.default_rng(0)
    a, b = _rand_q(rng), _rand_q(rng)
    r_ab = quat.to_matrix(quat.multiply(jnp.asarray(a), jnp.asarray(b)))
    r_a = quat.to_matrix(jnp.asarray(a))
    r_b = quat.to_matrix(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(r_ab), np.asarray(r_a @ r_b),
                               atol=1e-5)


def test_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    q = _rand_q(rng)
    v = rng.normal(size=(16, 3)).astype(np.float32)
    rv = quat.rotate(jnp.asarray(q), jnp.asarray(v))
    rm = np.einsum("nij,nj->ni", np.asarray(quat.to_matrix(jnp.asarray(q))), v)
    np.testing.assert_allclose(np.asarray(rv), rm, atol=1e-5)


def test_rotate_inv_roundtrip():
    rng = np.random.default_rng(2)
    q = _rand_q(rng)
    v = rng.normal(size=(16, 3)).astype(np.float32)
    back = quat.rotate_inv(jnp.asarray(q), quat.rotate(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(np.asarray(back), v, atol=1e-5)


def test_third_director_is_rotated_e3():
    rng = np.random.default_rng(3)
    q = jnp.asarray(_rand_q(rng))
    e3 = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (16, 3))
    np.testing.assert_allclose(
        np.asarray(quat.third_director(q)), np.asarray(quat.rotate(q, e3)),
        atol=1e-5)


def test_integrate_angular_small_step():
    # dq/dt = 1/2 (0, ω) ⊗ q — for small h the result matches axis-angle.
    q = quat.identity((1,))
    omega = jnp.array([[0.0, 0.0, 2.0]])
    h = 1e-3
    qn = quat.integrate_angular(q, omega, h)
    expected = quat.from_axis_angle(jnp.array([[0.0, 0.0, 1.0]]),
                                    jnp.array([2.0 * h]))
    np.testing.assert_allclose(np.asarray(qn), np.asarray(expected), atol=1e-6)


def test_normalize():
    q = jnp.array([[2.0, 0.0, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(quat.normalize(q)),
                               [[1.0, 0.0, 0.0, 0.0]], atol=1e-6)

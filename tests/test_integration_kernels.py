"""Unit tests for time-integration kernels (ops/integration.py) against
closed-form symplectic-Euler behavior (TimeIntegration.cpp semantics)."""
import numpy as np
import jax.numpy as jnp

from positionbaseddynamics_tpu.ops import integration


def test_semi_implicit_euler_free_fall():
    h = 0.01
    x = jnp.zeros((4, 3))
    v = jnp.zeros((4, 3))
    a = jnp.broadcast_to(jnp.array([0.0, -9.81, 0.0]), (4, 3))
    w = jnp.array([1.0, 1.0, 0.0, 2.0])  # third particle static
    xn, vn = integration.semi_implicit_euler(h, w, x, v, a)
    # v' = a h ; x' = v' h (symplectic: position uses updated velocity)
    np.testing.assert_allclose(np.asarray(vn[0]), [0, -9.81 * h, 0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(xn[0]), [0, -9.81 * h * h, 0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(xn[2]), 0.0)  # static untouched
    np.testing.assert_allclose(np.asarray(vn[2]), 0.0)


def test_velocity_update_first_order():
    h = 0.1
    old_x = jnp.zeros((2, 3))
    x = jnp.ones((2, 3))
    v = jnp.full((2, 3), 5.0)
    w = jnp.array([1.0, 0.0])
    vn = integration.velocity_update_first_order(h, w, x, old_x, v)
    np.testing.assert_allclose(np.asarray(vn[0]), 10.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vn[1]), 5.0)  # static keeps v


def test_velocity_update_second_order():
    h = 0.1
    last_x = jnp.zeros((1, 3))
    old_x = jnp.ones((1, 3))
    x = jnp.full((1, 3), 2.0)
    v = jnp.zeros((1, 3))
    w = jnp.ones((1,))
    vn = integration.velocity_update_second_order(h, w, x, old_x, last_x, v)
    np.testing.assert_allclose(np.asarray(vn[0]),
                               (1.5 * 2.0 - 2.0 * 1.0 + 0.5 * 0.0) / h,
                               atol=1e-5)


def test_angular_velocity_update_first_order():
    from positionbaseddynamics_tpu.ops import quaternion as quat
    h = 0.01
    omega_true = jnp.array([[0.3, -0.2, 0.5]])
    old_q = quat.identity((1,))
    q = quat.integrate_angular(old_q, omega_true, h)
    w = jnp.ones((1,))
    omega = integration.angular_velocity_update_first_order(
        h, w, q, old_q, jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(omega), np.asarray(omega_true),
                               rtol=1e-3, atol=1e-4)


def test_angular_velocity_update_second_order_matches_reference():
    """The reference's angularVelocityUpdateSecondOrder is knowingly
    still first order (TimeIntegration.cpp:82-96, its own ToDo comment);
    we reproduce that faithfully, last_q ignored."""
    from positionbaseddynamics_tpu.ops import quaternion as quat
    h = 0.01
    omega_true = jnp.array([[0.3, -0.2, 0.5]])
    old_q = quat.identity((1,))
    last_q = quat.integrate_angular(old_q, -omega_true, h)  # arbitrary
    q = quat.integrate_angular(old_q, omega_true, h)
    w = jnp.ones((1,))
    om2 = integration.angular_velocity_update_second_order(
        h, w, q, old_q, last_q, jnp.zeros((1, 3)))
    om1 = integration.angular_velocity_update_first_order(
        h, w, q, old_q, jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(om2), np.asarray(om1))


def test_second_order_velocity_method_wired_through_step():
    """velocity_update_method=1 must change the rollout (it uses the
    2nd-order linear reconstruction, TimeStepController.cpp:136-173) and
    keep angular reconstruction the reference's first-order-in-disguise."""
    import dataclasses
    import jax
    from positionbaseddynamics_tpu.models import SceneBuilder
    from positionbaseddynamics_tpu.solver import StepConfig, rollout

    b = SceneBuilder()
    tm = b.add_regular_triangle_model(4, 4, scale=(1.0, 1.0))
    b.set_mass(0, 0.0)
    b.add_cloth_constraints(tm, method=4)
    state, cset = b.build()

    cfg1 = StepConfig(dt=0.005, substeps=2, max_iterations=1)
    cfg2 = dataclasses.replace(cfg1, velocity_update_method=1)
    f1, _ = jax.jit(lambda s: rollout(s, cset, cfg1, 10))(state)
    f2, _ = jax.jit(lambda s: rollout(s, cset, cfg2, 10))(state)
    d = np.abs(np.asarray(f1.particles.x) - np.asarray(f2.particles.x)).max()
    assert np.isfinite(np.asarray(f2.particles.x)).all()
    assert d > 1e-6, "2nd-order velocity update had no effect"

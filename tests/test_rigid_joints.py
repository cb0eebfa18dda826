"""Rigid-body joint tests: physics invariants for the whole joint zoo
(ball, ball-on-line, hinge, universal, slider, motors, distance/spring,
damper, rigid-body–particle coupling) — the test layer the reference lacks
(SURVEY §4); scenarios mirror ``Demos/RigidBodyDemos/{ChainDemo,JointDemo}``.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.ops import quaternion as quat
from positionbaseddynamics_tpu.solver import StepConfig, make_step_fn, rollout


CFG = StepConfig()


def run(state, cset, cfg, steps):
    final, _ = jax.jit(lambda s: rollout(s, cset, cfg, steps))(state)
    return final


def world_connector(final, body, local):
    x = np.asarray(final.rigid.x)[body]
    q = np.asarray(final.rigid.q)[body]
    return np.asarray(quat.rotate(jnp.asarray(q), jnp.asarray(local))) + x


def test_ball_joint_pendulum_keeps_anchor():
    """A dynamic bar ball-jointed to a static anchor: the joint point must
    stay at the anchor while the bar swings."""
    b = SceneBuilder()
    s = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    d = b.add_rigid_body((1.0, 0.0, 0.0), mass=1.0, inertia=(0.1, 0.1, 0.1))
    b.add_ball_joint(s, d, (0.0, 0.0, 0.0))
    state, cset = b.build()
    final = run(state, cset, CFG, 100)
    rx = np.asarray(final.rigid.x)
    # body swung (moved) but its connector stayed near the origin
    assert not np.allclose(rx[1], [1.0, 0.0, 0.0], atol=1e-3)
    local = np.array([-1.0, 0.0, 0.0])  # connector in body frame
    c = world_connector(final, 1, local)
    assert np.linalg.norm(c) < 5e-3
    assert np.isfinite(rx).all()


def test_ball_joint_energy_sane():
    """Pendulum should not gain energy: |x| stays ≈ 1 from the pivot and
    height never exceeds the release height."""
    b = SceneBuilder()
    s = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    d = b.add_rigid_body((1.0, 0.0, 0.0), mass=1.0, inertia=(0.1, 0.1, 0.1))
    b.add_ball_joint(s, d, (0.0, 0.0, 0.0))
    state, cset = b.build()
    st = state
    fn = make_step_fn(cset, CFG)
    ys = []
    for _ in range(300):
        st = fn(st)
        ys.append(float(st.rigid.x[1, 1]))
    assert max(ys) < 0.05  # released horizontally at y=0


def test_hinge_joint_stays_in_plane():
    """Hinge with axis z at the origin: the pendulum body must stay in the
    z=0 plane and the hinge axis must remain z in world space."""
    b = SceneBuilder()
    s = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    d = b.add_rigid_body((1.0, 0.0, 0.0), mass=1.0, inertia=(0.1, 0.1, 0.1))
    b.add_hinge_joint(s, d, (0.0, 0.0, 0.0), (0.0, 0.0, 1.0))
    state, cset = b.build()
    final = run(state, cset, CFG, 150)
    rx = np.asarray(final.rigid.x)
    rq = np.asarray(final.rigid.q)
    assert abs(rx[1, 2]) < 1e-3          # no out-of-plane drift
    assert not np.allclose(rx[1, :2], [1.0, 0.0], atol=1e-3)  # it swung
    axis_w = np.asarray(quat.rotate(jnp.asarray(rq[1]),
                                    jnp.asarray([0.0, 0.0, 1.0])))
    assert np.allclose(axis_w, [0.0, 0.0, 1.0], atol=5e-3)


def test_universal_joint_runs_stably():
    b = SceneBuilder()
    s = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    d = b.add_rigid_body((1.0, 0.0, 0.0), mass=1.0, inertia=(0.1, 0.1, 0.1))
    b.add_universal_joint(s, d, (0.0, 0.0, 0.0), (0.0, 0.0, 1.0),
                          (0.0, 1.0, 0.0))
    state, cset = b.build()
    final = run(state, cset, CFG, 100)
    rx = np.asarray(final.rigid.x)
    assert np.isfinite(rx).all()
    c = world_connector(final, 1, np.array([-1.0, 0.0, 0.0]))
    assert np.linalg.norm(c) < 5e-3


def test_slider_joint_constrains_to_axis():
    """Slider along x between a static frame and a falling body: all motion
    perpendicular to x is blocked, rotation stays identity."""
    b = SceneBuilder()
    s = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    d = b.add_rigid_body((1.0, 0.0, 0.0), mass=1.0, inertia=(0.1, 0.1, 0.1))
    b.add_slider_joint(s, d, (1.0, 0.0, 0.0))
    state, cset = b.build()
    final = run(state, cset, CFG, 100)
    rx = np.asarray(final.rigid.x)
    rq = np.asarray(final.rigid.q)
    assert abs(rx[1, 1]) < 1e-3 and abs(rx[1, 2]) < 1e-3  # gravity blocked
    assert np.allclose(np.abs(rq[1, 0]), 1.0, atol=1e-3)  # no rotation


def test_slider_joint_free_along_axis():
    """Slider along gravity: the body must fall freely along the axis."""
    b = SceneBuilder()
    s = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    d = b.add_rigid_body((0.0, -0.5, 0.0), mass=1.0, inertia=(0.1, 0.1, 0.1))
    b.add_slider_joint(s, d, (0.0, 1.0, 0.0))
    state, cset = b.build()
    n_steps = 100
    final = run(state, cset, CFG, n_steps)
    t = n_steps * CFG.dt
    expect = -0.5 - 0.5 * 9.81 * t * t
    assert abs(float(final.rigid.x[1, 1]) - expect) < 0.05


def test_ball_on_line_joint():
    """Ball-on-line along y: connector may slide along the line but not
    leave it."""
    b = SceneBuilder()
    s = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    d = b.add_rigid_body((0.0, -1.0, 0.0), mass=1.0, inertia=(0.1, 0.1, 0.1))
    b.add_ball_on_line_joint(s, d, (0.0, -1.0, 0.0), (0.0, 1.0, 0.0))
    state, cset = b.build()
    final = run(state, cset, CFG, 100)
    rx = np.asarray(final.rigid.x)
    c = world_connector(final, 1, np.array([0.0, 0.0, 0.0]))
    assert abs(c[0]) < 1e-3 and abs(c[2]) < 1e-3   # stays on the y-line
    assert rx[1, 1] < -1.2                          # slid down along it


def test_distance_joint_keeps_length():
    b = SceneBuilder()
    s = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    d = b.add_rigid_body((0.0, -1.0, 0.0), mass=1.0, inertia=(0.1, 0.1, 0.1))
    b.add_rigid_distance_joint(s, d, (0.0, 0.0, 0.0), (0.0, -1.0, 0.0))
    state, cset = b.build()
    final = run(state, cset, CFG, 200)
    c = world_connector(final, 1, np.array([0.0, 0.0, 0.0]))
    assert abs(np.linalg.norm(c) - 1.0) < 5e-3


def test_rigid_body_spring_oscillates():
    """Soft spring stretches beyond rest length under gravity, then pulls
    back — rest length is violated (unlike the rigid distance joint)."""
    b = SceneBuilder()
    s = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    d = b.add_rigid_body((0.0, -1.0, 0.0), mass=1.0, inertia=(0.1, 0.1, 0.1))
    b.add_rigid_body_spring(s, d, (0.0, 0.0, 0.0), (0.0, -1.0, 0.0),
                            stiffness=50.0)
    state, cset = b.build()
    st = state
    fn = make_step_fn(cset, CFG)
    lens = []
    for _ in range(400):
        st = fn(st)
        lens.append(float(-st.rigid.x[1, 1]))
    assert max(lens) > 1.05          # stretched
    assert max(lens) < 2.0           # bounded
    assert min(lens[len(lens) // 2:]) < max(lens) - 1e-3  # oscillating back


def test_target_angle_motor_hinge_reaches_angle():
    """Motor drives the relative hinge angle to the target."""
    target = 0.6
    b = SceneBuilder()
    s = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    d = b.add_rigid_body((1.0, 0.0, 0.0), mass=1.0, inertia=(0.1, 0.1, 0.1))
    b.add_target_angle_motor_hinge_joint(
        s, d, (0.0, 0.0, 0.0), (0.0, 0.0, 1.0), target=target)
    state, cset = b.build()
    cfg = StepConfig(max_iterations=5, gravity=(0.0, 0.0, 0.0))
    final = run(state, cset, cfg, 200)
    rq = np.asarray(final.rigid.q)[1]
    # rotation of body about z by `target` (body 0 static, identity)
    angle = 2.0 * np.arctan2(rq[3], rq[0])
    assert abs(abs(angle) - target) < 0.05


def test_target_velocity_motor_hinge_spins():
    """Velocity motor drives relative angular velocity about the hinge
    axis to the target rate."""
    b = SceneBuilder()
    s = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    d = b.add_rigid_body((1.0, 0.0, 0.0), mass=1.0, inertia=(0.1, 0.1, 0.1))
    b.add_target_velocity_motor_hinge_joint(
        s, d, (0.0, 0.0, 0.0), (0.0, 0.0, 1.0), target=2.0)
    state, cset = b.build()
    cfg = StepConfig(gravity=(0.0, 0.0, 0.0))
    final = run(state, cset, cfg, 100)
    om = np.asarray(final.rigid.omega)[1]
    assert abs(abs(om[2]) - 2.0) < 0.1
    assert abs(om[0]) < 1e-2 and abs(om[1]) < 1e-2


def test_target_position_motor_slider():
    """Position motor drives the relative offset along the slider axis."""
    b = SceneBuilder()
    s = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    d = b.add_rigid_body((1.0, 0.0, 0.0), mass=1.0, inertia=(0.1, 0.1, 0.1))
    b.add_target_position_motor_slider_joint(
        s, d, (1.0, 0.0, 0.0), target=0.5)
    state, cset = b.build()
    cfg = StepConfig(max_iterations=5, gravity=(0.0, 0.0, 0.0))
    final = run(state, cset, cfg, 200)
    # C = (x0-x1) - d + target*axis -> x1 = x0 - d + t*a = (1,0,0)+0.5x
    assert abs(float(final.rigid.x[1, 0]) - 1.5) < 0.02


def test_target_velocity_motor_slider():
    b = SceneBuilder()
    s = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    d = b.add_rigid_body((1.0, 0.0, 0.0), mass=1.0, inertia=(0.1, 0.1, 0.1))
    b.add_target_velocity_motor_slider_joint(
        s, d, (1.0, 0.0, 0.0), target=1.0)
    state, cset = b.build()
    cfg = StepConfig(gravity=(0.0, 0.0, 0.0))
    final = run(state, cset, cfg, 100)
    v = np.asarray(final.rigid.v)[1]
    assert abs(abs(v[0]) - 1.0) < 0.05
    assert np.isfinite(np.asarray(final.rigid.x)).all()


def test_motor_target_sequence_interpolates():
    """Target sequence [t0,v0,t1,v1,...] is linearly interpolated over sim
    time (``TimeStepController.cpp:200-236``)."""
    b = SceneBuilder()
    s = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    d = b.add_rigid_body((1.0, 0.0, 0.0), mass=1.0, inertia=(0.1, 0.1, 0.1))
    b.add_target_angle_motor_hinge_joint(
        s, d, (0.0, 0.0, 0.0), (0.0, 0.0, 1.0),
        sequence=[0.0, 0.0, 2.0, 0.8])
    state, cset = b.build()
    jb = cset.joints[0]
    t_half = jnp.asarray(1.0, jnp.float32)
    tgt = np.asarray(jb.current_target(t_half))
    assert abs(tgt[0] - 0.4) < 1e-5


def test_damper_joint_damps_relative_motion():
    """Damper: slider-frame XPBD row resists axial separation; the sprung
    mass settles without exploding."""
    b = SceneBuilder()
    s = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    d = b.add_rigid_body((0.0, -1.0, 0.0), mass=1.0, inertia=(0.1, 0.1, 0.1))
    b.add_damper_joint(s, d, (0.0, 1.0, 0.0), stiffness=100.0)
    state, cset = b.build()
    final = run(state, cset, CFG, 300)
    rx = np.asarray(final.rigid.x)
    assert np.isfinite(rx).all()
    assert -1.5 < rx[1, 1] < -0.9   # sags a bit, held by the damper row


def test_rigid_body_particle_ball_joint():
    """A particle pinned to a swinging rigid bar follows the bar's tip
    (``RigidBodyParticleBallJoint``, the cloth–rigid coupling primitive)."""
    b = SceneBuilder()
    s = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    d = b.add_rigid_body((1.0, 0.0, 0.0), mass=1.0, inertia=(0.1, 0.1, 0.1))
    b.add_ball_joint(s, d, (0.0, 0.0, 0.0))
    p = b.add_particles(np.array([[2.0, 0.0, 0.0]]), mass=0.1)
    b.add_rigid_body_particle_ball_joint(d, p)
    state, cset = b.build()
    final = run(state, cset, StepConfig(max_iterations=5), 100)
    px = np.asarray(final.particles.x)[0]
    tip = world_connector(final, 1, np.array([1.0, 0.0, 0.0]))
    assert np.isfinite(px).all()
    assert np.linalg.norm(px - tip) < 2e-2


def test_chain_demo_jacobi_and_gs():
    """A 5-link ball-joint chain (ChainDemo analogue) stays connected in
    both solver modes."""
    for mode in ("gauss_seidel", "jacobi"):
        b = SceneBuilder()
        prev = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
        for i in range(1, 6):
            cur = b.add_rigid_body((float(i), 0.0, 0.0), mass=1.0,
                                   inertia=(0.1, 0.1, 0.1))
            b.add_ball_joint(prev, cur, (i - 0.5, 0.0, 0.0))
            prev = cur
        state, cset = b.build()
        cfg = StepConfig(max_iterations=10, joint_solver_mode=mode)
        final = run(state, cset, cfg, 100)
        rx = np.asarray(final.rigid.x)
        assert np.isfinite(rx).all()
        # neighbouring links stay ~1 apart (joint at midpoints)
        gaps = np.linalg.norm(np.diff(rx, axis=0), axis=-1)
        assert np.all(gaps < 1.3) and np.all(gaps > 0.7)


def test_rigid_free_fall_and_spin():
    """No joints: COM follows ballistic motion; a torque-free spin about a
    principal axis keeps |ω| constant (gyroscopic integration sanity)."""
    b = SceneBuilder()
    d = b.add_rigid_body((0.0, 0.0, 0.0), mass=2.0, inertia=(0.2, 0.3, 0.4),
                         omega=(0.0, 0.0, 3.0))
    state, cset = b.build()
    n_steps = 50
    final = run(state, cset, CFG, n_steps)
    t = n_steps * CFG.dt
    assert abs(float(final.rigid.x[0, 1]) + 0.5 * 9.81 * t * t) < 1e-2
    om = np.asarray(final.rigid.omega)[0]
    assert abs(np.linalg.norm(om) - 3.0) < 1e-3

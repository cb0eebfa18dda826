"""Sampling-MPC layer tests (mpc/): MPPI and CEM steer actuated scenes to
targets through SDF obstacle fields. The reference has no control layer —
these validate the project's north-star subsystem (BASELINE.json)."""
import jax
import jax.numpy as jnp
import numpy as np

from positionbaseddynamics_tpu import mpc
from positionbaseddynamics_tpu.collision.sdf import SDFShape
from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig
from positionbaseddynamics_tpu.solver.state import (ParticleState, RigidState,
                                                    SimState)
from positionbaseddynamics_tpu.solver.constraints import ConstraintSet


def _free_rigid_scene():
    """One dynamic rigid body at the origin, no constraints."""
    r = RigidState.create(
        x=np.zeros((1, 3)), q=np.array([[1.0, 0, 0, 0]]),
        masses=np.ones((1,)), inertia_diag=np.ones((1, 3)))
    p = ParticleState.create(np.zeros((1, 3)), np.zeros((1,)))  # inert pin
    return SimState.create(p, rigid=r), ConstraintSet()


def test_mppi_rigid_reaches_target():
    """MPPI with wrench control drives a free rigid body to a target,
    beating the uncontrolled (gravity-only) baseline by a wide margin."""
    state, cset = _free_rigid_scene()
    cfg = StepConfig(substeps=2)
    target = np.array([1.0, 0.5, 0.0], np.float32)

    control = mpc.RigidWrenchControl(body_indices=(0,), max_force=120.0)
    run = mpc.make_mpc_controller(
        cset, cfg, control,
        running_cost=mpc.combine(
            mpc.as_running(mpc.rigid_target(0, target, weight=1.0)),
            mpc.control_effort(1e-6)),
        terminal_cost=mpc.rigid_target(0, target, weight=10.0),
        planner="mppi",
        planner_cfg=mpc.MPPIConfig(horizon=8, num_samples=64, sigma=20.0,
                                   temperature=0.05, plan_iters=2))
    final, info = jax.jit(lambda k, s: run(k, s, 60))(
        jax.random.PRNGKey(0), state)
    err = float(np.linalg.norm(np.asarray(final.rigid.x[0]) - target))
    # uncontrolled body free-falls away from the target
    assert np.isfinite(np.asarray(info["cost"])).all()
    assert err < 0.3, f"MPPI failed to steer body near target (err={err})"


def test_mppi_avoids_sdf_obstacle():
    """A sphere obstacle sits between start and target; the MPPI penalty
    keeps the planned trajectory out of the obstacle while still
    approaching the target."""
    state, cset = _free_rigid_scene()
    cfg = StepConfig(substeps=2, gravity=(0.0, 0.0, 0.0))
    target = np.array([1.2, 0.0, 0.0], np.float32)
    obstacle = SDFShape.sphere(0.25)
    obstacle_pos = np.array([0.6, 0.0, 0.0], np.float32)

    control = mpc.RigidWrenchControl(body_indices=(0,), max_force=120.0)
    run = mpc.make_mpc_controller(
        cset, cfg, control,
        running_cost=mpc.combine(
            mpc.as_running(mpc.rigid_target(0, target, weight=1.0)),
            mpc.rigid_sdf_obstacle([obstacle], 0, radius=0.1, weight=500.0,
                                   translations=[obstacle_pos]),
            mpc.control_effort(1e-6)),
        terminal_cost=mpc.rigid_target(0, target, weight=10.0),
        planner="mppi",
        planner_cfg=mpc.MPPIConfig(horizon=10, num_samples=96, sigma=20.0,
                                   temperature=0.05, plan_iters=2))

    # track positions by stepping the controller in chunks
    key = jax.random.PRNGKey(1)
    runj = jax.jit(lambda k, s: run(k, s, 10))
    xs = []
    s = state
    for i in range(10):
        key, k = jax.random.split(key)
        s, _ = runj(k, s)
        xs.append(np.asarray(s.rigid.x[0]))
    xs = np.stack(xs)
    dists = np.linalg.norm(xs - obstacle_pos, axis=-1)
    assert (dists > 0.25).all(), f"entered obstacle: min dist {dists.min()}"
    err = np.linalg.norm(xs[-1] - target)
    assert err < 0.4, f"did not approach target (err={err})"


def test_cem_matches_mppi_on_reach_task():
    """CEM planner also solves the reach task (shared seq-cost machinery)."""
    state, cset = _free_rigid_scene()
    cfg = StepConfig(substeps=2, gravity=(0.0, 0.0, 0.0))
    target = np.array([0.5, 0.0, 0.5], np.float32)
    control = mpc.RigidWrenchControl(body_indices=(0,), max_force=50.0)
    run = mpc.make_mpc_controller(
        cset, cfg, control,
        running_cost=mpc.as_running(mpc.rigid_target(0, target)),
        terminal_cost=mpc.rigid_target(0, target, weight=10.0),
        planner="cem",
        planner_cfg=mpc.CEMConfig(horizon=8, num_samples=64, elite_frac=0.15,
                                  init_sigma=8.0, plan_iters=3))
    final, _ = jax.jit(lambda k, s: run(k, s, 30))(
        jax.random.PRNGKey(2), state)
    err = float(np.linalg.norm(np.asarray(final.rigid.x[0]) - target))
    assert err < 0.35, f"CEM failed (err={err})"


def test_mppi_cloth_pin_steering():
    """MPPI drags a pinned cloth corner so the OPPOSITE (free) corner ends
    near a target — control acts only through the XPBD constraint fabric,
    so this exercises the full rollout stack inside the planner."""
    n = 6
    b = SceneBuilder(use_structured_grid=False)
    tm = b.add_regular_triangle_model(n, n, scale=(1.0, 1.0))
    pin = tm.offset
    b.set_mass(pin, 0.0)
    b.add_cloth_constraints(tm, method=4, distance_stiffness=1e5)
    state, cset = b.build()
    # damped fabric (PositionBasedElasticRodsTSC.cpp:63 semantics) so the
    # hang settles and the steering signal dominates pendulum swing
    cfg = StepConfig(substeps=2, gravity=(0.0, -9.81, 0.0), damping=0.05)
    free_corner = tm.offset + n * n - 1

    # settle the hang first, then ask the planner to translate the hanging
    # cloth by delta — feasible exactly by translating the pin.
    from positionbaseddynamics_tpu.solver import rollout
    state, _ = jax.jit(lambda s: rollout(s, cset, cfg, 150))(state)
    delta = np.array([0.4, 0.3, 0.0], np.float32)
    target = np.asarray(state.particles.x[free_corner]) + delta

    control = mpc.PinVelocityControl(indices=(pin,), max_speed=4.0)
    run = mpc.make_mpc_controller(
        cset, cfg, control,
        running_cost=mpc.combine(
            mpc.as_running(mpc.particle_target([free_corner], target)),
            mpc.control_effort(1e-4)),
        terminal_cost=mpc.particle_target([free_corner], target, weight=5.0),
        planner="mppi",
        planner_cfg=mpc.MPPIConfig(horizon=30, num_samples=48, sigma=2.0,
                                   temperature=0.05, plan_iters=2))
    final, info = jax.jit(lambda k, s: run(k, s, 80))(
        jax.random.PRNGKey(3), state)
    xf = np.asarray(final.particles.x[free_corner])
    err_ctrl = np.linalg.norm(xf - target)

    # uncontrolled baseline: same rollout without moving the pin
    base, _ = jax.jit(lambda s: rollout(s, cset, cfg, 80))(state)
    err_base = np.linalg.norm(
        np.asarray(base.particles.x[free_corner]) - target)
    assert np.isfinite(xf).all()
    assert err_ctrl < 0.6 * err_base, (
        f"controlled {err_ctrl:.3f} vs uncontrolled {err_base:.3f}")


def test_sequence_cost_vmaps_over_samples():
    """seq_cost is vmappable over the sample axis (the planner's K axis =
    the DP shard axis on a mesh)."""
    state, cset = _free_rigid_scene()
    cfg = StepConfig(substeps=1)
    control = mpc.RigidWrenchControl(body_indices=(0,))
    seq_cost = mpc.make_sequence_cost(
        cset, cfg, control,
        terminal_cost=mpc.rigid_target(0, np.zeros(3, np.float32)))
    U = jax.random.normal(jax.random.PRNGKey(0), (16, 5, 6))
    costs = jax.jit(jax.vmap(lambda u: seq_cost(state, u)[0]))(U)
    assert costs.shape == (16,)
    assert np.isfinite(np.asarray(costs)).all()

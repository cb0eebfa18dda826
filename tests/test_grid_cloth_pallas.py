"""Fused Pallas cloth kernel vs the jnp structured-grid path —
trajectories must match (same math, one kernel)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig, rollout


def _build(n=24):
    b = SceneBuilder()
    tm = b.add_regular_triangle_model(n, n, scale=(2.0, 2.0))
    b.set_mass(tm.offset, 0.0)
    b.set_mass(tm.offset + n - 1, 0.0)
    b.add_cloth_constraints(tm, method=4, distance_stiffness=1e5)
    b.add_bending_constraints(tm, method=3, stiffness=0.05)
    return b.build()


def test_pallas_step_matches_jnp_path():
    from positionbaseddynamics_tpu.solver.grid_cloth_pallas import (
        make_pallas_cloth_step)

    state, cset = _build(24)
    cfg = StepConfig(dt=0.005, substeps=5, max_iterations=1)
    gc = cset.grid_cloths[0]
    step = make_pallas_cloth_step(
        gc, state.particles.inv_mass, gc.inv_cnt_dist, gc.inv_cnt_bend,
        dt=cfg.dt, substeps=cfg.substeps,
        max_iterations=cfg.max_iterations)

    # reference trajectory through the generic stepper
    fin, _ = jax.jit(lambda s: rollout(s, cset, cfg, 25))(state)
    x_ref = np.asarray(fin.particles.x)

    x, v = state.particles.x, state.particles.v
    for _ in range(25):
        x, v = step(x, v)
    x_pl = np.asarray(x)
    assert np.isfinite(x_pl).all()
    np.testing.assert_allclose(x_pl, x_ref, atol=2e-5)


def test_pallas_batched_matches_single():
    """n_batch>1 variant (2-D kernel grid): each rollout in the batch
    evolves exactly like the single-rollout kernel."""
    import jax.numpy as jnp
    from positionbaseddynamics_tpu.solver.grid_cloth_pallas import (
        make_pallas_cloth_step)

    state, cset = _build(16)
    cfg = StepConfig(dt=0.005, substeps=3, max_iterations=1)
    gc = cset.grid_cloths[0]
    kw = dict(dt=cfg.dt, substeps=cfg.substeps,
              max_iterations=cfg.max_iterations)
    step1 = make_pallas_cloth_step(
        gc, state.particles.inv_mass, gc.inv_cnt_dist, gc.inv_cnt_bend, **kw)
    stepb = make_pallas_cloth_step(
        gc, state.particles.inv_mass, gc.inv_cnt_dist, gc.inv_cnt_bend,
        n_batch=3, **kw)

    x1, v1 = state.particles.x, state.particles.v
    # perturb rollout 2 so the batch is not trivially uniform
    xs = jnp.stack([x1, x1, x1 + 0.001])
    vs = jnp.stack([v1, v1, v1])
    for _ in range(8):
        x1, v1 = step1(x1, v1)
        xs, vs = stepb(xs, vs)
    x1 = np.asarray(x1)
    xs = np.asarray(xs)
    assert np.isfinite(xs).all()
    np.testing.assert_allclose(xs[0], x1, atol=1e-6)
    np.testing.assert_allclose(xs[1], x1, atol=1e-6)
    assert np.abs(xs[2] - x1).max() > 1e-5   # perturbed rollout diverged


def test_pallas_fused_substeps_matches_unfused():
    """fuse_substeps=True (whole step per kernel pass, halo 3·S·iters)
    must produce the same trajectory as the per-substep kernel."""
    from positionbaseddynamics_tpu.solver.grid_cloth_pallas import (
        make_pallas_cloth_step)

    state, cset = _build(24)
    cfg = StepConfig(dt=0.005, substeps=5, max_iterations=1)
    gc = cset.grid_cloths[0]
    kw = dict(dt=cfg.dt, substeps=cfg.substeps,
              max_iterations=cfg.max_iterations)
    step_u = make_pallas_cloth_step(
        gc, state.particles.inv_mass, gc.inv_cnt_dist, gc.inv_cnt_bend, **kw)
    step_f = make_pallas_cloth_step(
        gc, state.particles.inv_mass, gc.inv_cnt_dist, gc.inv_cnt_bend,
        fuse_substeps=True, **kw)

    xu, vu = state.particles.x, state.particles.v
    xf, vf = state.particles.x, state.particles.v
    for _ in range(10):
        xu, vu = step_u(xu, vu)
        xf, vf = step_f(xf, vf)
    xu, xf = np.asarray(xu), np.asarray(xf)
    assert np.isfinite(xf).all()
    np.testing.assert_allclose(xf, xu, atol=2e-6)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vu), atol=2e-4)

"""Batched broad phase (collision/batched.py) vs the unrolled per-pair
path: same physics, O(#shape-kinds) compile cost, loud capacity overflow.

The reference handles arbitrary body counts through per-pair BVH
traversal (``DistanceFieldCollisionDetection.cpp:26-199``); the batched
path must reproduce the unrolled TPU port's trajectories (Jacobi contact
mode is order-independent up to float add order) while scaling to
100+-body pile scenes the unrolled path cannot compile in reasonable
time.
"""
import dataclasses

import jax
import numpy as np
import pytest

from positionbaseddynamics_tpu.collision import sampling
from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig, make_step_fn


def _mixed_scene(n_spheres=4, n_boxes=3):
    """Floor box + dynamic spheres and boxes (two shape kinds on both
    the point and SDF sides)."""
    b = SceneBuilder()
    floor = b.add_rigid_body((0.0, -0.5, 0.0), mass=0.0)
    b.add_collision_box(floor, (10.0, 1.0, 10.0))
    r = 0.3
    sv = sampling.sample_sphere(r, 32)
    for i in range(n_spheres):
        body = b.add_rigid_body((0.65 * i - 1.0, 1.0 + 0.4 * i, 0.0),
                                mass=1.0, inertia=(0.4 * r * r,) * 3)
        b.add_collision_sphere(body, r, restitution=0.3, friction=0.2,
                               verts=sv)
    he = (0.25, 0.2, 0.3)
    for i in range(n_boxes):
        body = b.add_rigid_body((0.65 * i - 0.7, 1.2 + 0.4 * i, 0.7),
                                mass=1.0, inertia=(0.1, 0.1, 0.1))
        b.add_collision_box(body, he, restitution=0.3, friction=0.2)
    return b


def test_batched_matches_unrolled_trajectory():
    b = _mixed_scene()
    state, cset = b.build()
    pipe_u = b.build_collision_pipeline(tolerance=0.02,
                                        broad_phase="unrolled")
    pipe_b = b.build_collision_pipeline(tolerance=0.02,
                                        broad_phase="batched")
    assert pipe_u.broad_phase == "unrolled"
    assert pipe_b.broad_phase == "batched"
    cfg = StepConfig()
    fn_u = make_step_fn(cset, cfg, pipe_u)
    fn_b = make_step_fn(cset, cfg, pipe_b)
    su, sb = state, state
    for _ in range(60):
        su = fn_u(su)
        sb = fn_b(sb)
    xu = np.asarray(su.rigid.x)
    xb = np.asarray(sb.rigid.x)
    assert np.isfinite(xb).all()
    # Jacobi contact rows are order-independent up to float add order
    np.testing.assert_allclose(xb, xu, atol=2e-4)
    vu = np.asarray(su.rigid.v)
    vb = np.asarray(sb.rigid.v)
    np.testing.assert_allclose(vb, vu, atol=2e-3)
    assert float(sb.overflow) == 0.0


def test_batched_contact_rows_match_unrolled():
    """Active contact rows of both paths agree as sets at a colliding
    configuration."""
    b = _mixed_scene(n_spheres=2, n_boxes=1)
    state, cset = b.build()
    pipe_u = b.build_collision_pipeline(tolerance=0.02,
                                        broad_phase="unrolled")
    pipe_b = b.build_collision_pipeline(tolerance=0.02,
                                        broad_phase="batched")
    # drop everything to rest on the floor first
    fn = make_step_fn(cset, StepConfig(), pipe_u)
    for _ in range(150):
        state = fn(state)
    rc_u = pipe_u.detect_rigid(state.rigid)
    rc_b = pipe_b.detect_rigid(state.rigid)

    def active_rows(rc):
        m = np.asarray(rc.mask) > 0.5
        rows = np.concatenate([
            np.asarray(rc.body0)[m, None], np.asarray(rc.body1)[m, None],
            np.round(np.asarray(rc.cp0)[m], 5),
            np.round(np.asarray(rc.normal)[m], 4),
            np.round(np.asarray(rc.nkn_inv)[m, None], 4),
        ], axis=1)
        return rows[np.lexsort(rows.T[::-1])]

    ru, rb = active_rows(rc_u), active_rows(rc_b)
    assert ru.shape == rb.shape
    np.testing.assert_allclose(rb, ru, atol=1e-3)


def test_particle_group_batched_matches_unrolled():
    """Cloth vs several rigid SDFs: batched particle-group detection
    reproduces the unrolled path's trajectories."""
    b = SceneBuilder()
    n = 12
    tm = b.add_regular_triangle_model(n, n, translation=(-0.5, 0.8, -0.5))
    b.add_cloth_constraints(tm, method=4, distance_stiffness=1e5)
    b.set_particle_collider(tm, restitution=0.1, friction=0.2)
    floor = b.add_rigid_body((0.0, -1.0, 0.0), mass=0.0)
    b.add_collision_box(floor, (5.0, 1.0, 5.0))
    ball = b.add_rigid_body((0.0, 0.3, 0.0), mass=0.0)
    b.add_collision_sphere(ball, 0.25)
    state, cset = b.build()
    pipe_u = b.build_collision_pipeline(broad_phase="unrolled")
    pipe_b = b.build_collision_pipeline(broad_phase="batched")
    cfg = StepConfig()
    fn_u = make_step_fn(cset, cfg, pipe_u)
    fn_b = make_step_fn(cset, cfg, pipe_b)
    su, sb = state, state
    for _ in range(40):
        su = fn_u(su)
        sb = fn_b(sb)
    np.testing.assert_allclose(np.asarray(sb.particles.x),
                               np.asarray(su.particles.x), atol=2e-4)
    assert float(sb.overflow) == 0.0


def test_pile_100_bodies_builds_and_runs():
    """The scalability target (VERDICT r4 #1): a 100+-rigid-body pile
    compiles in seconds on the batched path and steps correctly."""
    import time

    rng = np.random.default_rng(0)
    b = SceneBuilder()
    floor = b.add_rigid_body((0.0, -0.5, 0.0), mass=0.0)
    b.add_collision_box(floor, (6.0, 1.0, 6.0))
    r = 0.25
    sv = sampling.sample_sphere(r, 16)
    n_bodies = 100
    for i in range(n_bodies):
        gx, gz = i % 10, (i // 10) % 10
        body = b.add_rigid_body(
            (0.55 * gx - 2.5 + 0.02 * rng.standard_normal(),
             0.8 + 0.55 * (i // 100),
             0.55 * gz - 2.5 + 0.02 * rng.standard_normal()),
            mass=1.0, inertia=(0.4 * r * r,) * 3)
        b.add_collision_sphere(body, r, restitution=0.1, friction=0.3,
                               verts=sv)
    state, cset = b.build()
    t0 = time.perf_counter()
    pipe = b.build_collision_pipeline(tolerance=0.02,
                                      broad_phase="batched")
    fn = make_step_fn(cset, StepConfig(), pipe)
    state = jax.block_until_ready(fn(state))
    build_s = time.perf_counter() - t0
    assert build_s < 120.0, f"build+compile took {build_s:.1f}s"
    for _ in range(20):
        state = fn(state)
    x = np.asarray(state.rigid.x)
    assert np.isfinite(x).all()
    # bodies settle onto the floor plane, none fall through
    assert (x[1:, 1] > 0.5 + r - 0.15).all()
    assert float(state.overflow) == 0.0

"""Generic (user-defined, autodiff-Jacobian) constraints — the
GenericConstraintsDemos scenarios
(``PositionBasedGenericConstraints.h:31-280``,
``Demos/GenericConstraintsDemos/GenericConstraints.{h,cpp}``)."""
import numpy as np

import jax
import jax.numpy as jnp

from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.ops.generic import (
    solve_generic_particle_constraint, solve_generic_rigid_constraint)
from positionbaseddynamics_tpu.solver import StepConfig, rollout


def test_generic_matches_closed_form_distance():
    """A generic distance constraint reproduces the closed-form PBD
    distance projection exactly."""
    rest = 0.7

    def cfun(pts):
        return jnp.array([jnp.linalg.norm(pts[1] - pts[0]) - rest])

    pts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.4, -0.2]], jnp.float32)
    w = jnp.asarray([1.0, 2.0], jnp.float32)
    corr = np.asarray(solve_generic_particle_constraint(cfun, pts, w))
    # closed form: dx0 = +w0/(w0+w1) * C * n, dx1 = -w1/(w0+w1) * C * n
    d = np.asarray(pts[1] - pts[0])
    ln = np.linalg.norm(d)
    n = d / ln
    c = ln - rest
    np.testing.assert_allclose(corr[0], (1.0 / 3.0) * c * n, atol=1e-5)
    np.testing.assert_allclose(corr[1], -(2.0 / 3.0) * c * n, atol=1e-5)


def _cloth_scene(generic: bool, n=8):
    b = SceneBuilder(use_structured_grid=False)
    tm = b.add_regular_triangle_model(n, n)
    b.set_mass(tm.offset, 0.0)
    b.set_mass(tm.offset + n - 1, 0.0)
    edges = tm.mesh.edges + tm.offset
    if generic:
        x0 = np.concatenate(b._x)
        rests = np.linalg.norm(x0[edges[:, 0]] - x0[edges[:, 1]],
                               axis=-1)[:, None]

        def cfun(pts, params):
            return jnp.array(
                [jnp.linalg.norm(pts[1] - pts[0]) - params[0]])

        b.add_generic_constraints(cfun, edges, stiffness=1.0, params=rests)
    else:
        b.add_cloth_constraints(tm, method=1, distance_stiffness=1.0)
    return b.build()


def test_generic_cloth_matches_distance_cloth():
    """The GenericParticleConstraintsDemo scenario: a cloth held together
    purely by generic distance constraints produces the same trajectory
    as the dedicated classic distance batch."""
    cfg = StepConfig(dt=0.005, substeps=5)
    state_g, cset_g = _cloth_scene(True)
    state_d, cset_d = _cloth_scene(False)
    fin_g, _ = jax.jit(lambda s: rollout(s, cset_g, cfg, 50))(state_g)
    fin_d, _ = jax.jit(lambda s: rollout(s, cset_d, cfg, 50))(state_d)
    xg = np.asarray(fin_g.particles.x)
    xd = np.asarray(fin_d.particles.x)
    assert np.isfinite(xg).all()
    np.testing.assert_allclose(xg, xd, atol=2e-4)


def test_generic_isometric_bending_runs():
    """Generic 4-point bending energy constraint (the demo's generic
    isometric bending): stable and bends less than a bending-free
    cloth."""
    n = 8
    cfg = StepConfig(dt=0.005, substeps=5)

    def build(with_bend):
        b = SceneBuilder(use_structured_grid=False)
        tm = b.add_regular_triangle_model(n, n)
        b.set_mass(tm.offset, 0.0)
        b.set_mass(tm.offset + n - 1, 0.0)
        b.add_cloth_constraints(tm, method=1)
        if with_bend:
            st = tm.mesh.bending_stencils() + tm.offset
            x0 = np.concatenate(b._x)

            def bend_fn(pts):
                # dihedral-style bend: distance of the two flap vertices
                # relative to the shared edge length
                e = pts[3] - pts[2]
                m = 0.5 * (pts[2] + pts[3])
                return jnp.array([jnp.dot(pts[0] - m, pts[1] - m)
                                  / jnp.maximum(jnp.dot(e, e), 1e-9)])

            b.add_generic_constraints(bend_fn, st, stiffness=0.05)
        return b.build()

    state_b, cset_b = build(True)
    fin_b, _ = jax.jit(lambda s: rollout(s, cset_b, cfg, 80))(state_b)
    assert np.isfinite(np.asarray(fin_b.particles.x)).all()


def test_generic_rigid_ball_joint():
    """Generic rigid constraint reproducing a ball joint: two bodies
    pinned at a shared point, one static — the
    GenericRigidBodyConstraintsDemo scenario."""
    anchor = jnp.asarray([1.0, 0.0, 0.0])

    def cfun(x, q):
        from positionbaseddynamics_tpu.ops import quaternion as quat
        # world anchor fixed at body-0 local (1,0,0) and body-1 local
        # (-1,0,0); constraint = their separation
        c0 = quat.rotate(q[0], jnp.array([1.0, 0, 0])) + x[0]
        c1 = quat.rotate(q[1], jnp.array([-1.0, 0, 0])) + x[1]
        return c0 - c1

    b = SceneBuilder()
    b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    b.add_rigid_body((2.0, 0.0, 0.0), mass=1.0, inertia=(0.4, 0.4, 0.4))
    b.add_generic_rigid_constraints(cfun, [[0, 1]])
    state, cset = b.build()
    cfg = StepConfig(dt=0.005, substeps=5)
    fin, _ = jax.jit(lambda s: rollout(s, cset, cfg, 200))(state)
    x = np.asarray(fin.rigid.x)
    q = np.asarray(fin.rigid.q)
    assert np.isfinite(x).all() and np.isfinite(q).all()
    # body 1 swings like a pendulum about the anchor: its connector stays
    # at the anchor point
    from positionbaseddynamics_tpu.utils import npquat
    c1 = npquat.rotate(q[1], np.array([-1.0, 0, 0])) + x[1]
    np.testing.assert_allclose(c1, np.asarray(anchor), atol=0.02)
    # it fell below the start height
    assert x[1, 1] < -0.3

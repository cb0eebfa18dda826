"""Density-built rigid bodies (RigidBody::initBody(density, …) +
determineMassProperties, Simulation/RigidBody.h:122-260): mass-property
flow-through, main-axis re-baking, and collision-frame correctness."""
import numpy as np

import jax
import jax.numpy as jnp

from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig, make_step_fn, rollout
from positionbaseddynamics_tpu.utils.loaders import load_obj

REF = "/root/reference/data/models"


def test_density_cube_mass_properties():
    m = load_obj(f"{REF}/cube.obj")
    b = SceneBuilder()
    scale = (2.0, 1.0, 0.5)
    rb = b.add_rigid_body_from_mesh(
        m["vertices"], m["faces"], density=500.0,
        translation=(0.0, 3.0, 0.0), scale=scale)
    state, _ = b.build()
    mass = 1.0 / float(state.rigid.inv_mass[rb])
    np.testing.assert_allclose(mass, 500.0 * 2.0 * 1.0 * 0.5, rtol=1e-5)
    # body position is the world COM (cube is origin-centered)
    np.testing.assert_allclose(np.asarray(state.rigid.x[rb]),
                               [0.0, 3.0, 0.0], atol=1e-6)
    # principal moments match the closed-form box inertia (sorted)
    expect = np.sort(mass / 12.0 * np.array([
        1.0**2 + 0.5**2, 2.0**2 + 0.5**2, 2.0**2 + 1.0**2]))
    got = np.sort(np.asarray(state.rigid.inertia0[rb]))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_density_body_freefall_matches_explicit():
    """A density-built body and an explicit-mass body with the same
    physical properties produce the same COM trajectory."""
    m = load_obj(f"{REF}/cube.obj")
    b = SceneBuilder()
    rb0 = b.add_rigid_body_from_mesh(m["vertices"], m["faces"], density=100.0,
                                     translation=(0.0, 5.0, 0.0),
                                     velocity=(1.0, 0.0, 0.0))
    rb1 = b.add_rigid_body((0.0, 5.0, 0.0), mass=100.0,
                           inertia=(100 / 12 * 2,) * 3,
                           velocity=(1.0, 0.0, 0.0))
    state, cset = b.build()
    final, _ = jax.jit(lambda s: rollout(s, cset, StepConfig(), 50))(state)
    np.testing.assert_allclose(np.asarray(final.rigid.x[rb0]),
                               np.asarray(final.rigid.x[rb1]), atol=1e-5)


def test_mesh_body_drops_onto_static_box():
    """Dynamic mesh-built cube (rotated 45° so the main-axis frame is
    non-trivially oriented) falls onto an explicit static floor box and
    comes to rest without penetration — exercises the point-side collider
    verts in the re-baked body frame."""
    m = load_obj(f"{REF}/cube.obj")
    b = SceneBuilder()
    ang = np.pi / 4
    q = (np.cos(ang / 2), 0.0, 0.0, np.sin(ang / 2))  # about x
    rb = b.add_rigid_body_from_mesh(m["vertices"], m["faces"], density=100.0,
                                    translation=(0.0, 2.0, 0.0), q=q)
    floor = b.add_rigid_body((0.0, -0.5, 0.0), mass=0.0)
    b.add_collision_box(floor, (20.0, 0.5, 20.0), restitution=0.0)
    b.add_collision_box(rb, (0.5, 0.5, 0.5), restitution=0.0, friction=0.4)
    state, cset = b.build()
    pipe = b.build_collision_pipeline()
    fn = make_step_fn(cset, StepConfig(), pipe)
    for _ in range(400):
        state = fn(state)
    x = np.asarray(state.rigid.x[rb])
    assert np.isfinite(x).all()
    # resting on the floor (top at y=0): COM of a tilted cube is between
    # 0.5 (flat) and sqrt(2)/2 (edge balance); penetration would be < 0.45
    assert 0.4 < x[1] < 0.8
    v = np.asarray(state.rigid.v[rb])
    assert np.linalg.norm(v) < 0.5


def test_static_mesh_floor_shape_frame():
    """Shape-side frame transform: a static mesh-built floor whose local
    mesh origin is NOT its COM (shifted cube), so the body state is
    re-baked to the COM while the analytic box collider stays centered at
    the mesh-frame origin. A ball dropped above that origin must come to
    rest at the height implied by the *mesh-frame* shape placement."""
    from positionbaseddynamics_tpu.collision.sdf import SDFShape

    m = load_obj(f"{REF}/cube.obj")
    # local box spans [0, 1]^3 after the shift (origin at a corner)
    verts = np.asarray(m["vertices"]) + 0.5
    b = SceneBuilder()
    floor = b.add_rigid_body_from_mesh(
        verts, m["faces"], density=1000.0, scale=(40.0, 1.0, 40.0),
        translation=(-20.0, -1.0, -20.0), is_dynamic=False)
    # analytic box centered at the mesh-frame origin, which sits at world
    # (-20, -1, -20); its top face is therefore at world y = -0.5
    b.add_collision_object(floor, SDFShape.box((20.0, 0.5, 20.0)),
                           verts=np.zeros((0, 3), np.float32))
    ball = b.add_rigid_body((-20.0, 2.0, -20.0), mass=1.0,
                            inertia=(0.4, 0.4, 0.4))
    b.add_collision_sphere(ball, 0.5)
    state, cset = b.build()
    pipe = b.build_collision_pipeline()
    fn = make_step_fn(cset, StepConfig(), pipe)
    for _ in range(300):
        state = fn(state)
    x = np.asarray(state.rigid.x[ball])
    assert np.isfinite(x).all()
    # rest height: shape top (-0.5) + ball radius (0.5) + tolerance
    np.testing.assert_allclose(x[1], 0.0, atol=0.08)

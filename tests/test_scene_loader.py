"""Scene JSON loader end-to-end: the reference's shipped scenes load,
build, and run headless with finite, physically sane trajectories —
BASELINE.md configs 4 (PileScene) and 5 (ArmadilloCollisionScene) plus
ClothOnBunny (SceneLoaderDemo.cpp:47-105 equivalents)."""
import os

import numpy as np
import pytest

import jax

from positionbaseddynamics_tpu.scene import load_scene
from positionbaseddynamics_tpu.solver import make_step_fn

SCENES = "/root/reference/data/scenes"
CACHE = "/tmp/pbd_tpu_test_sdf_cache"


def _run(scene, n_steps):
    fn = make_step_fn(scene.cset, scene.config, scene.pipeline)
    state = scene.state
    for _ in range(n_steps):
        state = fn(state)
    return jax.block_until_ready(state)


@pytest.fixture(scope="module")
def pile_scene():
    return load_scene(f"{SCENES}/PileScene.json", cache_dir=CACHE,
                      max_sdf_resolution=14)


def test_pile_scene_loads_partially(pile_scene):
    """28 of the scene's 34 bodies load: 25 static cylinders + 1 floor +
    2 dynamic bunnies. The 6 armadillo bodies reference armadillo.obj,
    which the reference repo does not ship, and are skipped exactly as the
    reference demo skips load failures (SceneLoaderDemo.cpp:474-475)."""
    s = pile_scene
    assert len(s.rigid_ids) == 28
    assert len(s.skipped_bodies) == 6
    assert all("armadillo" in path for _, path in s.skipped_bodies)
    inv_m = np.asarray(s.state.rigid.inv_mass)
    assert (inv_m > 0).sum() == 2          # the two bunnies
    assert s.pipeline is not None and s.pipeline.active
    assert s.config.dt == 0.005
    assert s.config.max_iterations == 5    # "maxIter" alias
    # static-static pairs are pruned
    for (i, j) in s.pipeline.rb_pairs:
        ca = s.pipeline.rigid_colliders[i]
        cb = s.pipeline.rigid_colliders[j]
        assert inv_m[ca.body] > 0 or inv_m[cb.body] > 0


def test_pile_scene_runs(pile_scene):
    s = pile_scene
    y0 = np.asarray(s.state.rigid.x)[:, 1].copy()
    state = _run(s, 40)
    x = np.asarray(state.rigid.x)
    assert np.isfinite(x).all()
    inv_m = np.asarray(state.rigid.inv_mass)
    dyn = inv_m > 0
    # dynamic bunnies fall under gravity; statics don't move
    assert (x[dyn, 1] < y0[dyn] - 0.005).all()
    np.testing.assert_allclose(x[~dyn], np.asarray(s.state.rigid.x)[~dyn],
                               atol=1e-6)


def test_armadillo_scene_loads_and_runs():
    s = load_scene(f"{SCENES}/ArmadilloCollisionScene.json", cache_dir=CACHE)
    assert len(s.tet_models) == 3
    assert len(s.rigid_ids) == 1           # static floor box
    # solid method from "tetModelSimulationMethod": 2 -> classic FEM tet
    assert s.cset.fem_tetra is not None
    n_parts = np.asarray(s.state.particles.x).shape[0]
    assert n_parts == 3 * 1180
    y0 = np.asarray(s.state.particles.x)[:, 1].copy()
    state = _run(s, 30)
    x = np.asarray(state.particles.x)
    assert np.isfinite(x).all()
    # every armadillo is in free fall onto the floor
    assert x[:, 1].mean() < y0.mean() - 0.01
    # FEM keeps the models coherent: no particle flies away
    assert np.abs(x).max() < 50.0


def test_cloth_on_bunny_loads_and_runs():
    s = load_scene(f"{SCENES}/ClothOnBunny.json", cache_dir=CACHE,
                   max_sdf_resolution=20)
    assert len(s.tri_models) == 1
    _, h = s.tri_models[0]
    assert h.mesh.n_vertices == 51 * 51   # plane_50x50.obj = 50x50 quads
    y0 = np.asarray(s.state.particles.x)[:, 1].copy()
    state = _run(s, 30)
    x = np.asarray(state.particles.x)
    assert np.isfinite(x).all()
    assert x[:, 1].mean() < y0.mean()      # cloth falls
    # the bunny SDF holds the center of the cloth up: it cannot all fall
    # below the bunny's top (bunny scaled 4x at translation (5, 1, 0))
    assert x[:, 1].max() > 1.0


def test_deformable_solid_collision_scene():
    s = load_scene(f"{SCENES}/DeformableSolidCollisionScene.json",
                   cache_dir=CACHE, max_sdf_resolution=12)
    state = _run(s, 25)
    assert np.isfinite(np.asarray(state.particles.x)).all()
    assert np.isfinite(np.asarray(state.rigid.x)).all()


def test_wilberforce_scene_stiff_rods():
    """The StiffRods scene extension (CosseratJoints + TreeModels,
    Demos/StiffRodsDemos/StiffRodsSceneLoader.cpp): an 82-segment steel
    helix chain solved by the direct stiff-rod solver; the Wilberforce
    pendulum scene of the reference."""
    s = load_scene(f"{SCENES}/Wilberforce_scene.json", cache_dir=CACHE,
                   enable_collision=False)
    assert len(s.rigid_ids) == 82
    assert len(s.cset.direct_rods) == 1
    db = s.cset.direct_rods[0]
    assert db.bodies.shape == (1, 82)
    inv_m = np.asarray(s.state.rigid.inv_mass)
    assert (inv_m == 0).sum() == 1        # one static anchor segment
    state = _run(s, 20)
    x = np.asarray(state.rigid.x)
    q = np.asarray(state.rigid.q)
    assert np.isfinite(x).all() and np.isfinite(q).all()
    # the steel helix holds together: segment COM spacing stays at its
    # initial value (a broken chain would stretch, an unstable solve
    # would blow up)
    chain = np.asarray(db.bodies)[0]
    x0 = np.asarray(s.state.rigid.x)
    d0 = np.linalg.norm(np.diff(x0[chain], axis=0), axis=1)
    d = np.linalg.norm(np.diff(x[chain], axis=0), axis=1)
    np.testing.assert_allclose(d, d0, atol=0.02)


def test_branched_tree_model_routes_to_tree_solver(tmp_path):
    """A TreeModels entry whose CosseratJoints branch (one segment with
    two children) loads into the dense tree direct solver instead of the
    chain fallback (DirectPositionBasedSolverForStiffRodsDemo tree
    scenes, PositionBasedElasticRods.cpp:735-1107)."""
    import json

    scene = {
        "Name": "YTree",
        "RigidBodies": [
            {"id": i, "geometryFile": "../models/cube.obj",
             "translation": t, "scale": [0.1, 0.5, 0.1],
             "isDynamic": 1, "density": 1000,
             "collisionObjectType": 0}
            for i, t in enumerate([[0.0, 0.0, 0.0], [0.0, -0.5, 0.0],
                                   [0.1, -1.0, 0.0], [-0.1, -1.0, 0.0]])
        ],
        "CosseratJoints": [
            {"id": 0, "bodyID1": 0, "bodyID2": 1,
             "position": [0.0, -0.25, 0.0]},
            {"id": 1, "bodyID1": 1, "bodyID2": 2,
             "position": [0.0, -0.75, 0.0]},
            {"id": 2, "bodyID1": 1, "bodyID2": 3,
             "position": [0.0, -0.75, 0.0]},
        ],
        "TreeModels": [
            {"rbIds": [0, 1, 2, 3], "jIds": [0, 1, 2],
             "staticSegments": [0],
             "youngsModulus": 1e6, "torsionModulus": 1e6}
        ],
    }
    # resource paths resolve relative to the scene dir ("../models/…"),
    # mirroring the reference's data layout
    import shutil
    os.makedirs(tmp_path / "models", exist_ok=True)
    shutil.copy("/root/reference/data/models/cube.obj",
                tmp_path / "models" / "cube.obj")
    # loader resolves "../models/x.obj" relative to the scene dir
    scenes_dir = tmp_path / "scenes"
    os.makedirs(scenes_dir, exist_ok=True)
    p2 = scenes_dir / "ytree.json"
    p2.write_text(json.dumps(scene))

    from positionbaseddynamics_tpu.solver.direct_rods import (
        DirectRodTreeBatch)

    s = load_scene(str(p2), cache_dir=CACHE)
    assert len(s.cset.direct_rods) == 1
    assert isinstance(s.cset.direct_rods[0], DirectRodTreeBatch)
    assert s.cset.direct_rods[0].edges.shape == (3, 2)
    state = _run(s, 20)
    x = np.asarray(state.rigid.x)
    assert np.isfinite(x).all()
    # static root held; both branch tips fell
    np.testing.assert_allclose(x[0], [0.0, 0.0, 0.0], atol=1e-6)
    assert (x[2:, 1] < -1.0 + -1e-4).all()


def test_car_scene_loads_and_runs():
    """CarScene (the only shipped scene with motor joints under load):
    11 rigid bodies, 4 TargetVelocityMotorHingeJoints (wheels), 4
    DamperJoints (suspension), 1 TargetAngleMotorHingeJoint (steering).
    The car must settle on its wheels (chassis stays above the ground
    plane) and the driven wheels must actually spin."""
    s = load_scene(f"{SCENES}/CarScene.json", cache_dir=CACHE,
                   max_sdf_resolution=14)
    r0 = np.asarray(s.state.rigid.x)
    st = _run(s, 60)
    x = np.asarray(st.rigid.x)
    om = np.asarray(st.rigid.omega)
    assert np.isfinite(x).all() and np.isfinite(om).all()
    # nothing fell through the world (all bodies within a sane band)
    assert x[:, 1].min() > r0[:, 1].min() - 2.0
    # the motor-driven wheels rotate (hinge motors exercise
    # solve_TargetVelocityMotorHingeJoint under gravity load)
    assert np.abs(om).max() > 0.5


def test_cloth_collision_scene_drapes():
    """ClothCollisionScene: one cloth over 4 rigid bodies (the only
    shipped scene with cloth-vs-multiple-SDF contact). The cloth must
    fall, collide, and come to rest ON the bodies — not pass through."""
    s = load_scene(f"{SCENES}/ClothCollisionScene.json", cache_dir=CACHE,
                   max_sdf_resolution=14)
    p0 = np.asarray(s.state.particles.x)
    st = _run(s, 80)
    x = np.asarray(st.particles.x)
    assert np.isfinite(x).all()
    assert x[:, 1].mean() < p0[:, 1].mean() - 0.01   # it fell
    # resting height: above the top of the (static floor) bodies' span
    floor_top = np.asarray(s.state.rigid.x)[:, 1].min()
    assert x[:, 1].min() > floor_top - 3.0
    assert np.abs(x[:, 1].min() - x[:, 1].max()) > 1e-3  # draped, not rigid

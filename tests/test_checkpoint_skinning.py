"""Checkpoint save/load (SURVEY §5) and tet vis-mesh skinning
(``TetModel::attachVisMesh``/``updateVisMesh``,
``Simulation/TetModel.h:21-28,74-84``)."""
import numpy as np

import jax
import jax.numpy as jnp

from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.models.skinning import VisMeshAttachment
from positionbaseddynamics_tpu.solver import StepConfig, rollout
from positionbaseddynamics_tpu.utils.checkpoint import load_state, save_state


def test_checkpoint_roundtrip_resumes_exactly(tmp_path):
    b = SceneBuilder()
    tm = b.add_regular_triangle_model(8, 8)
    b.set_mass(tm.offset, 0.0)
    b.add_cloth_constraints(tm, method=4)
    state, cset = b.build()
    cfg = StepConfig()
    mid, _ = jax.jit(lambda s: rollout(s, cset, cfg, 20))(state)
    save_state(tmp_path / "ckpt.npz", mid)
    restored = load_state(tmp_path / "ckpt.npz", state)
    a, _ = jax.jit(lambda s: rollout(s, cset, cfg, 10))(mid)
    bb, _ = jax.jit(lambda s: rollout(s, cset, cfg, 10))(restored)
    np.testing.assert_array_equal(np.asarray(a.particles.x),
                                  np.asarray(bb.particles.x))


def test_vis_mesh_skinning_follows_deformation():
    b = SceneBuilder()
    tm = b.add_regular_tet_model(4, 4, 4, scale=(1.0, 1.0, 1.0))
    b.add_solid_constraints(tm, method=3, stiffness=1e5)
    for i in range(16):       # pin the bottom layer-ish nodes
        b.set_mass(tm.offset + i, 0.0)
    state, cset = b.build()
    rest = np.asarray(state.particles.x)

    # vis mesh: random points strictly inside the bar
    rng = np.random.default_rng(0)
    lo, hi = rest.min(0), rest.max(0)
    vis = lo + (0.15 + 0.7 * rng.random((50, 3))) * (hi - lo)
    att = VisMeshAttachment.create(vis, tm, rest)

    # binding reproduces rest positions exactly (all points interior)
    np.testing.assert_allclose(
        np.asarray(att.skin(state.particles.x)), vis, atol=1e-4)

    # after deformation the skinned verts track the model
    fin, _ = jax.jit(lambda s: rollout(s, cset, StepConfig(), 60))(state)
    skinned = np.asarray(att.skin(fin.particles.x))
    assert np.isfinite(skinned).all()
    moved = np.linalg.norm(skinned - vis, axis=1)
    body_moved = np.linalg.norm(
        np.asarray(fin.particles.x) - rest, axis=1).max()
    assert moved.max() > 0.01                  # they actually moved
    assert moved.max() <= body_moved + 1e-3    # by interpolation only


def test_face_and_vertex_normals():
    """face_normals/vertex_normals (IndexedFaceMesh::updateNormals /
    updateVertexNormals): flat xy-grid → all +z; area weighting keeps
    unit length after normalization."""
    import jax.numpy as jnp
    import numpy as np
    from positionbaseddynamics_tpu.models import (
        face_normals, regular_triangle_grid, vertex_normals)

    x, faces = regular_triangle_grid(5, 4, scale=(1.0, 1.0))
    x = np.asarray(x, np.float32)
    assert np.allclose(x[:, 2], 0.0)   # builder grids are z=0 planar
    x = jnp.asarray(x)
    fn = np.asarray(face_normals(x, jnp.asarray(faces)))
    vn = np.asarray(vertex_normals(x, jnp.asarray(faces)))
    assert np.allclose(np.abs(fn[:, 2]), 1.0, atol=1e-6)
    assert np.allclose(np.abs(vn[:, 2]), 1.0, atol=1e-6)
    assert np.allclose(np.linalg.norm(vn, axis=1), 1.0, atol=1e-5)

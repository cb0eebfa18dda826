"""Mesh ingestion + mass properties (Utils/OBJLoader, TetGenLoader,
VolumeIntegration equivalents)."""
import numpy as np
import pytest

from positionbaseddynamics_tpu.utils.loaders import (load_obj, load_ply,
                                                     load_tetgen)
from positionbaseddynamics_tpu.utils.massprops import (mass_properties,
                                                       principal_frame)

REF = "/root/reference/data/models"


def test_load_obj_cube():
    m = load_obj(f"{REF}/cube.obj")
    v, f = m["vertices"], m["faces"]
    assert v.shape == (8, 3)
    assert f.shape[0] == 12          # quads fan-triangulated
    assert f.min() == 0 and f.max() == 7
    np.testing.assert_allclose(np.abs(v).max(), 0.5)


def test_load_obj_bunny_closed():
    m = load_obj(f"{REF}/bunny_10k.obj")
    v, f = m["vertices"], m["faces"]
    assert v.shape[0] > 4000 and f.shape[0] > 8000
    # every edge of a closed manifold appears exactly twice
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    key = e.min(1).astype(np.int64) * v.shape[0] + e.max(1)
    _, counts = np.unique(key, return_counts=True)
    assert (counts == 2).all()


def test_load_tetgen_armadillo():
    v, t = load_tetgen(f"{REF}/armadillo_4k.node", f"{REF}/armadillo_4k.ele")
    assert v.shape == (1180, 3)
    assert t.shape == (3717, 4)
    assert t.min() == 0 and t.max() == 1179
    # all tets positively oriented or at least non-degenerate
    a, b, c, d = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]], v[t[:, 3]]
    vol = np.einsum("ij,ij->i", b - a, np.cross(c - a, d - a)) / 6.0
    assert (np.abs(vol) > 1e-12).all()


def test_load_ply_roundtrip(tmp_path):
    # ascii PLY of a tetrahedron
    p = tmp_path / "tet.ply"
    p.write_text(
        "ply\nformat ascii 1.0\nelement vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 4\nproperty list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0\n1 0 0\n0 1 0\n0 0 1\n"
        "3 0 2 1\n3 0 1 3\n3 0 3 2\n3 1 2 3\n")
    m = load_ply(str(p))
    assert m["vertices"].shape == (4, 3)
    assert m["faces"].shape == (4, 3)


def test_load_ply_binary(tmp_path):
    import struct
    hdr = (b"ply\nformat binary_little_endian 1.0\n"
           b"element vertex 3\n"
           b"property float x\nproperty float y\nproperty float z\n"
           b"element face 1\nproperty list uchar int vertex_indices\n"
           b"end_header\n")
    body = b"".join(struct.pack("<3f", *p) for p in
                    [(0, 0, 0), (1, 0, 0), (0, 1, 0)])
    body += struct.pack("<B3i", 3, 0, 1, 2)
    p = tmp_path / "tri.ply"
    p.write_bytes(hdr + body)
    m = load_ply(str(p))
    np.testing.assert_allclose(m["vertices"][1], [1, 0, 0])
    np.testing.assert_array_equal(m["faces"], [[0, 1, 2]])


# ---------------------------------------------------------------------------
# VolumeIntegration parity: closed-form box / sphere inertia
# ---------------------------------------------------------------------------


def test_mass_properties_box():
    m = load_obj(f"{REF}/cube.obj")   # unit cube centered at origin
    scale = np.array([2.0, 3.0, 4.0])
    mass, com, inertia = mass_properties(m["vertices"] * scale, m["faces"],
                                         density=500.0)
    vol = scale.prod()
    np.testing.assert_allclose(mass, 500.0 * vol, rtol=1e-12)
    np.testing.assert_allclose(com, 0.0, atol=1e-12)
    expect = 500.0 * vol / 12.0 * np.array([
        scale[1]**2 + scale[2]**2,
        scale[0]**2 + scale[2]**2,
        scale[0]**2 + scale[1]**2])
    np.testing.assert_allclose(np.diag(inertia), expect, rtol=1e-12)
    off = inertia - np.diag(np.diag(inertia))
    np.testing.assert_allclose(off, 0.0, atol=1e-9)


def test_mass_properties_sphere():
    m = load_obj(f"{REF}/sphere.obj")
    v = m["vertices"]
    r = np.linalg.norm(v, axis=1).mean()
    mass, com, inertia = mass_properties(v, m["faces"], density=1.0)
    vol = 4.0 / 3.0 * np.pi * r**3
    assert abs(mass - vol) / vol < 0.05          # faceted sphere
    np.testing.assert_allclose(com, 0.0, atol=1e-3)
    expect = 0.4 * mass * r * r
    np.testing.assert_allclose(np.diag(inertia), expect, rtol=0.05)


def test_mass_properties_translated_box():
    """COM and parallel-axis shift: translated cube has the same
    COM-frame inertia."""
    m = load_obj(f"{REF}/cube.obj")
    t = np.array([1.5, -2.0, 0.7])
    mass0, com0, in0 = mass_properties(m["vertices"], m["faces"])
    mass1, com1, in1 = mass_properties(m["vertices"] + t, m["faces"])
    np.testing.assert_allclose(mass1, mass0, rtol=1e-12)
    np.testing.assert_allclose(com1, com0 + t, atol=1e-12)
    np.testing.assert_allclose(in1, in0, atol=1e-10)


def test_principal_frame_rotated_box():
    """Diagonalization recovers box axes after an arbitrary rotation."""
    m = load_obj(f"{REF}/cube.obj")
    scale = np.array([1.0, 2.0, 3.0])
    ang = 0.7
    rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0],
                    [0, 0, 1.0]])
    v = (m["vertices"] * scale) @ rot.T
    _, _, inertia = mass_properties(v, m["faces"], density=2.0)
    eigs, pr = principal_frame(inertia)
    assert abs(np.linalg.det(pr) - 1.0) < 1e-9
    mass = 2.0 * scale.prod()
    expect = np.sort(mass / 12.0 * np.array([
        scale[1]**2 + scale[2]**2,
        scale[0]**2 + scale[2]**2,
        scale[0]**2 + scale[1]**2]))
    np.testing.assert_allclose(eigs, expect, rtol=1e-9)
    # rotating inertia back by the principal frame diagonalizes it
    diag = pr.T @ inertia @ pr
    np.testing.assert_allclose(diag - np.diag(np.diag(diag)), 0.0,
                               atol=1e-9)


def test_obj_uv_roundtrip(tmp_path):
    """UVs/texcoords survive OBJ load -> TriangleMesh -> OBJ export
    (IndexedFaceMesh m_uvs/m_uvIndices, Utils/IndexedFaceMesh.h)."""
    import os
    import sys
    src = tmp_path / "quad.obj"
    src.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1 2/2 3/3\nf 1/1 3/3 4/4\n")
    from positionbaseddynamics_tpu.utils.loaders import load_obj
    from positionbaseddynamics_tpu.models import SceneBuilder
    geo = load_obj(str(src))
    assert geo["uvs"].shape == (4, 2)
    assert geo["uv_indices"].shape == (2, 3)

    b = SceneBuilder()
    h = b.add_triangle_model(geo["vertices"], geo["faces"],
                             uvs=geo["uvs"], uv_indices=geo["uv_indices"])
    assert h.mesh.uvs.shape == (4, 2)
    assert h.mesh.uv_indices.shape == (2, 3)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from run_scene import export_obj
    out = tmp_path / "out.obj"
    export_obj(str(out), geo["vertices"], h.mesh.faces, uvs=h.mesh.uvs,
               uv_indices=h.mesh.uv_indices)
    geo2 = load_obj(str(out))
    np.testing.assert_allclose(geo2["uvs"], geo["uvs"], atol=1e-6)
    np.testing.assert_array_equal(geo2["uv_indices"], geo["uv_indices"])

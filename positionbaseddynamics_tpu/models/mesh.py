"""Host-side mesh topology (numpy, fully vectorized) — the analogue of
``Utils/IndexedFaceMesh`` / ``Utils/IndexedTetMesh``: edge and adjacency
extraction used to emit distance constraints per edge and bending stencils
per interior edge (``SimulationModel.cpp:1125-1240``).

Everything here runs once at scene-build time on the host; only the
resulting index arrays reach the device. Edge order is face-major
first-occurrence, matching the reference's per-face edge enumeration
(``IndexedFaceMesh::buildNeighbors``).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def _unique_edges(halfedges: np.ndarray):
    """Deduplicate (a, b) pairs keeping first-occurrence order and original
    orientation. Returns ``(edges (E,2), edge_id (H,), first_he (E,))``."""
    key = np.sort(halfedges, axis=1)
    _, first_idx, inv = np.unique(key, axis=0, return_index=True,
                                  return_inverse=True)
    order = np.argsort(first_idx, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    edge_id = rank[inv]                      # halfedge → edge (appearance order)
    first_he = np.sort(first_idx)
    return halfedges[first_he].astype(np.int32), edge_id, first_he


@dataclass
class TriangleMesh:
    """Indexed triangle mesh with edge topology.

    ``edges (E, 2)`` vertex pairs; ``edge_faces (E, 2)`` adjacent face ids
    (−1 for boundary), mirroring ``IndexedFaceMesh::buildNeighbors``.
    ``uvs (T, 2)`` / ``uv_indices (F, 3)`` carry texture coordinates with
    per-corner texture indices (``IndexedFaceMesh`` m_uvs/m_uvIndices,
    ``Utils/IndexedFaceMesh.h``) — optional, used by OBJ export.
    """

    n_vertices: int
    faces: np.ndarray              # (F, 3) int32
    uvs: np.ndarray = None         # (T, 2) float32 or None
    uv_indices: np.ndarray = None  # (F, 3) int32 or None
    edges: np.ndarray = field(init=False)
    edge_faces: np.ndarray = field(init=False)

    def __post_init__(self):
        self.faces = np.asarray(self.faces, np.int32).reshape(-1, 3)
        if self.uvs is not None and len(np.asarray(self.uvs)):
            self.uvs = np.asarray(self.uvs, np.float32).reshape(-1, 2)
            if self.uv_indices is not None and len(
                    np.asarray(self.uv_indices)):
                self.uv_indices = np.asarray(
                    self.uv_indices, np.int32).reshape(-1, 3)
            else:
                self.uv_indices = None
        else:
            self.uvs = None
            self.uv_indices = None
        f = self.faces
        n_f = len(f)
        # face-major halfedge order: (v0,v1), (v1,v2), (v2,v0) per face
        he = np.stack([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]],
                      axis=1).reshape(-1, 2)
        self.edges, edge_id, first_he = _unique_edges(he)
        hf = np.repeat(np.arange(n_f, dtype=np.int32), 3)
        n_e = len(self.edges)
        ef = np.full((n_e, 2), -1, np.int32)
        ef[:, 0] = hf[first_he]
        is_first = np.zeros(len(he), bool)
        is_first[first_he] = True
        rest = ~is_first
        ef[edge_id[rest], 1] = hf[rest]
        self.edge_faces = ef

    def bending_stencils(self) -> np.ndarray:
        """Interior-edge stencils ``(p0, p1, p2, p3)`` — p0/p1 the flap
        vertices opposite the shared edge (p2, p3) — in the order
        ``SimulationModel::addBendingConstraints`` emits them
        (``SimulationModel.cpp:1186-1240``)."""
        interior = (self.edge_faces[:, 0] >= 0) & (self.edge_faces[:, 1] >= 0)
        e = self.edges[interior]
        f0 = self.faces[self.edge_faces[interior, 0]]
        f1 = self.faces[self.edge_faces[interior, 1]]
        # each adjacent face contains both edge vertices; the flap vertex is
        # the remaining one: sum(face) − a − b
        a, b = e[:, 0].astype(np.int64), e[:, 1].astype(np.int64)
        p0 = f0.astype(np.int64).sum(1) - a - b
        p1 = f1.astype(np.int64).sum(1) - a - b
        return np.stack([p0, p1, a, b], axis=1).astype(np.int32)


@dataclass
class TetMesh:
    """Indexed tetrahedral mesh with edge extraction and surface faces
    (``Utils/IndexedTetMesh``)."""

    n_vertices: int
    tets: np.ndarray               # (T, 4) int32
    edges: np.ndarray = field(init=False)
    surface_faces: np.ndarray = field(init=False)

    _TET_EDGES = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
    # face i is opposite vertex i; winding so normals point outward for
    # positively oriented tets.
    _TET_FACES = ((1, 3, 2), (0, 2, 3), (0, 3, 1), (0, 1, 2))

    def __post_init__(self):
        self.tets = np.asarray(self.tets, np.int32).reshape(-1, 4)
        t = self.tets
        he = np.stack([t[:, list(e)] for e in self._TET_EDGES],
                      axis=1).reshape(-1, 2)
        self.edges, _, _ = _unique_edges(he)

        tris = np.stack([t[:, list(fa)] for fa in self._TET_FACES],
                        axis=1).reshape(-1, 3)
        key = np.sort(tris, axis=1)
        _, first_idx, inv, counts = np.unique(
            key, axis=0, return_index=True, return_inverse=True,
            return_counts=True)
        surface = counts[inv[first_idx]] == 1
        self.surface_faces = tris[first_idx[surface]].astype(np.int32)


def face_normals(x, faces):
    """Per-face unit normals of deformed vertex positions ``x (N, 3)`` —
    jittable (jnp in, jnp out): ``IndexedFaceMesh::updateNormals``
    (``Utils/IndexedFaceMesh.h:96-121``). As in the reference, degenerate
    faces (normalized cross product with squared norm < 1e-6) get the
    UnitX fallback normal."""
    import jax.numpy as jnp

    a = x[faces[:, 0]]
    n = jnp.cross(x[faces[:, 1]] - a, x[faces[:, 2]] - a)
    l2 = jnp.sum(n * n, axis=-1, keepdims=True)
    n = jnp.where(l2 < 1e-24, 0.0, n / jnp.sqrt(jnp.maximum(l2, 1e-30)))
    # reference: if normalized normal squaredNorm < 1e-6 → Vector3r::UnitX()
    degenerate = jnp.sum(n * n, axis=-1, keepdims=True) < 1e-6
    unit_x = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], x.dtype), n.shape)
    return jnp.where(degenerate, unit_x, n)


def vertex_normals(x, faces, n_vertices=None):
    """Per-vertex unit normals — jittable scatter-add of *normalized* face
    normals (uniform weighting), exactly matching
    ``IndexedFaceMesh::updateVertexNormals``
    (``Utils/IndexedFaceMesh.h:123-146``): each incident face contributes
    its unit normal regardless of area, then the sum is normalized."""
    import jax.numpy as jnp

    if n_vertices is None:
        n_vertices = x.shape[0]
    fn = face_normals(x, faces)
    vn = jnp.zeros((n_vertices, 3), x.dtype)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    l2 = jnp.sum(vn * vn, axis=-1, keepdims=True)
    return jnp.where(l2 < 1e-24, 0.0, vn / jnp.sqrt(jnp.maximum(l2, 1e-30)))

"""High-resolution visualization-mesh skinning for tet models.

Equivalent of ``TetModel::attachVisMesh`` / ``updateVisMesh``
(``Simulation/TetModel.h:21-28,74-84``, impl ``TetModel.cpp``): each
vis-mesh vertex is bound at rest to its best tet (minimum barycentric
error — the same metric as ``findRefTetAt``,
``DistanceFieldCollisionDetection.cpp:793-806``) and follows it by
barycentric interpolation of the deformed tet corners.

Binding is host-side numpy (once at build); skinning is one jittable
gather + einsum per frame.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _register(cls):
    data = [f.name for f in dataclasses.fields(cls) if not f.metadata.get("static")]
    meta = [f.name for f in dataclasses.fields(cls) if f.metadata.get("static")]
    return jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=meta)


@_register
@dataclass(frozen=True)
class VisMeshAttachment:
    """Frozen binding of a vis mesh to a tet model."""

    tet_verts: Array   # (V, 4) global particle indices of the bound tet
    bary: Array        # (V, 4) barycentric weights (may extrapolate
    #                     slightly outside, like the reference's bestIndex
    #                     binding of exterior vis vertices)
    faces: Array = field(metadata=dict(static=True))   # (F, 3) numpy

    @staticmethod
    def create(vis_vertices, tet_handle, rest_positions, faces=None
               ) -> "VisMeshAttachment":
        """Bind ``vis_vertices (V, 3)`` to the tets of ``tet_handle``
        using the model's build-time ``rest_positions`` (full scene
        array)."""
        rest = np.asarray(rest_positions, np.float64)
        tets = np.asarray(tet_handle.mesh.tets, np.int64) + tet_handle.offset
        vis = np.asarray(vis_vertices, np.float64)
        a = np.stack([rest[tets[:, 1]] - rest[tets[:, 0]],
                      rest[tets[:, 2]] - rest[tets[:, 0]],
                      rest[tets[:, 3]] - rest[tets[:, 0]]], axis=-1)
        inv_a = np.linalg.inv(a)                     # (T, 3, 3)
        x0 = rest[tets[:, 0]]

        best = np.zeros(len(vis), np.int64)
        best_err = np.full(len(vis), np.inf)
        best_bary = np.zeros((len(vis), 3))
        chunk = 512
        for s in range(0, len(tets), chunk):
            bary = np.einsum("tij,vtj->vti", inv_a[s:s + chunk],
                             vis[:, None, :] - x0[None, s:s + chunk])
            err = (np.maximum(0.0, -bary).sum(-1)
                   + np.maximum(0.0, bary.sum(-1) - 1.0))
            am = err.argmin(1)
            e = err[np.arange(len(vis)), am]
            upd = e < best_err
            best[upd] = s + am[upd]
            best_err[upd] = e[upd]
            best_bary[upd] = bary[np.arange(len(vis)), am][upd]
        b_full = np.concatenate(
            [1.0 - best_bary.sum(-1, keepdims=True), best_bary], axis=-1)
        return VisMeshAttachment(
            tet_verts=jnp.asarray(tets[best], jnp.int32),
            bary=jnp.asarray(b_full, jnp.float32),
            faces=(np.zeros((0, 3), np.int32) if faces is None
                   else np.asarray(faces, np.int32)))

    def skin(self, x: Array) -> Array:
        """Deformed vis-mesh vertex positions from the current particle
        array (``TetModel::updateVisMesh``)."""
        return jnp.einsum("vk,vki->vi", self.bary, x[self.tet_verts])

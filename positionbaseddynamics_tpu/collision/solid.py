"""Solid–solid (particle vs. deformable tet model) collision.

TPU-native equivalent of the reference's solid–solid path:
``DistanceFieldCollisionDetection::collisionDetectionSolidSolid``
(``DistanceFieldCollisionDetection.cpp:361-470``), ``findRefTetAt``
(``:744-814``) and the ``ParticleTetContactConstraint`` kernels
(``PositionBasedDynamics.cpp:1172-1340``).

Architecture differences from the reference (BVH + dynamic contact
vectors):

* the point-in-tet search is a dense masked barycentric test of every
  (point, tet) candidate — one batched ``inv(A)`` + einsum per pair, no
  traversal (XLA tiles it; candidate counts are static);
* ``findRefTetAt`` becomes a **rest-space uniform grid** baked at build
  time: each cell stores the tet containing its center (min barycentric
  error, exactly the reference's error metric), so the runtime lookup is
  one gather instead of a BVH walk;
* the deformable's signed distance field is baked over its *rest-pose
  surface* in world build coordinates, so rest-space queries need no
  initial-transform bookkeeping (``tm2->getInitialR/X`` in the
  reference);
* contacts live in a fixed-capacity masked SoA buffer (one row per
  point-side vertex per pair).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sdf import SDFShape

Array = jax.Array


def _register(cls):
    data = [f.name for f in dataclasses.fields(cls) if not f.metadata.get("static")]
    meta = [f.name for f in dataclasses.fields(cls) if f.metadata.get("static")]
    return jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=meta)


@_register
@dataclass(frozen=True)
class TetCollider:
    """One tet model's solid collision data (the ``TetModel`` +
    ``DistanceFieldCollisionObject`` pairing of the reference).

    Instead of the reference's cubic SDF grid, the rest-pose *surface
    triangles* are stored directly and queried with an exact vectorized
    closest-point test — dense (point, face) work that XLA tiles, with
    exact normals (a baked grid SDF is too inaccurate near the surface
    at practical resolutions and produced unstable contact normals)."""

    offset: int = field(metadata=dict(static=True))   # particle offset
    count: int = field(metadata=dict(static=True))    # particle count
    tets: Array = None          # (T, 4) global particle indices
    rest_x0: Array = None       # (T, 3) rest position of tet vertex 0
    rest_a: Array = None        # (T, 3, 3) rest edge matrix (columns)
    rest_inv_a: Array = None    # (T, 3, 3)
    surf_a: Array = None        # (F, 3) rest surface triangle corners
    surf_b: Array = None        # (F, 3)
    surf_c: Array = None        # (F, 3)
    # rest-space uniform tet-lookup grid (findRefTetAt replacement)
    grid_tet: Array = None      # (gx, gy, gz) int32
    grid_origin: Array = None   # (3,)
    grid_inv_cell: Array = None  # (3,)
    restitution: Array = None
    friction: Array = None
    # Morton tet blocks (Bt, bs): local tet indices, padded by repeating
    # the last tet — the per-step bounding-sphere gate that shrinks the
    # dense (P, T) inside-tet test to (P, k_tet·bs) candidates (the
    # TetMeshBSH pruning of the reference, BoundingSphereHierarchy.h:41,
    # in fixed-depth batched form). None disables gating (exact dense).
    tet_blocks: Array = None
    # Morton surface-face blocks (Bf, bs) + rest-space block spheres for
    # the closest-surface-point query (static: the surface is rest-pose)
    surf_blocks: Array = None
    surf_block_c: Array = None   # (Bf, 3) centers
    surf_block_r: Array = None   # (Bf,) radii (max corner distance)
    k_surf_blocks: int = field(default=8, metadata=dict(static=True))

    @staticmethod
    def create(offset, count, tets_local, rest_positions, surface_faces,
               restitution=0.1, friction=0.2, sdf_resolution=24,
               grid_resolution=24, cache_dir=None) -> "TetCollider":
        """``rest_positions``: the model's build-time (world) rest
        positions (count, 3); ``tets_local``/``surface_faces`` local
        indices. ``sdf_resolution``/``cache_dir`` are accepted for API
        stability but unused (exact surface queries replace the grid)."""
        rest = np.asarray(rest_positions, np.float64)
        tets = np.asarray(tets_local, np.int64).reshape(-1, 4)
        sf = np.asarray(surface_faces, np.int64).reshape(-1, 3)
        a = np.stack([rest[tets[:, 1]] - rest[tets[:, 0]],
                      rest[tets[:, 2]] - rest[tets[:, 0]],
                      rest[tets[:, 3]] - rest[tets[:, 0]]], axis=-1)
        inv_a = np.linalg.inv(a)

        # rest-space tet lookup grid: min-barycentric-error tet per cell
        # center (findRefTetAt's error metric, cpp:793-806)
        lo = rest.min(0) - 0.05 * (rest.max(0) - rest.min(0))
        hi = rest.max(0) + 0.05 * (rest.max(0) - rest.min(0))
        res = np.full(3, int(grid_resolution))
        axes = [np.linspace(lo[i], hi[i], res[i]) for i in range(3)]
        gx, gy, gz = np.meshgrid(*axes, indexing="ij")
        cells = np.stack([gx, gy, gz], -1).reshape(-1, 3)      # (G, 3)
        best = np.zeros(cells.shape[0], np.int32)
        best_err = np.full(cells.shape[0], np.inf)
        chunk = 256
        for s in range(0, len(tets), chunk):
            ia = inv_a[s:s + chunk]                            # (t, 3, 3)
            x0 = rest[tets[s:s + chunk, 0]]                    # (t, 3)
            bary = np.einsum("tij,gtj->gti", ia,
                             cells[:, None, :] - x0[None])     # (G, t, 3)
            err = (np.maximum(0.0, -bary).sum(-1)
                   + np.maximum(0.0, bary.sum(-1) - 1.0))      # (G, t)
            am = err.argmin(1)
            e = err[np.arange(len(cells)), am]
            upd = e < best_err
            best[upd] = (s + am[upd]).astype(np.int32)
            best_err[upd] = e[upd]

        # Morton tet blocks (by rest centroid — deformation preserves
        # locality well enough for the *bounding sphere* gate, which is
        # recomputed from current positions every step and exact)
        from .bvh import morton_order

        bs = 16
        t_cent = rest[tets].mean(axis=1)
        t_order = morton_order(t_cent)
        n_tb = -(-len(tets) // bs)
        t_pad = np.concatenate(
            [t_order, np.repeat(t_order[-1:], n_tb * bs - len(t_order))])
        tet_blocks = t_pad.reshape(n_tb, bs).astype(np.int32)

        # static rest-space surface-face blocks + bounding spheres
        f_cent = (rest[sf[:, 0]] + rest[sf[:, 1]] + rest[sf[:, 2]]) / 3.0
        f_order = morton_order(f_cent)
        n_fb = -(-len(sf) // bs)
        f_pad = np.concatenate(
            [f_order, np.repeat(f_order[-1:], n_fb * bs - len(f_order))])
        surf_blocks = f_pad.reshape(n_fb, bs).astype(np.int32)
        corners = np.stack([rest[sf[f_pad, 0]], rest[sf[f_pad, 1]],
                            rest[sf[f_pad, 2]]], 1).reshape(n_fb, bs * 3, 3)
        sb_c = corners.mean(axis=1)
        sb_r = np.linalg.norm(corners - sb_c[:, None, :], axis=-1).max(1)

        return TetCollider(
            offset=int(offset), count=int(count),
            tets=jnp.asarray(tets + offset, jnp.int32),
            rest_x0=jnp.asarray(rest[tets[:, 0]], jnp.float32),
            rest_a=jnp.asarray(a, jnp.float32),
            rest_inv_a=jnp.asarray(inv_a, jnp.float32),
            surf_a=jnp.asarray(rest[sf[:, 0]], jnp.float32),
            surf_b=jnp.asarray(rest[sf[:, 1]], jnp.float32),
            surf_c=jnp.asarray(rest[sf[:, 2]], jnp.float32),
            tet_blocks=jnp.asarray(tet_blocks),
            surf_blocks=jnp.asarray(surf_blocks),
            surf_block_c=jnp.asarray(sb_c, jnp.float32),
            surf_block_r=jnp.asarray(sb_r, jnp.float32),
            grid_tet=jnp.asarray(best.reshape(tuple(res))),
            grid_origin=jnp.asarray(lo, jnp.float32),
            grid_inv_cell=jnp.asarray((res - 1) / np.maximum(hi - lo, 1e-12),
                                      jnp.float32),
            restitution=jnp.float32(restitution),
            friction=jnp.float32(friction),
        )

    def closest_surface_point_gated(self, pts: Array, need=None,
                                    refine_capacity=None):
        """EXACT closest rest-surface point through the static
        face-block gate, two phases:

        1. per point, the ``k_surf_blocks`` blocks with the smallest
           lower bound ``|p − c_b| − r_b`` supply candidate faces —
           yielding an estimate ``d₁``;
        2. every remaining (point, block) pair whose lower bound still
           undercuts ``d₁`` (i.e. could hold a closer face) is
           compacted to a fixed capacity and evaluated too.

        The result equals the dense (P, F) scan except for refinement
        pairs dropped by capacity — counted in the returned
        ``dropped`` scalar (loud). ``need`` masks which points
        participate in refinement (non-contacting points carry garbage
        rest positions)."""
        p = pts.shape[0]
        if (self.surf_blocks is None
                or self.surf_blocks.shape[0] <= self.k_surf_blocks
                or pts.shape[0] * self.surf_a.shape[0]
                < _SURF_GATE_MIN_PAIRS):
            return self.closest_surface_point(pts), jnp.zeros(())
        sb_c, sb_r = self.surf_block_c, self.surf_block_r
        bf = sb_c.shape[0]
        d_b = jnp.sqrt(jnp.maximum(sum(
            (pts[:, None, i] - sb_c[None, :, i]) ** 2 for i in range(3)),
            1e-30))                                     # (P, Bf)
        lb = d_b - sb_r[None, :]
        k = self.k_surf_blocks
        _, topi = jax.lax.top_k(-lb, k)                 # (P, k)
        cand = self.surf_blocks[topi].reshape(p, -1)
        cp, d2min = _closest_on_faces_pairs(
            pts, self.surf_a[cand], self.surf_b[cand], self.surf_c[cand])
        d1 = jnp.sqrt(jnp.maximum(d2min, 0.0))

        chosen = jnp.zeros((p, bf), bool).at[
            jnp.arange(p)[:, None], topi].set(True)
        rest = (lb < d1[:, None]) & ~chosen
        if need is not None:
            rest = rest & need[:, None]
        from .batched import _compact
        cap = int(refine_capacity if refine_capacity is not None
                  else min(p * bf, max(1024, p)))
        sel, act, dropped = _compact(rest.reshape(-1), cap, p * bf)
        p_id = sel // bf
        b_id = sel % bf
        cand2 = self.surf_blocks[b_id]                  # (C, bs)
        cp2, d22 = _closest_on_faces_pairs(
            pts[p_id], self.surf_a[cand2], self.surf_b[cand2],
            self.surf_c[cand2])
        d22 = jnp.where(act, d22, jnp.inf)
        d2_best = d2min.at[p_id].min(d22)
        winners = d22 <= d2_best[p_id]
        cp = cp.at[jnp.where(winners, p_id, p)].set(cp2, mode="drop")
        return cp, dropped

    def closest_surface_point(self, pts: Array) -> Array:
        """Exact closest point on the rest surface for ``pts (P, 3)`` —
        the role of ``co2->collisionTest`` in
        ``collisionDetectionSolidSolid`` (``cpp:430-433``), computed as a
        dense masked (P, F) point–triangle test (Ericson §5.1.5 region
        classification, fully vectorized)."""
        a, b, c = self.surf_a, self.surf_b, self.surf_c        # (F, 3)
        # all algebra as (P, F) component planes (trailing-3 einsums on
        # (P, F, 3) operands run far off peak on TPU)
        abv = [b[:, i] - a[:, i] for i in range(3)]            # (F,)
        acv = [c[:, i] - a[:, i] for i in range(3)]

        def _dot(ev, corner):
            return sum(ev[i][None] * (pts[:, None, i]
                                      - corner[None, :, i])
                       for i in range(3))

        d1 = _dot(abv, a)
        d2 = _dot(acv, a)
        d3 = _dot(abv, b)
        d4 = _dot(acv, b)
        d5 = _dot(abv, c)
        d6 = _dot(acv, c)

        va = d3 * d6 - d5 * d4
        vb = d5 * d2 - d1 * d6
        vc = d1 * d4 - d3 * d2
        denom = jnp.maximum(va + vb + vc, 1e-30)
        v = vb / denom
        w = vc / denom

        t_ab = jnp.clip(d1 / jnp.where(d1 != d3, d1 - d3, 1e-30), 0.0, 1.0)
        t_ac = jnp.clip(d2 / jnp.where(d2 != d6, d2 - d6, 1e-30), 0.0, 1.0)
        dbc = d4 - d3
        t_bc = jnp.clip(dbc / jnp.maximum(dbc + (d5 - d6), 1e-30), 0.0, 1.0)

        reg_a = (d1 <= 0) & (d2 <= 0)
        reg_b = (d3 >= 0) & (d4 <= d3)
        reg_c = (d6 >= 0) & (d5 <= d6)
        reg_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
        reg_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
        reg_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

        cand = []
        for i in range(3):
            ai, bi, ci = a[None, :, i], b[None, :, i], c[None, :, i]
            ci_p = ai + v * abv[i][None] + w * acv[i][None]
            ci_p = jnp.where(reg_bc, bi + t_bc * (ci - bi), ci_p)
            ci_p = jnp.where(reg_ac, ai + t_ac * acv[i][None], ci_p)
            ci_p = jnp.where(reg_ab, ai + t_ab * abv[i][None], ci_p)
            ci_p = jnp.where(reg_c, ci, ci_p)
            ci_p = jnp.where(reg_b, bi, ci_p)
            ci_p = jnp.where(reg_a, ai, ci_p)
            cand.append(ci_p)                                  # (P, F)

        d2all = sum((pts[:, None, i] - cand[i]) ** 2 for i in range(3))
        best = jnp.argmin(d2all, axis=1)
        return jnp.stack(
            [jnp.take_along_axis(ci, best[:, None], 1)[:, 0]
             for ci in cand], axis=-1)

    def lookup_tet(self, pts: Array) -> Array:
        """Rest-space point → containing tet index (grid gather)."""
        u = (pts - self.grid_origin) * self.grid_inv_cell
        shape = jnp.asarray(self.grid_tet.shape, jnp.float32)
        u = jnp.clip(u, 0.0, shape - 1.0)
        i = jnp.round(u).astype(jnp.int32)
        return self.grid_tet[i[..., 0], i[..., 1], i[..., 2]]


def _closest_on_faces_pairs(pts: Array, a: Array, b: Array, c: Array):
    """Closest point on per-point candidate triangles: ``pts (P, 3)``,
    corners ``(P, K, 3)`` → ``(cp (P, 3), d2min (P,))`` (Ericson
    §5.1.5 region classification, pairwise-vectorized)."""
    ap = pts[:, None, :] - a
    bp = pts[:, None, :] - b
    cp_ = pts[:, None, :] - c
    ab = b - a
    ac = c - a
    d1 = jnp.einsum("pkj,pkj->pk", ab, ap)
    d2 = jnp.einsum("pkj,pkj->pk", ac, ap)
    d3 = jnp.einsum("pkj,pkj->pk", ab, bp)
    d4 = jnp.einsum("pkj,pkj->pk", ac, bp)
    d5 = jnp.einsum("pkj,pkj->pk", ab, cp_)
    d6 = jnp.einsum("pkj,pkj->pk", ac, cp_)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = jnp.maximum(va + vb + vc, 1e-30)
    v = vb / denom
    w = vc / denom
    closest = a + v[..., None] * ab + w[..., None] * ac
    reg_a = (d1 <= 0) & (d2 <= 0)
    reg_b = (d3 >= 0) & (d4 <= d3)
    reg_c = (d6 >= 0) & (d5 <= d6)
    t_ab = jnp.clip(d1 / jnp.where(d1 != d3, d1 - d3, 1e-30), 0.0, 1.0)
    reg_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    t_ac = jnp.clip(d2 / jnp.where(d2 != d6, d2 - d6, 1e-30), 0.0, 1.0)
    reg_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    dbc = d4 - d3
    t_bc = jnp.clip(dbc / jnp.maximum(dbc + (d5 - d6), 1e-30), 0.0, 1.0)
    reg_bc = (va <= 0) & (dbc >= 0) & (d5 - d6 >= 0)
    closest = jnp.where(reg_bc[..., None], b + t_bc[..., None] * (c - b),
                        closest)
    closest = jnp.where(reg_ac[..., None], a + t_ac[..., None] * ac,
                        closest)
    closest = jnp.where(reg_ab[..., None], a + t_ab[..., None] * ab,
                        closest)
    closest = jnp.where(reg_c[..., None], c, closest)
    closest = jnp.where(reg_b[..., None], b, closest)
    closest = jnp.where(reg_a[..., None], a, closest)
    diff = pts[:, None, :] - closest
    d2all = jnp.einsum("pkj,pkj->pk", diff, diff)
    best = jnp.argmin(d2all, axis=1)
    cp = jnp.take_along_axis(closest, best[:, None, None], 1)[:, 0]
    return cp, jnp.take_along_axis(d2all, best[:, None], 1)[:, 0]


@_register
@dataclass(frozen=True)
class SolidContacts:
    """Fixed-capacity masked particle–tet contact buffer — SoA form of
    the 3×3 ``constraintInfo`` of ``init_ParticleTetContactConstraint``
    (``PositionBasedDynamics.cpp:1172-1217``)."""

    particle: Array    # (K,) point-side particle index
    tet_verts: Array   # (K, 4) tet-side particle indices (ref tet)
    bary: Array        # (K, 4) full barycentric weights of the contact
    # bary-weighted tet contact point at DETECTION time — the reference
    # freezes the tet-side positions (``ParticleTetContactConstraint``
    # ``m_x``, ``Constraints.cpp:550`` capture) so the position solve's
    # C = n·(x₀ − cp1) uses detection-time cp1 throughout the step
    cp1_frozen: Array = None  # (K, 3)
    normal: Array = None      # (K, 3)
    tangent: Array = None     # (K, 3)
    nkn_inv: Array = None     # (K,)
    p_max: Array = None       # (K,)
    friction: Array = None    # (K,)
    mask: Array = None        # (K,)
    # per-particle active-contact counts (N,) — the Jacobi averaging
    # denominator, constant across the step's solve passes so computed
    # once at detection time
    inv_cnt: Array = None
    # number of active contacts dropped by capacity compaction (loud
    # overflow counter — scalar, 0 when the capacity sufficed)
    overflow: Array = None


def _gated_containing_tet(tc: TetCollider, x, px, xt0, inv_a,
                          capacity=None):
    """Containing-tet search through the per-step tet-block sphere gate:
    all (point, block) candidates whose CURRENT block bounding sphere
    contains the point are compacted to a fixed capacity, and only
    those blocks' tets get the barycentric inside test — O(P·Bt + C·bs)
    instead of the dense O(P·T). The sphere test is exact (a point
    inside a tet lies inside that block's vertex bounding sphere), so
    the only approximation is the loud capacity drop. Returns
    ``(tet_idx (P,), has (P,), dropped)``."""
    from .batched import _compact

    bs = tc.tet_blocks.shape[1]
    bt = tc.tet_blocks.shape[0]
    p = px.shape[0]
    bverts = x[tc.tets[tc.tet_blocks]]          # (Bt, bs, 4, 3)
    bc3 = bverts.mean(axis=(1, 2))
    br2 = jnp.max(jnp.sum((bverts - bc3[:, None, None, :]) ** 2, -1),
                  axis=(1, 2))
    d2 = sum((px[:, None, c] - bc3[None, :, c]) ** 2
             for c in range(3))                 # (P, Bt)
    ok = d2 < br2[None, :]
    cap = int(capacity if capacity is not None
              else min(p * bt, max(2048, p)))
    sel, act, dropped = _compact(ok.reshape(-1), cap, p * bt)
    p_id = sel // bt
    b_id = sel % bt
    cand = tc.tet_blocks[b_id]                  # (C, bs) local tet ids
    xt0c = xt0[cand]
    inv_c = inv_a[cand]
    rel = px[p_id][:, None, :] - xt0c
    b3 = jnp.einsum("cbij,cbj->cbi", inv_c, rel)
    inside = ((b3 >= 0.0).all(-1) & (b3.sum(-1) <= 1.0)
              & act[:, None])                   # (C, bs)
    # min containing tet id — the dense path's argmax(inside) tie-break
    # (first containing tet), so gated == dense bit-for-bit
    big = jnp.int32(2 ** 30)
    row_best = jnp.min(jnp.where(inside, cand, big), axis=1)
    tet_sel = jnp.full((p,), big, jnp.int32).at[p_id].min(row_best)
    has = tet_sel < big
    return jnp.where(has, tet_sel, 0), has, dropped


# dense (P, T) / (P, F) planes beat the block-gated path on TPU until
# the candidate product is large (measured: gating made the 1180×3717
# armadillo pair 3.6× SLOWER — small dynamic gathers cost more than the
# dense planes they saved); gate only where dense compute truly explodes
_GATE_MIN_PAIRS = 32_000_000
_SURF_GATE_MIN_PAIRS = 16_000_000
# below _GATE_MIN_PAIRS the (point, tet-block) candidate gathers lose to
# dense planes, but a POINT-level pre-compaction still pays: points not
# inside any current per-tet bounding sphere cannot be inside any tet
# (exact), and at armadillo scale they are the vast majority, so the
# barycentric planes + argmax/take shrink to (~256, T).  Only worth it
# when P is big enough for the compaction to amortize.
_PRE_GATE_MIN_PTS = 512
# sphere-gate formulation: VPU component planes vs MXU cross-term
# matmul.  Counter-intuitive but measured (same-session A/B at the
# contact-MPC shape): standalone the matmul gate is 10× faster (2.7 vs
# 26 ms), but inside the full detect the planes FUSE into the
# consumers while the matmul materializes its (P, T) output, and the
# planes win 8.8 vs 11.2 ms.  Kept as a trace-time switch.
_PRE_GATE_MXU = False


def detect_solid_contacts(pairs, x: Array, v: Array, inv_mass: Array,
                          capacity: int = 1024) -> Optional[SolidContacts]:
    """Narrow phase for all (point-group, tet-collider) pairs.

    Per point of the group: inside-tet test against the target in the
    *current* configuration (tet-block sphere gate + compacted
    candidates for large targets, dense for small ones), rest-space
    projection to the surface (face-block gated closest point),
    ref-tet lookup, contact-info init — the
    ``collisionDetectionSolidSolid`` pipeline."""
    from ..ops.mathutils import inv3

    if not pairs:
        return None
    # hoist per-TARGET current-pose data: a collider appearing as the
    # target of several pairs pays its (scalar-form) 3×3 inverses once
    tgt_cache = {}
    sph_cache = {}

    def _target(tc):
        key = id(tc)
        if key not in tgt_cache:
            xt0 = x[tc.tets[:, 0]]                        # (T, 3)
            a = jnp.stack([x[tc.tets[:, 1]] - xt0,
                           x[tc.tets[:, 2]] - xt0,
                           x[tc.tets[:, 3]] - xt0], axis=-1)
            tgt_cache[key] = (xt0, inv3(a))
        return tgt_cache[key]

    def _tet_spheres(tc):
        """Current-pose PER-TET bounding spheres (T, 3), (T,) — shared
        by every pair targeting this collider.  Per-tet spheres (not
        16-tet Morton blocks) because tightness is what matters for the
        point pre-gate: on the settled armadillo pile the 16-tet block
        spheres admit 759/1180 points where per-tet spheres admit 4."""
        key = id(tc)
        if key not in sph_cache:
            verts = x[tc.tets]                        # (T, 4, 3)
            c3 = verts.mean(axis=1)
            r2 = jnp.max(jnp.sum((verts - c3[:, None, :]) ** 2, -1),
                         axis=1)
            sph_cache[key] = (c3, r2)
        return sph_cache[key]

    rows = []
    gate_overflow = jnp.zeros((), jnp.float32)
    for (off, cnt, fric_pg), tc in pairs:
        px = x[off:off + cnt]
        pw = inv_mass[off:off + cnt]
        pvel = v[off:off + cnt]
        idx = jnp.arange(off, off + cnt, dtype=jnp.int32)

        xt0, inv_a = _target(tc)
        pre_act = None
        if (cnt >= _PRE_GATE_MIN_PTS
                and cnt * tc.tets.shape[0] <= _GATE_MIN_PAIRS):
            # point-level pre-compaction through the per-tet sphere
            # gate: exact (a point inside a tet lies inside the sphere
            # centered at its centroid with radius max |vᵢ − c|), so
            # only capacity drops (counted) can change the result.  The
            # (P, T) sphere plane costs ~1/3 of the barycentric inside
            # planes and kills the (P, T) argmax/take that follow —
            # they now run on the compacted ~cap_pre rows.
            tc3, tr2 = _tet_spheres(tc)
            if _PRE_GATE_MXU:
                # |p−c|² < r² as p·p − 2 p·c < r² − c·c: the (P, T)
                # cross term is a K=3 matmul — MXU.  Coordinates are
                # centered on the point group and the matmul runs at
                # HIGHEST precision (3-pass bf16 ≈ f32); the +1e-5
                # absolute slack (coordinates O(1) after centering)
                # keeps the gate conservative under rounding — false
                # positives are just extra candidates.
                mid = jnp.mean(px, axis=0)
                pc = px - mid[None, :]
                cc = tc3 - mid[None, :]
                cross = jax.lax.dot_general(
                    pc, cc, (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST)  # (P, T)
                p2 = jnp.sum(pc * pc, -1)
                rhs = tr2 - jnp.sum(cc * cc, -1) + 1e-5   # (T,)
                ok_p = ((p2[:, None] - 2.0 * cross)
                        < rhs[None, :]).any(-1)           # (P,)
            else:
                d2 = sum((px[:, None, c] - tc3[None, :, c]) ** 2
                         for c in range(3))               # (P, T)
                ok_p = (d2 < tr2[None, :]).any(-1)        # (P,)
            from .batched import _compact
            cap_pre = int(min(cnt, max(256, cnt // 4)))
            sel0, act0, drop0 = _compact(ok_p, cap_pre, cnt)
            gate_overflow = gate_overflow + drop0
            px = px[sel0]
            pw = pw[sel0]
            pvel = pvel[sel0]
            idx = idx[sel0]
            pre_act = act0
            cnt = cap_pre
        if (tc.tet_blocks is not None
                and cnt * tc.tets.shape[0] > _GATE_MIN_PAIRS):
            # block-gated candidate search (O(P·Bt) gate + compacted
            # barycentric) — the dense (P, T) test at armadillo scale
            # was the contact-MPC hot spot
            tet_idx, has, dropped = _gated_containing_tet(
                tc, x, px, xt0, inv_a)
            gate_overflow = gate_overflow + dropped
            relp = px - xt0[tet_idx]
            bary = jnp.einsum("pij,pj->pi", inv_a[tet_idx], relp)
        else:
            # barycentric of every point in every tet, as (P, T)
            # component planes (trailing-3 einsums on (P, T, 3)
            # operands run far off peak on TPU — the r03 lesson)
            rel = [px[:, None, c] - xt0[None, :, c] for c in range(3)]
            b3 = [sum(inv_a[None, :, i, c] * rel[c] for c in range(3))
                  for i in range(3)]                      # 3 × (P, T)
            inside = ((b3[0] >= 0.0) & (b3[1] >= 0.0) & (b3[2] >= 0.0)
                      & (b3[0] + b3[1] + b3[2] <= 1.0))   # (P, T)
            has = inside.any(-1)
            if pre_act is not None:
                has = has & pre_act   # compaction dummies carry row-0 data
            tet_idx = jnp.argmax(inside, axis=-1)         # (P,)
            bary = jnp.stack(
                [jnp.take_along_axis(b, tet_idx[:, None], axis=1)[:, 0]
                 for b in b3], axis=-1)                   # (P, 3)

        # EARLY COMPACTION: only the (few) inside points proceed —
        # the closest-surface-point scan, ref-tet lookup and contact
        # init then run on ``cap_pts`` rows instead of all P (the
        # (P, F) surface pass was half of detect_solids at armadillo
        # scale); dropped inside-points count loudly
        cap_pts = int(min(cnt, max(192, capacity // max(len(pairs), 1))))
        from .batched import _compact
        sel, act, dropped_pts = _compact(has, cap_pts, cnt)
        gate_overflow = gate_overflow + dropped_pts
        px = px[sel]
        pw = pw[sel]
        pvel = pvel[sel]
        idx = idx[sel]
        tet_idx = tet_idx[sel]
        bary = bary[sel]
        has = has[sel] & act
        cnt = cap_pts

        # rest-space position of the point (cpp:409-420), projected to
        # the exact rest surface (face-block gated; uncertain closest
        # points — possible non-optimal block choice — count loudly)
        rx = (tc.rest_x0[tet_idx]
              + jnp.einsum("pij,pj->pi", tc.rest_a[tet_idx], bary))
        cp0, cp_dropped = tc.closest_surface_point_gated(rx, need=has)
        gate_overflow = gate_overflow + cp_dropped

        # ref tet containing the surface point + its barycentric coords
        ref_tet = tc.lookup_tet(cp0)
        cp_bary = jnp.einsum("pij,pj->pi", tc.rest_inv_a[ref_tet],
                             cp0 - tc.rest_x0[ref_tet])
        ref_verts = tc.tets[ref_tet]                      # (P, 4)
        xr = x[ref_verts]                                 # (P, 4, 3)
        b_full = jnp.concatenate(
            [1.0 - cp_bary.sum(-1, keepdims=True), cp_bary], axis=-1)
        cp_w = jnp.einsum("pk,pki->pi", b_full, xr)

        d_w = cp_w - px
        dist_w = jnp.linalg.norm(d_w, axis=-1)
        n_w = d_w / jnp.maximum(dist_w, 1e-12)[:, None]
        mask = has & (dist_w > 1e-6)

        # contact info (init_ParticleTetContactConstraint)
        wr = inv_mass[ref_verts]                          # (P, 4)
        v1 = jnp.einsum("pk,pki->pi", b_full, v[ref_verts])
        u_rel = pvel - v1
        u_rel_n = jnp.sum(n_w * u_rel, -1)
        t = u_rel - u_rel_n[:, None] * n_w
        tl2 = jnp.sum(t * t, -1)
        t = jnp.where(tl2[:, None] > 1e-6,
                      t / jnp.sqrt(jnp.maximum(tl2, 1e-30))[:, None], t)
        jmj = pw + jnp.sum(b_full * b_full * wr, -1)
        nkn_inv = jnp.where(jmj > 1e-12,
                            1.0 / jnp.maximum(jmj, 1e-30), 0.0)
        p_max = nkn_inv * jnp.sum(u_rel * t, -1)
        rows.append(SolidContacts(
            particle=idx, tet_verts=ref_verts, bary=b_full,
            cp1_frozen=cp_w,
            normal=n_w, tangent=t, nkn_inv=nkn_inv, p_max=p_max,
            friction=jnp.broadcast_to(fric_pg + tc.friction, (cnt,)),
            mask=(mask & (jmj > 1e-12)).astype(jnp.float32)))
    c = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *rows)
    # Compact the per-candidate buffer (one row per point-side vertex
    # per pair) down to ``capacity`` rows, active contacts first:
    # the solve passes run 5+ times per step on this buffer, and the
    # scatter cost scales with rows, while actual contacts are sparse.
    # Deterministic stable order; dropped actives are counted loudly.
    k = c.mask.shape[0]
    n_active = jnp.sum(c.mask)
    if capacity is not None and capacity < k:
        from .batched import _compact
        sel, act, _ = _compact(c.mask > 0.5, capacity, k)
        c = jax.tree.map(lambda a: a[sel], c)
        # dummy slots replicate an arbitrary row — zero their mask
        c = dataclasses.replace(
            c, mask=c.mask * act.astype(jnp.float32))
        overflow = jnp.maximum(n_active - capacity, 0.0)
    else:
        overflow = jnp.zeros(())
    overflow = overflow + gate_overflow
    ones = jnp.broadcast_to(
        c.mask[:, None, None],
        c.tet_verts.shape[:1] + (5, 1))
    idx5 = jnp.concatenate([c.particle[:, None], c.tet_verts], axis=1)
    from ..solver.constraints import scatter_add
    cnt = scatter_add(x.shape[0], idx5, ones)[:, 0]
    return dataclasses.replace(
        c, inv_cnt=1.0 / jnp.maximum(cnt, 1.0), overflow=overflow)


def solve_solid_contacts_position(c: SolidContacts, x: Array,
                                  inv_mass: Array):
    """One batched pass of ``solve_ParticleTetContactConstraint``
    (``PositionBasedDynamics.cpp:1219-1272``): C = n·(x₀ − cp1) with the
    DETECTION-TIME cp1 (the reference's frozen ``m_x`` capture).
    Returns ``(corrections (N, 3), λ (K,))`` — λ feeds the friction
    pass exactly as the reference's persisted ``m_lambda``. Jacobi
    application of the reference's sequential per-contact sweep
    (``TimeStepController.cpp:288-291``)."""
    from ..solver.constraints import scatter_add

    cval = jnp.sum(c.normal * (x[c.particle] - c.cp1_frozen), -1)
    lam = -c.nkn_inv * cval * c.mask
    p = lam[:, None] * c.normal
    w0 = inv_mass[c.particle]
    wr = inv_mass[c.tet_verts]
    corr = jnp.concatenate([
        (w0[:, None] * p)[:, None, :],
        -(wr * c.bary)[..., None] * p[:, None, :],
    ], axis=1)                                            # (K, 5, 3)
    idx = jnp.concatenate([c.particle[:, None], c.tet_verts], axis=1)
    # averaged by the number of ACTIVE contacts touching each particle
    # (precomputed at detection) — the Jacobi stabilization for the
    # reference's sequential sweep
    return scatter_add(x.shape[0], idx, corr) * c.inv_cnt[:, None], lam


def solve_solid_contacts_velocity(c: SolidContacts, x: Array, v: Array,
                                  inv_mass: Array, lam=None) -> Array:
    """Friction pass (``velocitySolve_ParticleTetContactConstraint``,
    ``PositionBasedDynamics.cpp:1274-1340``); ``lam`` is the LAST
    position-solve λ (the reference's persisted ``m_lambda``) — when
    None it is recomputed from the final positions against the frozen
    cp1. Returns velocity corrections (N, 3)."""
    from ..solver.constraints import scatter_add

    if lam is None:
        cval = jnp.sum(c.normal * (x[c.particle] - c.cp1_frozen), -1)
        lam = -c.nkn_inv * cval
    fl = c.friction * lam
    pv = jnp.where(fl > c.p_max, -c.p_max,
                   jnp.where(fl < -c.p_max, c.p_max, -fl)
                   )[:, None] * c.tangent * c.mask[:, None]
    w0 = inv_mass[c.particle]
    wr = inv_mass[c.tet_verts]
    corr = jnp.concatenate([
        (w0[:, None] * pv)[:, None, :],
        -(wr * c.bary)[..., None] * pv[:, None, :],
    ], axis=1)
    idx = jnp.concatenate([c.particle[:, None], c.tet_verts], axis=1)
    return scatter_add(v.shape[0], idx, corr) * c.inv_cnt[:, None]

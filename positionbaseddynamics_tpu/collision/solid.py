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

        return TetCollider(
            offset=int(offset), count=int(count),
            tets=jnp.asarray(tets + offset, jnp.int32),
            rest_x0=jnp.asarray(rest[tets[:, 0]], jnp.float32),
            rest_a=jnp.asarray(a, jnp.float32),
            rest_inv_a=jnp.asarray(inv_a, jnp.float32),
            surf_a=jnp.asarray(rest[sf[:, 0]], jnp.float32),
            surf_b=jnp.asarray(rest[sf[:, 1]], jnp.float32),
            surf_c=jnp.asarray(rest[sf[:, 2]], jnp.float32),
            grid_tet=jnp.asarray(best.reshape(tuple(res))),
            grid_origin=jnp.asarray(lo, jnp.float32),
            grid_inv_cell=jnp.asarray((res - 1) / np.maximum(hi - lo, 1e-12),
                                      jnp.float32),
            restitution=jnp.float32(restitution),
            friction=jnp.float32(friction),
        )

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


@_register
@dataclass(frozen=True)
class SolidContacts:
    """Fixed-capacity masked particle–tet contact buffer — SoA form of
    the 3×3 ``constraintInfo`` of ``init_ParticleTetContactConstraint``
    (``PositionBasedDynamics.cpp:1172-1217``)."""

    particle: Array    # (K,) point-side particle index
    tet_verts: Array   # (K, 4) tet-side particle indices (ref tet)
    bary: Array        # (K, 4) full barycentric weights of the contact
    normal: Array      # (K, 3)
    tangent: Array     # (K, 3)
    nkn_inv: Array     # (K,)
    p_max: Array       # (K,)
    friction: Array    # (K,)
    mask: Array        # (K,)
    # per-particle active-contact counts (N,) — the Jacobi averaging
    # denominator, constant across the step's solve passes so computed
    # once at detection time
    inv_cnt: Array = None
    # number of active contacts dropped by capacity compaction (loud
    # overflow counter — scalar, 0 when the capacity sufficed)
    overflow: Array = None


def detect_solid_contacts(pairs, x: Array, v: Array, inv_mass: Array,
                          capacity: int = 1024) -> Optional[SolidContacts]:
    """Narrow phase for all (point-group, tet-collider) pairs.

    Per point of the group: dense inside-tet test against every tet of
    the target in the *current* configuration, rest-space SDF projection
    to the surface, ref-tet lookup, contact-info init — the
    ``collisionDetectionSolidSolid`` pipeline."""
    from ..ops.mathutils import inv3

    if not pairs:
        return None
    # hoist per-TARGET current-pose data: a collider appearing as the
    # target of several pairs pays its (scalar-form) 3×3 inverses once
    tgt_cache = {}

    def _target(tc):
        key = id(tc)
        if key not in tgt_cache:
            xt0 = x[tc.tets[:, 0]]                        # (T, 3)
            a = jnp.stack([x[tc.tets[:, 1]] - xt0,
                           x[tc.tets[:, 2]] - xt0,
                           x[tc.tets[:, 3]] - xt0], axis=-1)
            tgt_cache[key] = (xt0, inv3(a))
        return tgt_cache[key]

    rows = []
    for (off, cnt, fric_pg), tc in pairs:
        px = x[off:off + cnt]
        pw = inv_mass[off:off + cnt]
        pvel = v[off:off + cnt]
        idx = jnp.arange(off, off + cnt, dtype=jnp.int32)

        xt0, inv_a = _target(tc)
        # barycentric of every point in every tet, as (P, T) component
        # planes (trailing-3 einsums on (P, T, 3) operands run far off
        # peak on TPU — the r03 scalar-form lesson)
        rel = [px[:, None, c] - xt0[None, :, c] for c in range(3)]
        b3 = [sum(inv_a[None, :, i, c] * rel[c] for c in range(3))
              for i in range(3)]                          # 3 × (P, T)
        inside = ((b3[0] >= 0.0) & (b3[1] >= 0.0) & (b3[2] >= 0.0)
                  & (b3[0] + b3[1] + b3[2] <= 1.0))       # (P, T)
        has = inside.any(-1)
        tet_idx = jnp.argmax(inside, axis=-1)             # (P,)
        bary = jnp.stack(
            [jnp.take_along_axis(b, tet_idx[:, None], axis=1)[:, 0]
             for b in b3], axis=-1)                       # (P, 3)

        # rest-space position of the point (cpp:409-420), projected to
        # the exact rest surface
        rx = (tc.rest_x0[tet_idx]
              + jnp.einsum("pij,pj->pi", tc.rest_a[tet_idx], bary))
        cp0 = tc.closest_surface_point(rx)

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
        order = jnp.argsort(1.0 - c.mask, stable=True)[:capacity]
        c = jax.tree.map(lambda a: a[order], c)
        overflow = jnp.maximum(n_active - capacity, 0.0)
    else:
        overflow = jnp.zeros(())
    ones = jnp.broadcast_to(
        c.mask[:, None, None],
        c.tet_verts.shape[:1] + (5, 1))
    idx5 = jnp.concatenate([c.particle[:, None], c.tet_verts], axis=1)
    from ..solver.constraints import scatter_add
    cnt = scatter_add(x.shape[0], idx5, ones)[:, 0]
    return dataclasses.replace(
        c, inv_cnt=1.0 / jnp.maximum(cnt, 1.0), overflow=overflow)


def solve_solid_contacts_position(c: SolidContacts, x: Array,
                                  inv_mass: Array) -> Array:
    """One batched pass of ``solve_ParticleTetContactConstraint``
    (``PositionBasedDynamics.cpp:1219-1272``). Returns the summed
    position corrections (N, 3) (Jacobi application of the reference's
    sequential per-contact sweep, ``TimeStepController.cpp:288-291``)."""
    from ..solver.constraints import scatter_add

    cp1 = jnp.einsum("pk,pki->pi", c.bary, x[c.tet_verts])
    cval = jnp.sum(c.normal * (x[c.particle] - cp1), -1)
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
    return scatter_add(x.shape[0], idx, corr) * c.inv_cnt[:, None]


def solve_solid_contacts_velocity(c: SolidContacts, x: Array, v: Array,
                                  inv_mass: Array) -> Array:
    """Friction pass (``velocitySolve_ParticleTetContactConstraint``,
    ``PositionBasedDynamics.cpp:1274-1340``); λ is recomputed from the
    final positions (the reference reuses the last position-solve λ of
    the same state). Returns velocity corrections (N, 3)."""
    from ..solver.constraints import scatter_add

    cp1 = jnp.einsum("pk,pki->pi", c.bary, x[c.tet_verts])
    cval = jnp.sum(c.normal * (x[c.particle] - cp1), -1)
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

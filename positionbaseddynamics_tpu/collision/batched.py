"""Batched broad + narrow collision phase — scalable in body count.

The reference handles arbitrary collider counts by walking per-pair BVHs
inside an OpenMP loop (``Simulation/DistanceFieldCollisionDetection.cpp:
26-199``, pair dispatch ``:100-175``).  The first TPU port of that idea
(``detection.py:detect_rigid``) unrolled the ordered collider pairs in
Python with per-pair ``lax.cond`` gates — correct, but trace/compile time
grows O(M²) in the collider count, capping scenes near ~20 bodies.

This module removes that ceiling with a *data-parallel* pipeline whose
compile cost is O(#shape-kinds), independent of M:

1. **Broad phase**: ALL candidate pairs of a shape-kind group are tested
   at once with the bounding-sphere distance predicate (the reference's
   AABB/BVH reject, ``CollisionDetection.h:32-44``) — one ``(P,)``
   vector compare.
2. **Compaction**: the active pairs are compacted (stable argsort on the
   active mask) into a FIXED-CAPACITY active-pair list; active pairs
   beyond capacity are *counted loudly* in an overflow scalar (the same
   contract as ``FluidState.overflow``).
3. **Narrow phase**: ONE batched kernel per shape kind evaluates every
   (active pair, vertex) candidate — per-pair shape parameters are
   gathered from a stacked ``SDFShape`` pytree and the distance/normal
   evaluation is ``vmap``-ed over the pair axis.  No ``lax.cond``, no
   Python pair loop.

Contact semantics (tolerance test, contact-point construction,
restitution = product / friction = sum) are identical to
``detection.py`` and the reference (``DistanceFieldCollisionDetection
.cpp:118-136, 684-728``); only the *scheduling* differs.  In the default
Jacobi contact mode the resulting trajectories match the unrolled path
up to float add order (contact rows are order-independent there);
sequential Gauss-Seidel parity studies should keep ``broad_phase=
"unrolled"``.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quaternion as quat

Array = jax.Array


def _register(cls):
    data = [f.name for f in dataclasses.fields(cls) if not f.metadata.get("static")]
    meta = [f.name for f in dataclasses.fields(cls) if f.metadata.get("static")]
    return jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=meta)


def _group_key(shape):
    """Shapes that can share one batched narrow phase: same static kind
    and (for grid kinds) same grid resolution."""
    gv = shape.grid_values
    return (shape.kind,
            None if gv is None else tuple(gv.shape),
            None if shape.params is None else int(np.asarray(shape.params).size))


def _stack_shapes(shapes):
    """Stack same-kind ``SDFShape`` pytrees along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *shapes)


@_register
@dataclass(frozen=True)
class RigidPairGroup:
    """All ordered (point-side, SDF-side) candidate pairs whose SDF side
    shares one shape kind — one batched narrow phase."""

    n_pairs: int = field(metadata=dict(static=True))
    capacity: int = field(metadata=dict(static=True))
    pair_i: Array = None      # (P,) collider index of the point side
    pair_jj: Array = None     # (P,) within-group index of the SDF side
    pair_bi: Array = None     # (P,) rigid body of the point side
    pair_bj: Array = None     # (P,) rigid body of the SDF side
    reach: Array = None       # (P,) broad-phase radius sum (+tolerance)
    rest: Array = None        # (P,) restitution product
    fric: Array = None        # (P,) friction sum
    shapes: object = None     # stacked SDFShape, leading axis Mg
    frame_rot: Array = None   # (Mg, 3, 3) body->shape frame rotation
    frame_t: Array = None     # (Mg, 3)


@_register
@dataclass(frozen=True)
class BatchedRigidColliders:
    """Stacked point-side data (shared by all groups) + per-kind pair
    groups. Built once at scene-build time (`build_batched_rigid`).

    ``verts`` are Morton-sorted so 16-vertex BLOCKS are spatially
    compact; ``block_c``/``block_r`` are their body-frame bounding
    spheres. The narrow phase then runs in two compaction levels: SDF at
    block centers gates (pair, block) candidates (the reference's
    kd-sphere predicate, ``DistanceFieldCollisionDetection.cpp:226-247``),
    and only surviving blocks' vertices are evaluated."""

    vmax: int = field(metadata=dict(static=True))
    block_size: int = field(default=16, metadata=dict(static=True))
    bmax: int = field(default=0, metadata=dict(static=True))
    verts: Array = None       # (M, Vmax, 3) padded body-frame samples
    vmask: Array = None       # (M, Vmax) 1 for real vertices
    block_c: Array = None     # (M, Bmax, 3) block sphere centers
    block_r: Array = None     # (M, Bmax) block radii (-inf padding)
    groups: Tuple = ()        # tuple of RigidPairGroup (pytree children)


def build_batched_rigid(rigid_colliders, rb_pairs, tolerance,
                        pair_capacity=None):
    """Freeze the collider list + ordered pair list into the batched
    broad-phase structures. All heavy lifting is NumPy at build time."""
    from .bvh import build_block_spheres

    if not rb_pairs:
        return None
    bs = 16
    m = len(rigid_colliders)
    vmax = max(int(rigid_colliders[i].verts.shape[0])
               for (i, _) in rb_pairs)
    vmax = bs * (-(-vmax // bs))          # round up to whole blocks
    bmax = vmax // bs
    verts = np.zeros((m, vmax, 3), np.float32)
    vmask = np.zeros((m, vmax), np.float32)
    block_c = np.zeros((m, bmax, 3), np.float32)
    block_r = np.full((m, bmax), -np.inf, np.float32)
    for ci, co in enumerate(rigid_colliders):
        if co.verts is not None and co.verts.shape[0]:
            vs, centers, radii = build_block_spheres(
                np.asarray(co.verts, np.float32), block_size=bs)
            verts[ci, :len(vs)] = vs
            vmask[ci, :len(vs)] = 1.0
            block_c[ci, :len(centers)] = centers
            block_r[ci, :len(radii)] = radii

    # group pairs by the SDF side's shape-kind key
    by_key = {}
    for (i, j) in rb_pairs:
        by_key.setdefault(_group_key(rigid_colliders[j].shape),
                          []).append((i, j))

    groups = []
    for key, pairs in sorted(by_key.items(), key=lambda kv: repr(kv[0])):
        # distinct SDF-side colliders of this kind, in first-seen order
        js = sorted({j for (_, j) in pairs})
        j_to_jj = {j: k for k, j in enumerate(js)}
        shapes = _stack_shapes([rigid_colliders[j].shape for j in js])
        fr = np.stack([
            np.asarray(rigid_colliders[j].frame_rot, np.float32)
            if rigid_colliders[j].frame_rot is not None
            else np.eye(3, dtype=np.float32) for j in js])
        ft = np.stack([
            np.asarray(rigid_colliders[j].frame_t, np.float32)
            if rigid_colliders[j].frame_t is not None
            else np.zeros(3, np.float32) for j in js])

        p = len(pairs)
        pair_i = np.array([i for (i, _) in pairs], np.int32)
        pair_jj = np.array([j_to_jj[j] for (_, j) in pairs], np.int32)
        pair_bi = np.array([rigid_colliders[i].body for (i, _) in pairs],
                           np.int32)
        pair_bj = np.array([rigid_colliders[j].body for (_, j) in pairs],
                           np.int32)
        reach = np.array(
            [rigid_colliders[i].verts_radius
             + rigid_colliders[j].shape_radius + tolerance
             for (i, j) in pairs], np.float32)
        rest = np.array(
            [float(rigid_colliders[i].restitution)
             * float(rigid_colliders[j].restitution)
             for (i, j) in pairs], np.float32)
        fric = np.array(
            [float(rigid_colliders[i].friction)
             + float(rigid_colliders[j].friction)
             for (i, j) in pairs], np.float32)
        cap = pair_capacity if pair_capacity is not None \
            else max(64, 8 * m)
        groups.append(RigidPairGroup(
            n_pairs=p, capacity=int(min(p, cap)),
            pair_i=jnp.asarray(pair_i), pair_jj=jnp.asarray(pair_jj),
            pair_bi=jnp.asarray(pair_bi), pair_bj=jnp.asarray(pair_bj),
            reach=jnp.asarray(reach), rest=jnp.asarray(rest),
            fric=jnp.asarray(fric), shapes=shapes,
            frame_rot=jnp.asarray(fr), frame_t=jnp.asarray(ft)))
    return BatchedRigidColliders(vmax=vmax, block_size=bs, bmax=bmax,
                                 verts=jnp.asarray(verts),
                                 vmask=jnp.asarray(vmask),
                                 block_c=jnp.asarray(block_c),
                                 block_r=jnp.asarray(block_r),
                                 groups=tuple(groups))


def _compact(active, capacity, n):
    """Stable compaction of the active-pair mask to ``capacity`` slots,
    original order preserved. O(n) cumsum + scatter — an argsort here
    costs a full device sort per detection call and dominated the
    contact pipeline when it sat in the per-step hot path.
    Returns ``(sel, act_sel, n_dropped)``."""
    if capacity >= n:
        return (jnp.arange(n, dtype=jnp.int32), active,
                jnp.zeros((), jnp.float32))
    pos = jnp.cumsum(active) - 1                    # slot per active row
    tgt = jnp.where(active & (pos < capacity), pos, capacity)
    sel = jnp.full((capacity,), n, jnp.int32).at[tgt].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    act = sel < n
    sel = jnp.minimum(sel, n - 1)
    n_active = jnp.sum(active.astype(jnp.float32))
    dropped = jnp.maximum(n_active - capacity, 0.0)
    return sel, act, dropped


def detect_rigid_batched(bc: BatchedRigidColliders, tolerance,
                         rigid, init_rows):
    """Batched rb–rb detection: returns ``(contact rows, overflow)``.
    ``init_rows`` is the shared contact-info initializer
    (``detection.init_rb_contact_rows``)."""
    rx, rq, rv, rom = rigid.x, rigid.q, rigid.v, rigid.omega
    inv_mass = rigid.inv_mass
    _, inv_iw = rigid.inertia_world()
    inv_iw = inv_iw * (inv_mass > 0.0)[..., None, None]

    def _narrow(shapes_sel, fr, ft, bi, bj, verts, vm, act, rest_p,
                fric_p, n_verts):
        """Shared vert-level narrow phase: per-row pair data, vertex
        block (C, n_verts, 3); returns flattened contact rows."""
        c = verts.shape[0]
        ra = quat.to_matrix(rq[bi])             # (C, 3, 3)
        verts_w = (jnp.einsum("cij,cvj->cvi", ra, verts)
                   + rx[bi][:, None, :])
        rb = quat.to_matrix(rq[bj])
        xl = jnp.einsum("cji,cvj->cvi", rb,
                        verts_w - rx[bj][:, None, :])     # Rᵀ(p - x)
        xl = jnp.einsum("cij,cvj->cvi", fr, xl) + ft[:, None, :]
        dist, nl = jax.vmap(
            lambda sh, pts: (sh.distance(pts), sh.normal(pts))
        )(shapes_sel, xl)
        dist = dist - tolerance
        nb = jnp.einsum("cji,cvj->cvi", fr, nl)  # shape -> body frame
        n = jnp.einsum("cij,cvj->cvi", rb, nb)   # body -> world
        mask = ((dist < 0.0) & (jnp.sum(n * n, -1) > 0.5)
                & vm & act[:, None])
        cp0 = verts_w
        cp1 = verts_w - dist[..., None] * n
        k = c * n_verts
        b0 = jnp.broadcast_to(bi[:, None], (c, n_verts)).reshape(k)
        b1 = jnp.broadcast_to(bj[:, None], (c, n_verts)).reshape(k)
        rest = jnp.broadcast_to(rest_p[:, None], (c, n_verts)).reshape(k)
        fric = jnp.broadcast_to(fric_p[:, None], (c, n_verts)).reshape(k)
        return init_rows(
            b0, b1, cp0.reshape(k, 3), cp1.reshape(k, 3),
            n.reshape(k, 3), mask.reshape(k), rest, fric,
            rx, rv, rom, inv_mass, inv_iw)

    rows = []
    overflow = jnp.zeros((), jnp.float32)
    for g in bc.groups:
        d = jnp.linalg.norm(rx[g.pair_bi] - rx[g.pair_bj], axis=-1)
        active = d < g.reach
        sel, act, dropped = _compact(active, g.capacity, g.n_pairs)
        overflow = overflow + dropped

        i_sel = g.pair_i[sel]
        jj = g.pair_jj[sel]
        bi = g.pair_bi[sel]
        bj = g.pair_bj[sel]
        c = sel.shape[0]
        shapes_sel = jax.tree.map(lambda a: a[jj], g.shapes)
        fr = g.frame_rot[jj]
        ft = g.frame_t[jj]

        if bc.bmax <= 2:
            # small point clouds: block gating buys nothing — evaluate
            # every vertex of each compacted pair directly
            rows.append(_narrow(
                shapes_sel, fr, ft, bi, bj, bc.verts[i_sel],
                bc.vmask[i_sel] > 0.5, act, g.rest[sel], g.fric[sel],
                bc.vmax))
            continue

        # compaction level 2 — the reference's kd-sphere predicate
        # "SDF(block center) − tol < block radius" over ALL (pair,
        # block) candidates at once, then only surviving blocks'
        # vertices enter the vert-level narrow phase
        bcs = bc.block_c[i_sel]                  # (C, Bmax, 3)
        brs = bc.block_r[i_sel]                  # (C, Bmax); -inf pad
        ra = quat.to_matrix(rq[bi])
        cw = (jnp.einsum("cij,cbj->cbi", ra, bcs)
              + rx[bi][:, None, :])
        rb = quat.to_matrix(rq[bj])
        cl = jnp.einsum("cji,cbj->cbi", rb, cw - rx[bj][:, None, :])
        cl = jnp.einsum("cij,cbj->cbi", fr, cl) + ft[:, None, :]
        dist_b = jax.vmap(lambda sh, pts: sh.distance(pts))(
            shapes_sel, cl) - tolerance
        hit = (dist_b < brs) & act[:, None]      # (C, Bmax)

        n_cand = c * bc.bmax
        cap2 = int(min(n_cand, max(128, 2 * g.capacity)))
        sel2, act2, dropped2 = _compact(hit.reshape(-1), cap2, n_cand)
        overflow = overflow + dropped2
        pb = sel2 // bc.bmax
        blk = sel2 % bc.bmax
        vidx = (blk[:, None] * bc.block_size
                + jnp.arange(bc.block_size, dtype=jnp.int32)[None, :])
        i2 = i_sel[pb]
        rows.append(_narrow(
            jax.tree.map(lambda a: a[pb], shapes_sel),
            fr[pb], ft[pb], bi[pb], bj[pb],
            bc.verts[i2[:, None], vidx],
            bc.vmask[i2[:, None], vidx] > 0.5, act2,
            g.rest[sel][pb], g.fric[sel][pb], bc.block_size))
    contacts = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *rows)
    return contacts, overflow


# ---------------------------------------------------------------------------
# particle group vs rigid colliders
# ---------------------------------------------------------------------------


@_register
@dataclass(frozen=True)
class ParticlePairGroup:
    """One particle group × all same-kind rigid SDF colliders."""

    offset: int = field(metadata=dict(static=True))
    count: int = field(metadata=dict(static=True))
    n_col: int = field(metadata=dict(static=True))
    capacity: int = field(metadata=dict(static=True))
    bodies: Array = None      # (Mg,) rigid body index per collider
    reach: Array = None       # (Mg,) shape radius + tolerance
    rest: Array = None        # (Mg,) restitution product
    fric: Array = None        # (Mg,) friction sum
    shapes: object = None     # stacked SDFShape
    frame_rot: Array = None   # (Mg, 3, 3)
    frame_t: Array = None     # (Mg, 3)


def build_batched_particles(particle_groups, rigid_colliders, tolerance,
                            col_capacity=None):
    """Per particle group and shape kind: one ParticlePairGroup covering
    all colliders of that kind (the batched form of the
    ``collisionDetectionRBSolid`` dispatch)."""
    if not (particle_groups and rigid_colliders):
        return ()
    out = []
    by_key = {}
    for ci, co in enumerate(rigid_colliders):
        by_key.setdefault(_group_key(co.shape), []).append(ci)
    for pg in particle_groups:
        for key, cols in sorted(by_key.items(), key=lambda kv: repr(kv[0])):
            shapes = _stack_shapes([rigid_colliders[c].shape for c in cols])
            fr = np.stack([
                np.asarray(rigid_colliders[c].frame_rot, np.float32)
                if rigid_colliders[c].frame_rot is not None
                else np.eye(3, dtype=np.float32) for c in cols])
            ft = np.stack([
                np.asarray(rigid_colliders[c].frame_t, np.float32)
                if rigid_colliders[c].frame_t is not None
                else np.zeros(3, np.float32) for c in cols])
            bodies = np.array([rigid_colliders[c].body for c in cols],
                              np.int32)
            reach = np.array(
                [rigid_colliders[c].shape_radius + tolerance
                 for c in cols], np.float32)
            rest = np.array(
                [float(pg.restitution)
                 * float(rigid_colliders[c].restitution) for c in cols],
                np.float32)
            fric = np.array(
                [float(pg.friction)
                 + float(rigid_colliders[c].friction) for c in cols],
                np.float32)
            mg = len(cols)
            cap = col_capacity if col_capacity is not None \
                else max(8, mg // 4)
            out.append(ParticlePairGroup(
                offset=pg.offset, count=pg.count, n_col=mg,
                capacity=int(min(mg, cap)),
                bodies=jnp.asarray(bodies), reach=jnp.asarray(reach),
                rest=jnp.asarray(rest), fric=jnp.asarray(fric),
                shapes=shapes, frame_rot=jnp.asarray(fr),
                frame_t=jnp.asarray(ft)))
    return tuple(out)


def detect_particles_batched(pg_groups, tolerance, px, pv, p_inv_mass,
                             rigid, init_rows):
    """Batched particle–rigid detection over all ParticlePairGroups:
    returns ``(contact rows, overflow)``."""
    rx, rq, rv, rom = rigid.x, rigid.q, rigid.v, rigid.omega
    inv_mass = rigid.inv_mass
    _, inv_iw = rigid.inertia_world()
    inv_iw = inv_iw * (inv_mass > 0.0)[..., None, None]

    rows = []
    overflow = jnp.zeros((), jnp.float32)
    for g in pg_groups:
        x = px[g.offset:g.offset + g.count]
        v = pv[g.offset:g.offset + g.count]
        w = p_inv_mass[g.offset:g.offset + g.count]
        center = jnp.mean(x, axis=0)
        group_r = jnp.sqrt(jnp.max(jnp.sum((x - center) ** 2, -1)))

        d = jnp.linalg.norm(center - rx[g.bodies], axis=-1)
        active = d < group_r + g.reach
        sel, act, dropped = _compact(active, g.capacity, g.n_col)
        overflow = overflow + dropped

        bj = g.bodies[sel]
        c = sel.shape[0]
        rb = quat.to_matrix(rq[bj])                       # (C, 3, 3)
        # local transform: Rᵀ(p - x) per collider, shared particle block
        rel = x[None, :, :] - rx[bj][:, None, :]          # (C, P, 3)
        xl = jnp.einsum("cji,cpj->cpi", rb, rel)
        fr = g.frame_rot[sel]
        ft = g.frame_t[sel]
        xl = jnp.einsum("cij,cpj->cpi", fr, xl) + ft[:, None, :]

        shapes_sel = jax.tree.map(lambda a: a[sel], g.shapes)
        dist, nl = jax.vmap(
            lambda sh, pts: (sh.distance(pts), sh.normal(pts))
        )(shapes_sel, xl)
        dist = dist - tolerance
        nb = jnp.einsum("cji,cpj->cpi", fr, nl)
        n = jnp.einsum("cij,cpj->cpi", rb, nb)

        mask = ((dist < 0.0) & (jnp.sum(n * n, -1) > 0.5)
                & act[:, None]
                & ((w[None, :] > 0.0) | (inv_mass[bj][:, None] > 0.0)))
        cp1 = x[None] - dist[..., None] * n

        k = c * g.count
        idx = jnp.broadcast_to(
            jnp.arange(g.offset, g.offset + g.count,
                       dtype=jnp.int32)[None], (c, g.count)).reshape(k)
        b1 = jnp.broadcast_to(bj[:, None], (c, g.count)).reshape(k)
        rest = jnp.broadcast_to(g.rest[sel][:, None],
                                (c, g.count)).reshape(k)
        fric = jnp.broadcast_to(g.fric[sel][:, None],
                                (c, g.count)).reshape(k)
        xk = jnp.broadcast_to(x[None], (c, g.count, 3)).reshape(k, 3)
        vk = jnp.broadcast_to(v[None], (c, g.count, 3)).reshape(k, 3)
        wk = jnp.broadcast_to(w[None], (c, g.count)).reshape(k)
        rows.append(init_rows(
            idx, b1, xk, cp1.reshape(k, 3), n.reshape(k, 3),
            mask.reshape(k), rest, fric, vk, wk,
            rx, rv, rom, inv_mass, inv_iw))
    if not rows:
        return None, overflow
    contacts = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *rows)
    return contacts, overflow

"""Collision detection pipeline — fixed-capacity, masked, jit-compatible.

TPU-native replacement for the reference's
``DistanceFieldCollisionDetection`` (``Simulation/
DistanceFieldCollisionDetection.cpp:26-199``): instead of BVH traversal
appending to thread-local ``std::vector`` contact lists, every candidate
(point-source, SDF-target) pair is enumerated *statically* at scene-build
time and evaluated as one dense masked kernel per pair — the contact
arrays have a fixed capacity (sum of source vertex counts over pairs) and
a validity mask, so the whole narrow phase lives inside ``jit``.

Contact semantics follow the reference exactly:

* a point ``x`` collides when ``sdf(x) - tolerance < 0``
  (``DistanceFieldCollisionObject::collisionTest``,
  ``DistanceFieldCollisionDetection.cpp:713-728``);
* contact point on the SDF body is ``x - dist·n`` with the normal from the
  (central-difference) SDF gradient (``:684-706``);
* restitution = product, friction = sum of the two bodies' coefficients
  (``DistanceFieldCollisionDetection.cpp:118-119``).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quaternion as quat
from .sdf import SDFShape

Array = jax.Array


def _register(cls):
    data = [f.name for f in dataclasses.fields(cls) if not f.metadata.get("static")]
    meta = [f.name for f in dataclasses.fields(cls) if f.metadata.get("static")]
    return jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=meta)


@_register
@dataclass(frozen=True)
class RigidCollider:
    """One rigid body's collision geometry: an SDF in the body frame plus a
    surface point cloud used when this body is the *point* side of an
    rb–rb test (the reference tests body A's mesh vertices against body
    B's SDF). ``body`` indexes into ``RigidState``."""

    body: int = field(metadata=dict(static=True))
    shape: SDFShape = None
    verts: Array = None          # (V, 3) body-frame surface samples
    restitution: Array = None    # scalar
    friction: Array = None       # scalar
    # optional body-frame -> shape-frame transform for mesh-built bodies
    # whose state was re-baked into the principal/COM frame while the
    # shape stays in the original scaled mesh frame: p_shape =
    # frame_rot @ p_body + frame_t (the reference's m_q_mat /
    # updateInverseTransformation bookkeeping, RigidBody.h:172-188)
    frame_rot: Array = None      # (3, 3)
    frame_t: Array = None        # (3,)
    # broad-phase bounding radii about the body origin (static floats;
    # inf disables pruning for this collider)
    verts_radius: float = field(default=float("inf"),
                                metadata=dict(static=True))
    shape_radius: float = field(default=float("inf"),
                                metadata=dict(static=True))
    # fixed-depth bounding-sphere hierarchy over ``verts`` (collision/
    # bvh.py — the reference's PointCloudBSH pruning, vectorized):
    # body-frame block sphere centers (B, 3) and radii (B,)
    block_centers: Array = None
    block_radii: Array = None


@_register
@dataclass(frozen=True)
class ParticleGroupCollider:
    """A particle range (triangle/tet model) tested against rigid SDFs —
    the ``collisionDetectionRBSolid`` path of the reference. ``offset`` /
    ``count`` select the model's slice of the global particle array
    (mirroring ``TriangleModel::getIndexOffset``)."""

    offset: int = field(metadata=dict(static=True))
    count: int = field(metadata=dict(static=True))
    restitution: Array = None
    friction: Array = None
    # build-time Morton permutation of the group's rest positions; per
    # step the sorted positions reshape into spatially compact blocks
    # whose bounding spheres drive the block-level SDF predicate
    morton_perm: Array = None
    block_size: int = field(default=32, metadata=dict(static=True))


@_register
@dataclass(frozen=True)
class RigidContacts:
    """Fixed-capacity rb–rb contact buffer (one row per candidate vertex).
    Matches the 3×5 ``constraintInfo`` layout of
    ``init_RigidBodyContactConstraint``
    (``PositionBasedRigidBodyDynamics.cpp:2221-2287``) in SoA form."""

    body0: Array       # (K,) int32 — the point-side body
    body1: Array       # (K,) int32 — the SDF-side body
    cp0: Array         # (K, 3) contact point on body 0 (world)
    cp1: Array         # (K, 3) contact point on body 1 (world)
    normal: Array      # (K, 3)
    tangent: Array     # (K, 3)
    nkn_inv: Array     # (K,) 1 / nᵀKn
    p_max: Array       # (K,) max tangent impulse
    goal_u_n: Array    # (K,) target normal velocity
    restitution: Array
    friction: Array
    mask: Array        # (K,) float 0/1
    # active pairs dropped by broad-phase capacity compaction (scalar;
    # 0 when the capacity sufficed; None on the unrolled path)
    overflow: Array = None


@_register
@dataclass(frozen=True)
class ParticleRigidContacts:
    """Fixed-capacity particle–rigid contact buffer
    (``init_ParticleRigidBodyContactConstraint``,
    ``PositionBasedRigidBodyDynamics.cpp:2386-2451``)."""

    particle: Array    # (K,) int32
    body1: Array       # (K,) int32
    cp0: Array         # (K, 3)
    cp1: Array         # (K, 3)
    normal: Array
    tangent: Array
    nkn_inv: Array
    p_max: Array
    goal_u_n: Array
    friction: Array
    mask: Array
    overflow: Array = None


def _compute_matrix_k(r: Array, inv_mass: Array, inv_iw: Array) -> Array:
    """``K = 1/m·I + r̃ᵀ J⁻¹ r̃`` for lever arms ``r (K, 3)``
    (``computeMatrixK``, ``PositionBasedRigidBodyDynamics.h:13``)."""
    rx = _skew(r)
    k = jnp.einsum("kij,kjl,klm->kim", rx, inv_iw, -rx)
    return k + inv_mass[:, None, None] * jnp.eye(3, dtype=r.dtype)


def _skew(v: Array) -> Array:
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([zero, -v[..., 2], v[..., 1]], -1),
        jnp.stack([v[..., 2], zero, -v[..., 0]], -1),
        jnp.stack([-v[..., 1], v[..., 0], zero], -1),
    ], -2)


def init_rb_contact_rows(b0, b1, cp0, cp1, n, mask, rest, fric,
                         rx, rv, rom, inv_mass, inv_iw) -> RigidContacts:
    """Row-wise rb–rb contact-info init
    (``init_RigidBodyContactConstraint``,
    ``PositionBasedRigidBodyDynamics.cpp:2221-2287``). ``b0``/``b1`` are
    per-row body index ARRAYS (K,) — shared by the unrolled per-pair
    path and the batched compacted path (``collision/batched.py``)."""
    k = cp0.shape[0]
    b0 = jnp.broadcast_to(jnp.asarray(b0, jnp.int32), (k,))
    b1 = jnp.broadcast_to(jnp.asarray(b1, jnp.int32), (k,))
    r0 = cp0 - rx[b0]
    r1 = cp1 - rx[b1]
    u_rel = (rv[b0] + jnp.cross(rom[b0], r0)
             - rv[b1] - jnp.cross(rom[b1], r1))
    u_rel_n = jnp.sum(n * u_rel, -1)
    t = u_rel - u_rel_n[:, None] * n
    tl2 = jnp.sum(t * t, -1)
    t = jnp.where(tl2[:, None] > 1e-6,
                  t / jnp.sqrt(jnp.maximum(tl2, 1e-30))[:, None], t)
    k0 = _compute_matrix_k(r0, inv_mass[b0], inv_iw[b0])
    k1 = _compute_matrix_k(r1, inv_mass[b1], inv_iw[b1])
    kk = k0 + k1
    nkn = jnp.einsum("ki,kij,kj->k", n, kk, n)
    tkt = jnp.einsum("ki,kij,kj->k", t, kk, t)
    nkn_inv = jnp.where(nkn > 1e-9, 1.0 / jnp.maximum(nkn, 1e-30), 0.0)
    p_max = jnp.where(tkt > 1e-9,
                      jnp.sum(u_rel * t, -1) / jnp.maximum(tkt, 1e-30), 0.0)
    goal = jnp.where(u_rel_n < 0.0, -rest * u_rel_n, 0.0)
    return RigidContacts(
        body0=b0, body1=b1,
        cp0=cp0, cp1=cp1, normal=n, tangent=t,
        nkn_inv=nkn_inv, p_max=p_max, goal_u_n=goal,
        restitution=jnp.broadcast_to(rest, (k,)),
        friction=jnp.broadcast_to(fric, (k,)),
        mask=mask.astype(jnp.float32) * (nkn > 1e-9),
    )


def init_particle_rb_contact_rows(idx, b1, x, cp1, n, mask, rest, fric,
                                  v, w, rx, rv, rom, inv_mass, inv_iw
                                  ) -> ParticleRigidContacts:
    """Row-wise particle–rigid contact-info init
    (``init_ParticleRigidBodyContactConstraint``,
    ``PositionBasedRigidBodyDynamics.cpp:2386-2451``); shared by the
    unrolled and batched detection paths."""
    k = x.shape[0]
    b1 = jnp.broadcast_to(jnp.asarray(b1, jnp.int32), (k,))
    r1 = cp1 - rx[b1]
    u_rel = v - (rv[b1] + jnp.cross(rom[b1], r1))
    u_rel_n = jnp.sum(n * u_rel, -1)
    t = u_rel - u_rel_n[:, None] * n
    tl2 = jnp.sum(t * t, -1)
    t = jnp.where(tl2[:, None] > 1e-6,
                  t / jnp.sqrt(jnp.maximum(tl2, 1e-30))[:, None], t)
    kmat = _compute_matrix_k(r1, inv_mass[b1], inv_iw[b1])
    kmat = kmat + w[:, None, None] * jnp.eye(3)
    nkn = jnp.einsum("ki,kij,kj->k", n, kmat, n)
    tkt = jnp.einsum("ki,kij,kj->k", t, kmat, t)
    nkn_inv = jnp.where(nkn > 1e-9, 1.0 / jnp.maximum(nkn, 1e-30), 0.0)
    p_max = jnp.where(tkt > 1e-9,
                      jnp.sum(u_rel * t, -1) / jnp.maximum(tkt, 1e-30),
                      0.0)
    goal = jnp.where(u_rel_n < 0.0, -rest * u_rel_n, 0.0)
    return ParticleRigidContacts(
        particle=idx, body1=b1,
        cp0=x, cp1=cp1, normal=n, tangent=t,
        nkn_inv=nkn_inv, p_max=p_max, goal_u_n=goal,
        friction=jnp.broadcast_to(fric, (k,)),
        mask=mask.astype(jnp.float32) * (nkn > 1e-9),
    )


def contacts_overflow(*contact_buffers) -> Array:
    """Sum the overflow counters of any contact buffers carrying one
    (0.0 where absent) — the loud-capacity contract surfaced to
    ``SimState.overflow``."""
    total = jnp.zeros((), jnp.float32)
    for c in contact_buffers:
        if c is not None and getattr(c, "overflow", None) is not None:
            total = total + c.overflow
    return total


@_register
@dataclass(frozen=True)
class CollisionPipeline:
    """All collision objects of a scene + the static candidate pair list.

    Analogue of the reference's ``DistanceFieldCollisionDetection`` object
    list + all-pairs candidate loop (``collisionDetection`` pair dispatch,
    ``DistanceFieldCollisionDetection.cpp:100-175``) — but the pair list is
    frozen at build time and every pair yields a dense masked contact
    block, so shapes are static under ``jit``."""

    rigid_colliders: Tuple = field(default=(), metadata=dict(static=True))
    particle_groups: Tuple = field(default=(), metadata=dict(static=True))
    tolerance: float = field(default=0.01, metadata=dict(static=True))
    # which ordered (point_body_idx, sdf_body_idx) collider pairs to test;
    # built in `create` from collider list (all ordered pairs by default)
    rb_pairs: Tuple = field(default=(), metadata=dict(static=True))
    # solid-solid: ((point_offset, point_count, point_friction),
    #               TetCollider) pairs (collision/solid.py)
    solid_pairs: Tuple = field(default=(), metadata=dict(static=True))
    # "unrolled": the per-pair lax.cond path (exact GS contact-order
    # parity with the reference's pair sweep; compile cost O(M²)).
    # "batched": fixed-capacity active-pair compaction + one batched
    # narrow phase per SDF shape kind (collision/batched.py; compile
    # cost O(#kinds) — the scalable production path).
    broad_phase: str = field(default="unrolled", metadata=dict(static=True))
    rb_batched: object = None     # BatchedRigidColliders or None
    pg_batched: Tuple = ()        # tuple of ParticlePairGroup

    @staticmethod
    def create(rigid_colliders=(), particle_groups=(), tolerance=0.01,
               rb_pairs=None, solid_pairs=(), broad_phase="auto",
               pair_capacity=None):
        """``broad_phase``: "unrolled" | "batched" | "auto" (batched once
        the ordered pair list would unroll more than 24 ``lax.cond``
        gates). ``pair_capacity`` caps the batched active-pair list per
        shape-kind group (default ``max(64, 8·M)``)."""
        rigid_colliders = tuple(rigid_colliders)
        if rb_pairs is None:
            n = len(rigid_colliders)
            rb_pairs = tuple(
                (i, j) for i in range(n) for j in range(n)
                if i != j and rigid_colliders[i].verts is not None
            )
        rb_pairs = tuple(rb_pairs)
        particle_groups = tuple(particle_groups)
        if broad_phase == "auto":
            n_unrolled = (len(rb_pairs)
                          + len(particle_groups) * len(rigid_colliders))
            broad_phase = "batched" if n_unrolled > 24 else "unrolled"
        rb_batched = None
        pg_batched = ()
        if broad_phase == "batched":
            from .batched import (build_batched_particles,
                                  build_batched_rigid)
            rb_batched = build_batched_rigid(
                rigid_colliders, rb_pairs, tolerance,
                pair_capacity=pair_capacity)
            pg_batched = build_batched_particles(
                particle_groups, rigid_colliders, tolerance)
        return CollisionPipeline(
            rigid_colliders=rigid_colliders,
            particle_groups=particle_groups,
            tolerance=tolerance,
            rb_pairs=rb_pairs,
            solid_pairs=tuple(solid_pairs),
            broad_phase=broad_phase,
            rb_batched=rb_batched,
            pg_batched=pg_batched,
        )

    @property
    def active(self) -> bool:
        return bool(self.rb_pairs) or bool(self.solid_pairs) or (
            bool(self.particle_groups) and bool(self.rigid_colliders))

    def detect_solids(self, x, v, inv_mass):
        """Particle–tet narrow phase (``collisionDetectionSolidSolid``),
        run once per step before the substep loop; the resulting contact
        buffer is position-solved inside every projection iteration
        (``TimeStepController.cpp:288-291``)."""
        from .solid import detect_solid_contacts
        return detect_solid_contacts(self.solid_pairs, x, v, inv_mass)

    # -- narrow phase -------------------------------------------------------

    def _world_to_local(self, co: RigidCollider, rx, rq, pts_w):
        r = quat.to_matrix(rq[co.body])
        xl = (pts_w - rx[co.body]) @ r  # Rᵀ(p - x), body frame
        if co.frame_rot is not None:
            xl = xl @ co.frame_rot.T + co.frame_t  # shape frame
        return xl

    def _local_to_world_dir(self, co: RigidCollider, rq, d):
        if co.frame_rot is not None:
            d = d @ co.frame_rot  # shape frame -> body frame
        r = quat.to_matrix(rq[co.body])
        return d @ r.T

    def detect_rigid(self, rigid) -> Optional[RigidContacts]:
        """rb–rb narrow phase + contact-info init (needs velocities for the
        restitution goal, so it runs once per step after the substeps,
        matching ``TimeStepController.cpp:189-196``)."""
        if not self.rb_pairs:
            return None
        if self.broad_phase == "batched" and self.rb_batched is not None:
            from .batched import detect_rigid_batched
            contacts, of = detect_rigid_batched(
                self.rb_batched, self.tolerance, rigid,
                init_rb_contact_rows)
            return dataclasses.replace(contacts, overflow=of)
        rx, rq, rv, rom = rigid.x, rigid.q, rigid.v, rigid.omega
        inv_mass = rigid.inv_mass
        _, inv_iw = rigid.inertia_world()
        inv_iw = inv_iw * (inv_mass > 0.0)[..., None, None]

        rows = []
        for (ia, ib) in self.rb_pairs:
            ca = self.rigid_colliders[ia]
            cb = self.rigid_colliders[ib]
            k = ca.verts.shape[0]

            def narrow(ca=ca, cb=cb, k=k):
                ra = quat.to_matrix(rq[ca.body])
                verts_w = ca.verts @ ra.T + rx[ca.body]
                xl = self._world_to_local(cb, rx, rq, verts_w)
                dist = cb.shape.distance(xl) - self.tolerance
                nl = cb.shape.normal(xl)
                n = self._local_to_world_dir(cb, rq, nl)
                mask = (dist < 0.0) & (jnp.sum(n * n, -1) > 0.5)
                cp0 = verts_w
                cp1 = verts_w - dist[:, None] * n
                rest = ca.restitution * cb.restitution
                fric = ca.friction + cb.friction
                return self._init_rb_contact(
                    ca.body, cb.body, cp0, cp1, n, mask,
                    jnp.broadcast_to(rest, (k,)),
                    jnp.broadcast_to(fric, (k,)),
                    rx, rv, rom, inv_mass, inv_iw)

            reach = ca.verts_radius + cb.shape_radius + self.tolerance
            if np.isfinite(reach):
                # broad phase level 0: bounding-sphere reject as real
                # control flow (the reference's AABB pruning analogue,
                # CollisionDetection.h:32-44) — the narrow phase of a
                # separated pair never executes
                def empty(ca=ca, cb=cb, k=k):
                    z3 = jnp.zeros((k, 3), jnp.float32)
                    z = jnp.zeros((k,), jnp.float32)
                    return RigidContacts(
                        body0=jnp.full((k,), ca.body, jnp.int32),
                        body1=jnp.full((k,), cb.body, jnp.int32),
                        cp0=z3, cp1=z3, normal=z3, tangent=z3,
                        nkn_inv=z, p_max=z, goal_u_n=z,
                        restitution=z, friction=z, mask=z)

                gate = narrow
                if (ca.block_centers is not None
                        and cb.shape is not None):
                    # broad phase level 1: the reference's kd-sphere
                    # predicate "SDF(center) < radius" (DistanceField
                    # CollisionDetection.cpp:226-247) over the vertex
                    # BLOCK spheres (collision/bvh.py), all at once
                    def gate(ca=ca, cb=cb, narrow=narrow, empty=empty):
                        ra = quat.to_matrix(rq[ca.body])
                        cw = ca.block_centers @ ra.T + rx[ca.body]
                        cl = self._world_to_local(cb, rx, rq, cw)
                        dist = cb.shape.distance(cl) - self.tolerance
                        hit = jnp.any(dist < ca.block_radii)
                        return jax.lax.cond(hit, narrow, empty)

                d = jnp.linalg.norm(rx[ca.body] - rx[cb.body])
                rows.append(jax.lax.cond(d < reach, gate, empty))
            else:
                rows.append(narrow())
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *rows)

    def _init_rb_contact(self, b0, b1, cp0, cp1, n, mask, rest, fric,
                         rx, rv, rom, inv_mass, inv_iw):
        k = cp0.shape[0]
        return init_rb_contact_rows(
            jnp.full((k,), b0, jnp.int32), jnp.full((k,), b1, jnp.int32),
            cp0, cp1, n, mask, rest, fric, rx, rv, rom, inv_mass, inv_iw)

    def detect_particles(self, px, pv, p_inv_mass, rigid
                         ) -> Optional[ParticleRigidContacts]:
        """particle–rigid narrow phase + contact init
        (``collisionDetectionRBSolid`` → ``init_ParticleRigidBodyContact…``)."""
        if not (self.particle_groups and self.rigid_colliders):
            return None
        if self.broad_phase == "batched":
            from .batched import detect_particles_batched
            contacts, of = detect_particles_batched(
                self.pg_batched, self.tolerance, px, pv, p_inv_mass,
                rigid, init_particle_rb_contact_rows)
            if contacts is None:
                return None
            return dataclasses.replace(contacts, overflow=of)
        rx, rq, rv, rom = rigid.x, rigid.q, rigid.v, rigid.omega
        inv_mass = rigid.inv_mass
        _, inv_iw = rigid.inertia_world()
        inv_iw = inv_iw * (inv_mass > 0.0)[..., None, None]

        rows = []
        for pg in self.particle_groups:
            sl = slice(pg.offset, pg.offset + pg.count)
            x = px[sl]
            v = pv[sl]
            w = p_inv_mass[sl]
            idx = jnp.arange(pg.offset, pg.offset + pg.count, dtype=jnp.int32)
            # per-step group bounding sphere (the reference prunes with a
            # point-cloud bounding-sphere hierarchy,
            # DistanceFieldCollisionDetection.cpp:26-199; one sphere per
            # model group is the batched-TPU analogue)
            center = jnp.mean(x, axis=0)
            group_r = jnp.sqrt(jnp.max(
                jnp.sum((x - center) ** 2, axis=-1)))
            for cb in self.rigid_colliders:
                k = pg.count
                b1 = cb.body

                def narrow(x=x, v=v, w=w, idx=idx, cb=cb, pg=pg, k=k,
                           b1=b1):
                    xl = self._world_to_local(cb, rx, rq, x)
                    dist = cb.shape.distance(xl) - self.tolerance
                    nl = cb.shape.normal(xl)
                    n = self._local_to_world_dir(cb, rq, nl)
                    mask = ((dist < 0.0) & (jnp.sum(n * n, -1) > 0.5)
                            & ((w > 0.0) | (inv_mass[b1] > 0.0)))
                    cp1 = x - dist[:, None] * n
                    return init_particle_rb_contact_rows(
                        idx, jnp.full((k,), b1, jnp.int32), x, cp1, n,
                        mask, pg.restitution * cb.restitution,
                        pg.friction + cb.friction, v, w,
                        rx, rv, rom, inv_mass, inv_iw)

                reach = cb.shape_radius + self.tolerance
                if np.isfinite(reach):
                    # broad phase level 0: group-sphere vs
                    # collider-sphere reject as real control flow — a
                    # separated pair's SDF narrow phase never executes
                    def empty(idx=idx, k=k, b1=b1):
                        z3 = jnp.zeros((k, 3), jnp.float32)
                        z = jnp.zeros((k,), jnp.float32)
                        return ParticleRigidContacts(
                            particle=idx,
                            body1=jnp.full((k,), b1, jnp.int32),
                            cp0=z3, cp1=z3, normal=z3, tangent=z3,
                            nkn_inv=z, p_max=z, goal_u_n=z,
                            friction=z, mask=z)

                    gate = narrow
                    if pg.morton_perm is not None and cb.shape is not None:
                        # broad phase level 1: per-step block spheres
                        # over the Morton-sorted (deforming) group vs
                        # the reference's kd-sphere SDF predicate
                        # (collision/bvh.py)
                        def gate(x=x, cb=cb, pg=pg, narrow=narrow,
                                 empty=empty):
                            bs = pg.block_size
                            xs = x[pg.morton_perm]
                            nb = xs.shape[0] // bs
                            blocks = xs[:nb * bs].reshape(nb, bs, 3)
                            bc = jnp.mean(blocks, axis=1)
                            br_ = jnp.sqrt(jnp.max(jnp.sum(
                                (blocks - bc[:, None, :]) ** 2, -1), -1))
                            cl = self._world_to_local(cb, rx, rq, bc)
                            dist = (cb.shape.distance(cl)
                                    - self.tolerance)
                            # tail vertices not covered by full blocks
                            # fall back to the group sphere test
                            hit = jnp.any(dist < br_)
                            if xs.shape[0] % bs:
                                tail = xs[nb * bs:]
                                tl = self._world_to_local(cb, rx, rq,
                                                          tail)
                                hit = hit | jnp.any(
                                    cb.shape.distance(tl)
                                    - self.tolerance < 0.0)
                            return jax.lax.cond(hit, narrow, empty)

                    d = jnp.linalg.norm(center - rx[b1])
                    rows.append(jax.lax.cond(
                        d < group_r + reach, gate, empty))
                else:
                    rows.append(narrow())
        if not rows:
            return None
        c = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *rows)
        # active-first compaction (stable, so gauss_seidel sweep order
        # over ACTIVE rows is unchanged): the contact solve runs
        # ``max_iterations_v`` passes over this buffer, and actual
        # contacts are sparse in the candidate rows; dropped actives
        # count loudly in ``overflow`` (assertable ==0)
        k = c.mask.shape[0]
        cap = int(max(512, k // 4))
        if cap < k:
            from .batched import _compact
            n_active = jnp.sum(c.mask)
            sel, act, _ = _compact(c.mask > 0.5, cap, k)
            c = jax.tree.map(lambda a: a[sel], c)
            c = dataclasses.replace(
                c, mask=c.mask * act.astype(jnp.float32),
                overflow=jnp.maximum(n_active - cap, 0.0))
        return c

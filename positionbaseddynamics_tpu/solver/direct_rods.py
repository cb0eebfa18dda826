"""Direct solver for stiff rod chains (Deul et al. 2018).

Reference: ``DirectPositionBasedSolverForStiffRods`` — a tree of rod
segments whose interval constraints are factorized and solved *exactly*
each iteration (``PositionBasedElasticRods.cpp:735-1226``: ``initLists/
initNodes/initTree/orderMatrix`` + per-iteration ``factor``/``solve``).

TPU-first architecture: for chains (the overwhelmingly common rod
topology — the reference's tree generalization exists for branched
rods), the coupled system ``(J M⁻¹ Jᵀ + α) λ = rhs`` over all
stretch-bending-twisting constraints of one rod is **block-tridiagonal**
with 6×6 blocks, because constraint j shares exactly one segment with
constraint j±1. It is solved exactly with a block Thomas algorithm
expressed as two ``lax.scan`` passes over the chain — sequential in
segments (inherent to a direct solve; SURVEY §7 "hard parts") but
batched over rods and rollout scenarios via ``vmap``.

The per-constraint rows, compliances and λ-sum semantics are identical
to the iterative :func:`~..solver.joints._prep_stretch_bending_twisting`
joint — the direct solver simply solves all of a rod's constraints
simultaneously instead of Gauss-Seidel sweeping them.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quaternion as quat, rigidbody as rb
from ..utils import npquat
from .joints import _EYE3, darboux_jacobian1, darboux_omega

Array = jax.Array


def _register(cls):
    data = [f.name for f in dataclasses.fields(cls) if not f.metadata.get("static")]
    meta = [f.name for f in dataclasses.fields(cls) if f.metadata.get("static")]
    return jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=meta)


@_register
@dataclass(frozen=True)
class DirectRodBatch:
    """``R`` rod chains of ``S`` segments each (equal length per batch;
    build several batches for mixed sizes). Segment b of rod r is rigid
    body ``bodies[r, b]``; constraint j joins segments j, j+1."""

    bodies: Array        # (R, S) int32
    local0: Array        # (R, S-1, 3) connector in segment j frame
    local1: Array        # (R, S-1, 3) connector in segment j+1 frame
    rest_darboux: Array  # (R, S-1, 3)
    seg_len: Array       # (R, S-1) average segment length
    stiffness: Array     # (R, S-1, 3) K = (EI, 2GI, EI)

    @staticmethod
    def create(bodies, positions, x, q, average_radius,
               average_segment_length, youngs_modulus, torsion_modulus
               ) -> "DirectRodBatch":
        """``bodies (R, S)`` body indices; ``positions (R, S-1, 3)`` world
        constraint positions; ``x/q`` initial body states. Scalar material
        params broadcast. Mirrors ``init_DirectPositionBasedSolverForStiff
        RodsConstraint`` (``PositionBasedElasticRods.cpp:1009-1099``)."""
        bodies = np.asarray(bodies, np.int32)
        if bodies.ndim == 1:
            bodies = bodies[None]
        r, s = bodies.shape
        pos = np.asarray(positions, np.float64).reshape(r, s - 1, 3)
        x = np.asarray(x, np.float64)
        q = np.asarray(q, np.float64)
        b0 = bodies[:, :-1]
        b1 = bodies[:, 1:]
        l0 = npquat.rotate(npquat.conjugate(q[b0].reshape(-1, 4)),
                           (pos - x[b0]).reshape(-1, 3)).reshape(r, s - 1, 3)
        l1 = npquat.rotate(npquat.conjugate(q[b1].reshape(-1, 4)),
                           (pos - x[b1]).reshape(-1, 3)).reshape(r, s - 1, 3)
        seg_len = np.broadcast_to(
            np.asarray(average_segment_length, np.float64), (r, s - 1))
        rel = npquat.multiply(npquat.conjugate(q[b0].reshape(-1, 4)),
                              q[b1].reshape(-1, 4)).reshape(r, s - 1, 4)
        rest = 2.0 / seg_len[..., None] * rel[..., 1:4]
        radius = np.broadcast_to(np.asarray(average_radius, np.float64),
                                 (r, s - 1))
        youngs = np.broadcast_to(np.asarray(youngs_modulus, np.float64),
                                 (r, s - 1))
        torsion = np.broadcast_to(np.asarray(torsion_modulus, np.float64),
                                  (r, s - 1))
        second_moment = np.pi / 4.0 * radius ** 4
        bend = youngs * second_moment
        twist = 2.0 * torsion * second_moment
        return DirectRodBatch(
            bodies=jnp.asarray(bodies),
            local0=jnp.asarray(l0, jnp.float32),
            local1=jnp.asarray(l1, jnp.float32),
            rest_darboux=jnp.asarray(rest, jnp.float32),
            seg_len=jnp.asarray(seg_len, jnp.float32),
            stiffness=jnp.asarray(np.stack([bend, twist, bend], -1),
                                  jnp.float32),
        )

    def init_lambda(self) -> Array:
        return jnp.zeros(self.seg_len.shape + (6,), jnp.float32)

    # -- assembly ------------------------------------------------------------

    @staticmethod
    def _constraint_rows(x0, q0, x1, q1, l0, l1, rest, seg_len,
                         stiff, lam, dt):
        """Rows of one SBT constraint: returns ``(c (6,), J0 (6, 6),
        J1 (6, 6), alpha (6,))`` with row layout ``[linear | angular]``
        per body — exactly the iterative joint's rows
        (``solve_StretchBendingTwistingConstraint``,
        ``PositionBasedElasticRods.cpp:1228-1363``)."""
        c0 = quat.rotate(q0, l0) + x0
        c1 = quat.rotate(q1, l1) + x1
        r0, r1 = c0 - x0, c1 - x1
        diff = c0 - c1
        omega = darboux_omega(q0, q1, seg_len)
        j1 = darboux_jacobian1(q0, q1, seg_len)
        bend_c = omega - rest
        z3 = jnp.zeros((3, 3), jnp.float32)
        l_rows0 = jnp.concatenate([_EYE3, z3], 0)          # (6, 3)
        a_rows0 = jnp.concatenate(
            [jnp.stack([jnp.cross(r0, _EYE3[i]) for i in range(3)]),
             -j1], 0)
        l_rows1 = jnp.concatenate([-_EYE3, z3], 0)
        a_rows1 = jnp.concatenate(
            [jnp.stack([-jnp.cross(r1, _EYE3[i]) for i in range(3)]),
             j1], 0)
        c = jnp.concatenate([diff, bend_c])
        inv_dt2 = 1.0 / (dt * dt)
        alpha = jnp.concatenate([
            jnp.full((3,), 1.0e-10 * inv_dt2),
            inv_dt2 / (stiff * seg_len)])
        j0 = jnp.concatenate([l_rows0, a_rows0], 1)        # (6, 6)
        j1m = jnp.concatenate([l_rows1, a_rows1], 1)
        return c, j0, j1m, alpha

    def solve(self, rx, rq, inv_mass, inv_iw, lam, dt):
        """One exact solve of every rod (all constraints simultaneously).
        Returns ``(corr_x (R, S, 3), ot (R, S, 3), new_lam)`` — ``ot``
        feeds :func:`~..ops.rigidbody.rotation_correction`."""

        def one_rod(bodies, l0, l1, rest, seg_len, stiff, lam_r):
            b0, b1 = bodies[:-1], bodies[1:]
            x0, q0 = rx[b0], rq[b0]
            x1, q1 = rx[b1], rq[b1]
            c, j0, j1m, alpha = jax.vmap(
                self._constraint_rows)(x0, q0, x1, q1, l0, l1, rest,
                                       seg_len, stiff,
                                       lam_r, jnp.broadcast_to(dt, seg_len.shape))

            # 6x6 inverse mass blocks per segment: diag(w I3, Iinv)
            def wmat(b):
                w = inv_mass[b]
                iw = inv_iw[b]
                top = jnp.concatenate(
                    [w[:, None, None] * jnp.eye(3), jnp.zeros_like(iw)], 2)
                bot = jnp.concatenate([jnp.zeros_like(iw), iw], 2)
                return jnp.concatenate([top, bot], 1)      # (C, 6, 6)

            w0 = wmat(b0)
            w1 = wmat(b1)
            # diagonal blocks + compliance
            diag = (jnp.einsum("cik,ckl,cjl->cij", j0, w0, j0)
                    + jnp.einsum("cik,ckl,cjl->cij", j1m, w1, j1m))
            diag = diag + jax.vmap(jnp.diag)(alpha)
            # upper off-diagonal: constraint j couples j+1 via segment j+1
            upper = jnp.einsum("cik,ckl,cjl->cij", j1m[:-1], w1[:-1],
                               j0[1:])                      # (C-1, 6, 6)
            rhs = -(c + alpha * lam_r)

            # block Thomas: forward elimination scan ---------------------
            def fwd(carry, inp):
                d_prev, r_prev = carry
                d_j, r_j, u_prev = inp
                # L = U_{j-1}ᵀ D_{j-1}⁻¹ (= (D⁻¹ U)ᵀ, D symmetric)
                l_mat = jnp.linalg.solve(d_prev, u_prev).T
                d_new = d_j - l_mat @ u_prev
                r_new = r_j - l_mat @ r_prev
                return (d_new, r_new), (d_new, r_new, l_mat)

            (_, _), (d_rest, r_rest, _) = jax.lax.scan(
                fwd, (diag[0], rhs[0]), (diag[1:], rhs[1:], upper))
            d_all = jnp.concatenate([diag[:1], d_rest], 0)
            r_all = jnp.concatenate([rhs[:1], r_rest], 0)

            # back substitution scan -------------------------------------
            lam_last = jnp.linalg.solve(d_all[-1], r_all[-1])

            def bwd(lam_next, inp):
                d_j, r_j, u_j = inp
                lam_j = jnp.linalg.solve(d_j, r_j - u_j @ lam_next)
                return lam_j, lam_j

            _, lam_front = jax.lax.scan(
                bwd, lam_last,
                (d_all[:-1], r_all[:-1], upper), reverse=True)
            dlam = jnp.concatenate([lam_front, lam_last[None]], 0)

            # apply: segment b gets J_{b-1}^{(1)}ᵀ λ_{b-1} + J_b^{(0)}ᵀ λ_b
            imp = jnp.zeros((bodies.shape[0], 6), jnp.float32)
            imp = imp.at[:-1].add(jnp.einsum("cij,ci->cj", j0, dlam))
            imp = imp.at[1:].add(jnp.einsum("cij,ci->cj", j1m, dlam))
            w_all = wmat(bodies)
            delta = jnp.einsum("cij,cj->ci", w_all, imp)    # (S, 6)
            return delta[:, :3], delta[:, 3:], lam_r + dlam

        corr_x, ot, new_lam = jax.vmap(one_rod)(
            self.bodies, self.local0, self.local1, self.rest_darboux,
            self.seg_len, self.stiffness, lam)
        return corr_x, ot, new_lam


@_register
@dataclass(frozen=True)
class DirectRodTreeBatch:
    """One stiff-rod segment TREE (arbitrary branching) solved exactly —
    the capability of the reference's tree factorization
    (``initLists/initNodes/initTree/orderMatrix`` + tree-ordered
    ``factor``/``solve``, ``PositionBasedElasticRods.cpp:735-1107``)
    re-architected for TPU: at branch segments the constraint
    interaction matrix ``H = J M⁻¹ Jᵀ + α`` has cliques (every pair of
    constraints incident to the segment couples), which the reference
    eliminates with a fill-bounded tree order on the CPU. Rod trees are
    small (tens of constraints), so the TPU-native exact solve is a
    DENSE 6C×6C solve of the very same system — one well-shaped
    ``linalg.solve`` instead of a sequential elimination, bit-equal in
    exact arithmetic and valid for arbitrary topology (the chain case
    stays on the O(C) block-Thomas scan of :class:`DirectRodBatch`).

    ``bodies (S,)`` are the segment rigid bodies; constraint ``c`` joins
    local segments ``edges[c, 0]`` and ``edges[c, 1]``.
    """

    bodies: Array        # (S,) int32 global body indices
    edges: Array         # (C, 2) int32 local segment indices
    local0: Array        # (C, 3) connector in edges[:,0] frame
    local1: Array        # (C, 3) connector in edges[:,1] frame
    rest_darboux: Array  # (C, 3)
    seg_len: Array       # (C,)
    stiffness: Array     # (C, 3)

    @staticmethod
    def create(bodies, edges, positions, x, q, average_radius,
               average_segment_length, youngs_modulus, torsion_modulus
               ) -> "DirectRodTreeBatch":
        bodies = np.asarray(bodies, np.int32).reshape(-1)
        edges = np.asarray(edges, np.int32).reshape(-1, 2)
        c = edges.shape[0]
        pos = np.asarray(positions, np.float64).reshape(c, 3)
        x = np.asarray(x, np.float64)
        q = np.asarray(q, np.float64)
        g0 = bodies[edges[:, 0]]
        g1 = bodies[edges[:, 1]]
        l0 = npquat.rotate(npquat.conjugate(q[g0]), pos - x[g0])
        l1 = npquat.rotate(npquat.conjugate(q[g1]), pos - x[g1])
        seg_len = np.broadcast_to(
            np.asarray(average_segment_length, np.float64), (c,))
        rel = npquat.multiply(npquat.conjugate(q[g0]), q[g1])
        rest = 2.0 / seg_len[..., None] * rel[..., 1:4]
        radius = np.broadcast_to(np.asarray(average_radius, np.float64),
                                 (c,))
        youngs = np.broadcast_to(np.asarray(youngs_modulus, np.float64),
                                 (c,))
        torsion = np.broadcast_to(np.asarray(torsion_modulus, np.float64),
                                  (c,))
        second_moment = np.pi / 4.0 * radius ** 4
        bend = youngs * second_moment
        twist = 2.0 * torsion * second_moment
        return DirectRodTreeBatch(
            bodies=jnp.asarray(bodies),
            edges=jnp.asarray(edges),
            local0=jnp.asarray(l0, jnp.float32),
            local1=jnp.asarray(l1, jnp.float32),
            rest_darboux=jnp.asarray(rest, jnp.float32),
            seg_len=jnp.asarray(seg_len, jnp.float32),
            stiffness=jnp.asarray(np.stack([bend, twist, bend], -1),
                                  jnp.float32),
        )

    def init_lambda(self) -> Array:
        return jnp.zeros((self.edges.shape[0], 6), jnp.float32)

    def solve(self, rx, rq, inv_mass, inv_iw, lam, dt):
        """One exact solve of the whole tree. Returns
        ``(corr_x (S, 3), ot (S, 3), new_lam)``."""
        s_count = self.bodies.shape[0]
        c_count = self.edges.shape[0]
        g0 = self.bodies[self.edges[:, 0]]
        g1 = self.bodies[self.edges[:, 1]]
        x0, q0 = rx[g0], rq[g0]
        x1, q1 = rx[g1], rq[g1]
        c_vec, j0, j1m, alpha = jax.vmap(
            DirectRodBatch._constraint_rows)(
                x0, q0, x1, q1, self.local0, self.local1,
                self.rest_darboux, self.seg_len, self.stiffness, lam,
                jnp.broadcast_to(dt, self.seg_len.shape))

        def wmat(b):
            w = inv_mass[b]
            iw = inv_iw[b]
            top = jnp.concatenate(
                [w[:, None, None] * jnp.eye(3), jnp.zeros_like(iw)], 2)
            bot = jnp.concatenate([jnp.zeros_like(iw), iw], 2)
            return jnp.concatenate([top, bot], 1)          # (S, 6, 6)

        w_seg = wmat(self.bodies)                          # (S, 6, 6)

        # G[c, s] = Jacobian block of constraint c w.r.t. segment s
        g_blocks = jnp.zeros((c_count, s_count, 6, 6), jnp.float32)
        g_blocks = g_blocks.at[jnp.arange(c_count),
                               self.edges[:, 0]].add(j0)
        g_blocks = g_blocks.at[jnp.arange(c_count),
                               self.edges[:, 1]].add(j1m)

        gw = jnp.einsum("csik,skl->csil", g_blocks, w_seg)
        h = jnp.einsum("csik,dsjk->cidj", gw, g_blocks)
        h = h.reshape(c_count * 6, c_count * 6)
        h = h + jnp.diag(alpha.reshape(-1))
        rhs = -(c_vec + alpha * lam).reshape(-1)
        dlam = jnp.linalg.solve(h, rhs).reshape(c_count, 6)

        imp = jnp.einsum("csij,ci->sj", g_blocks, dlam)    # (S, 6)
        delta = jnp.einsum("sij,sj->si", w_seg, imp)
        return delta[:, :3], delta[:, 3:], lam + dlam

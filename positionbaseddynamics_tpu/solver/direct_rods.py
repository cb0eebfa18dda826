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


# below this constraint count the dense 6C×6C tree solve is faster on
# TPU than C sequential elimination steps; above it the scheduled
# tree-ordered elimination (O(C) 6×6 ops) takes over
_TREE_DENSE_MAX = 48


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
    # tree-ordered elimination schedule (``_build_tree_schedule``) —
    # dict of int32/float32 arrays; None falls back to the dense solve
    schedule: dict = None
    n_slots: int = field(default=0, metadata=dict(static=True))
    dmax: int = field(default=1, metadata=dict(static=True))
    pmax: int = field(default=1, metadata=dict(static=True))
    # "auto": scheduled elimination above _TREE_DENSE_MAX constraints,
    # dense 6C×6C solve below (dense is faster for tiny trees on TPU);
    # "dense" | "tree" force a path
    solver: str = field(default="auto", metadata=dict(static=True))

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
        sched_np = _build_tree_schedule(edges, int(bodies.shape[0]))
        n_slots = sched_np.pop("n_slots")
        dmax = sched_np.pop("dmax")
        pmax = sched_np.pop("pmax")
        schedule = {k: jnp.asarray(v) for k, v in sched_np.items()}
        return DirectRodTreeBatch(
            bodies=jnp.asarray(bodies),
            edges=jnp.asarray(edges),
            local0=jnp.asarray(l0, jnp.float32),
            local1=jnp.asarray(l1, jnp.float32),
            rest_darboux=jnp.asarray(rest, jnp.float32),
            seg_len=jnp.asarray(seg_len, jnp.float32),
            stiffness=jnp.asarray(np.stack([bend, twist, bend], -1),
                                  jnp.float32),
            schedule=schedule, n_slots=n_slots, dmax=dmax, pmax=pmax,
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

        use_tree = (self.solver == "tree"
                    or (self.solver == "auto"
                        and self.schedule is not None
                        and c_count > _TREE_DENSE_MAX))
        if use_tree:
            dlam = self._solve_scheduled(c_vec, j0, j1m, alpha, w_seg,
                                         lam)
        else:
            # dense 6C×6C solve — exact and FASTER for small trees
            # (one well-shaped linalg.solve beats C sequential steps)
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

        imp = jnp.zeros((s_count, 6), jnp.float32)
        imp = imp.at[self.edges[:, 0]].add(
            jnp.einsum("cij,ci->cj", j0, dlam))
        imp = imp.at[self.edges[:, 1]].add(
            jnp.einsum("cij,ci->cj", j1m, dlam))
        delta = jnp.einsum("sij,sj->si", w_seg, imp)
        return delta[:, :3], delta[:, 3:], lam + dlam

    def _solve_scheduled(self, c_vec, j0, j1m, alpha, w_seg, lam):
        """Tree-ordered block-LDLᵀ over the static schedule: O(C·d²)
        6×6 ops in two sequential scans instead of the dense O((6C)³)
        solve — branched rods scale past the dense fallback's ~30-
        segment practicality ceiling (VERDICT r4 #9). Bit-equal to the
        dense solve in exact arithmetic (fill-free perfect elimination
        order); parity-tested to ≤1e-4 in tests/test_stiff_rods.py."""
        sch = self.schedule
        c_count = self.edges.shape[0]

        jsel_a = jnp.where(sch["con_sa"][:, None, None] == 0,
                           j0[sch["con_a"]], j1m[sch["con_a"]])
        jsel_b = jnp.where(sch["con_sb"][:, None, None] == 0,
                           j0[sch["con_b"]], j1m[sch["con_b"]])
        w_con = w_seg[sch["con_seg"]]
        contrib = jnp.einsum("nik,nkl,njl->nij", jsel_a, w_con, jsel_b)
        blocks = jnp.zeros((self.n_slots, 6, 6),
                           jnp.float32).at[sch["con_slot"]].add(contrib)
        # diagonal slots were allocated first, in constraint order:
        # slot id of (c, c) == c
        blocks = blocks.at[jnp.arange(c_count)].add(
            jax.vmap(jnp.diag)(alpha))
        rhs = -(c_vec + alpha * lam)                       # (C, 6)

        def fwd(carry, inp):
            blocks, rhs = carry
            (piv, piv_slot, n_idx, n_slot, n_tr, u_ii, u_jj, u_slot,
             u_mask) = inp
            hcc_inv = jnp.linalg.inv(blocks[piv_slot])
            g_raw = blocks[n_slot]                         # (D, 6, 6)
            g = jnp.where(n_tr[:, None, None],
                          jnp.swapaxes(g_raw, -1, -2), g_raw)  # H[a,c]
            nmask = (n_idx >= 0).astype(jnp.float32)
            g = g * nmask[:, None, None]
            l_blk = jnp.einsum("dij,jk->dik", g, hcc_inv)
            rhs_c = rhs[piv]
            dr = jnp.einsum("dij,j->di", l_blk, rhs_c)
            rhs = rhs.at[jnp.where(n_idx >= 0, n_idx, c_count)].add(
                -dr, mode="drop")
            # H[a,b] -= H[a,c] Hcc⁻¹ H[c,b] = L_a (H[b,c])ᵀ = l_a g_bᵀ
            delta = jnp.einsum("pik,pjk->pij", l_blk[u_ii], g[u_jj])
            blocks = blocks.at[u_slot].add(
                -delta * u_mask[:, None, None])
            return (blocks, rhs), (hcc_inv, g, rhs_c)

        sched_in = (sch["piv"], sch["piv_slot"], sch["nbr_idx"],
                    sch["nbr_slot"], sch["nbr_tr"], sch["upd_ii"],
                    sch["upd_jj"], sch["upd_slot"], sch["upd_mask"])
        (_, _), (hcc_invs, gs, rhs_cs) = jax.lax.scan(
            fwd, (blocks, rhs), sched_in)

        def bwd(lam_acc, inp):
            hcc_inv, g, rhs_c, n_idx, piv = inp
            safe = jnp.where(n_idx >= 0, n_idx, 0)
            lam_nbr = (lam_acc[safe]
                       * (n_idx >= 0).astype(jnp.float32)[:, None])
            s = rhs_c - jnp.einsum("dji,dj->i", g, lam_nbr)
            lam_c = hcc_inv @ s
            return lam_acc.at[piv].set(lam_c), None

        lam0 = jnp.zeros((c_count, 6), jnp.float32)
        dlam, _ = jax.lax.scan(
            bwd, lam0, (hcc_invs, gs, rhs_cs, sch["nbr_idx"],
                        sch["piv"]), reverse=True)
        return dlam


def _build_tree_schedule(edges: np.ndarray, s_count: int):
    """Static elimination schedule for the tree's constraint graph.

    Constraints (tree edges) adjacent iff they share a segment; at a
    branch segment the incident constraints form a CLIQUE, so the graph
    is a block graph — chordal. Eliminating leaf-deepest first is a
    perfect elimination order: each pivot's not-yet-eliminated
    neighbors all share its parent segment (already a clique), so the
    factorization is FILL-FREE and the whole sparse block-LDLᵀ reduces
    to a fixed schedule of 6×6 ops — the TPU-native form of the
    reference's ``initLists/initNodes/initTree/orderMatrix`` + tree
    ``factor`` (``PositionBasedElasticRods.cpp:735-1226``)."""
    from collections import deque

    c_count = len(edges)
    seg_edges = [[] for _ in range(s_count)]
    adj_seg = [[] for _ in range(s_count)]
    for ci, (u, v) in enumerate(edges):
        seg_edges[u].append((ci, v))
        seg_edges[v].append((ci, u))
        adj_seg[u].append(ci)
        adj_seg[v].append(ci)
    depth = np.full(s_count, -1, np.int64)
    depth[0] = 0
    dq = deque([0])
    while dq:
        u = dq.popleft()
        for ci, v in seg_edges[u]:
            if depth[v] < 0:
                depth[v] = depth[u] + 1
                dq.append(v)
    edepth = np.array([max(depth[u], depth[v]) for (u, v) in edges])
    order = np.argsort(-edepth, kind="stable")

    nbrs = [set() for _ in range(c_count)]
    for s in range(s_count):
        cs = adj_seg[s]
        for i in range(len(cs)):
            for j in range(i + 1, len(cs)):
                nbrs[cs[i]].add(cs[j])
                nbrs[cs[j]].add(cs[i])

    slot = {}

    def get_slot(a, b):
        key = (min(a, b), max(a, b))
        if key not in slot:
            slot[key] = len(slot)
        return slot[key]

    for c in range(c_count):
        get_slot(c, c)
    for c in range(c_count):
        for a in nbrs[c]:
            get_slot(c, a)

    eliminated = np.zeros(c_count, bool)
    steps = []
    for c in order:
        later = sorted(a for a in nbrs[c] if not eliminated[a])
        for i in range(len(later)):          # chordality: clique check
            for j in range(i + 1, len(later)):
                a, b = later[i], later[j]
                if b not in nbrs[a]:         # fill (non-tree input)
                    nbrs[a].add(b)
                    nbrs[b].add(a)
                    get_slot(a, b)
        pairs = [(i, j) for i in range(len(later))
                 for j in range(i, len(later))]
        steps.append((int(c), later, pairs))
        eliminated[c] = True

    dmax = max([len(l) for _, l, _ in steps] + [1])
    pmax = max([len(p) for _, _, p in steps] + [1])
    piv = np.array([c for c, _, _ in steps], np.int32)
    piv_slot = np.array([slot[(c, c)] for c, _, _ in steps], np.int32)
    nbr_idx = np.full((c_count, dmax), -1, np.int32)
    nbr_slot = np.zeros((c_count, dmax), np.int32)
    nbr_tr = np.zeros((c_count, dmax), bool)
    upd_ii = np.zeros((c_count, pmax), np.int32)
    upd_jj = np.zeros((c_count, pmax), np.int32)
    upd_slot = np.zeros((c_count, pmax), np.int32)
    upd_mask = np.zeros((c_count, pmax), np.float32)
    for k, (c, later, pairs) in enumerate(steps):
        for i, a in enumerate(later):
            nbr_idx[k, i] = a
            nbr_slot[k, i] = slot[(min(a, c), max(a, c))]
            nbr_tr[k, i] = a > c     # stored block is H[min,max]
        for p, (i, j) in enumerate(pairs):
            a, b = later[i], later[j]
            upd_ii[k, p] = i
            upd_jj[k, p] = j
            upd_slot[k, p] = slot[(a, b)]   # a <= b (later sorted)
            upd_mask[k, p] = 1.0

    # per-slot initial-assembly contributions: shared segment + which
    # Jacobian side of each constraint touches it
    con_slot, con_seg, con_a, con_sa, con_b, con_sb = [], [], [], [], [], []
    for (a, b), sl in slot.items():
        segs_a = {edges[a][0]: 0, edges[a][1]: 1}
        segs_b = {edges[b][0]: 0, edges[b][1]: 1}
        shared = set(segs_a) & set(segs_b)
        for s in shared:
            con_slot.append(sl)
            con_seg.append(s)
            con_a.append(a)
            con_sa.append(segs_a[s])
            con_b.append(b)
            con_sb.append(segs_b[s])
    return dict(
        n_slots=len(slot), dmax=int(dmax), pmax=int(pmax),
        piv=piv, piv_slot=piv_slot, nbr_idx=nbr_idx,
        nbr_slot=nbr_slot, nbr_tr=nbr_tr, upd_ii=upd_ii,
        upd_jj=upd_jj, upd_slot=upd_slot, upd_mask=upd_mask,
        con_slot=np.asarray(con_slot, np.int32),
        con_seg=np.asarray(con_seg, np.int32),
        con_a=np.asarray(con_a, np.int32),
        con_sa=np.asarray(con_sa, np.int32),
        con_b=np.asarray(con_b, np.int32),
        con_sb=np.asarray(con_sb, np.int32),
    )

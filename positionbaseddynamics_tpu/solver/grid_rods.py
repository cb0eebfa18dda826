"""Rod-lattice fast path: B uniform Cosserat rods as ``(B, n)``
component planes — the structured-grid treatment (`grid_cloth.py`
style) applied to the rod family.

The unstructured rod batches gather/scatter per-constraint rows and
carry quaternions as trailing-4 arrays (which tile terribly: 4 of 128
lanes); a batch of IDENTICAL rods is a regular lattice where every
constraint family is a shift-by-one stencil along the segment axis:

* positions: 3 planes ``(B, n_p)``; orientations: 4 planes ``(B, n_q)``
  (``[w, x, y, z]``);
* stretch-shear (edge i: particles i, i+1, quaternion i) and bend-twist
  (quaternions i, i+1) become dense slice algebra with zero gathers and
  all quaternion products unrolled over component planes;
* Jacobi accumulation is two shifted adds + build-time count planes.

Math mirrors ``ops/rods.py`` (itself ``PositionBasedCosseratRods``,
``PositionBasedElasticRods.cpp:20-81``) exactly; equality with the
unstructured path is asserted in ``tests/test_grid_rods.py``.
Preconditions for the fast path: every rod has the same segment count,
uniform rest length, ISOTROPIC uniform stretch stiffness and uniform
bend-twist stiffness (the bench/demo shape; anything else falls back to
the unstructured batches).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

EPS = 1e-6


def _register(cls):
    data = [f.name for f in dataclasses.fields(cls)
            if not f.metadata.get("static")]
    meta = [f.name for f in dataclasses.fields(cls)
            if f.metadata.get("static")]
    return jax.tree_util.register_dataclass(cls, data_fields=data,
                                            meta_fields=meta)


def _qmul(a, b):
    """Component-plane quaternion product ([w,x,y,z] 4-tuples)."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw)


@_register
@dataclass(frozen=True)
class RodLatticeBatch:
    """B uniform rods: particles ``offset_p + r·n_p + i`` and
    quaternions ``offset_q + r·n_q + i`` (builder layout for
    consecutively added identical line models)."""

    rest_darboux: Array   # (B, n_q-1, 4) rest Darboux (w,x,y,z)
    rest_length: Array    # scalar
    stretch_k: Array      # scalar (isotropic)
    bend_ks: Array        # (3,) uniform per-axis bend/twist stiffness
    inv_cnt_p: Array      # (B, n_p, 1) — SS constraints per particle
    inv_cnt_q_bt: Array   # (B, n_q, 1) — BT constraints per quaternion
    # (each quaternion belongs to exactly ONE stretch-shear edge, so the
    # SS quaternion scatter needs no averaging — matching the separate
    # per-family Jacobi counts of the unstructured path)
    n_rods: int = field(metadata=dict(static=True))
    n_p: int = field(metadata=dict(static=True))
    n_q: int = field(metadata=dict(static=True))
    offset_p: int = field(metadata=dict(static=True))
    offset_q: int = field(metadata=dict(static=True))

    @staticmethod
    def create(n_rods, n_p, offset_p, offset_q, q0, rest_length,
               stretch_k, bend_ks) -> "RodLatticeBatch":
        """``q0``: the scene's full initial quaternion array (N_q, 4)."""
        n_q = n_p - 1
        q = np.asarray(q0, np.float64)[
            offset_q:offset_q + n_rods * n_q].reshape(n_rods, n_q, 4)
        # rest Darboux = q̄_i ⊗ q_{i+1} with the double-cover pick
        # (BendTwistConstraint::initConstraint, Constraints.cpp:2394)
        a = q[:, :-1]
        b = q[:, 1:]
        conj = a * np.array([1.0, -1.0, -1.0, -1.0])
        aw, ax, ay, az = [conj[..., i] for i in range(4)]
        bw, bx, by, bz = [b[..., i] for i in range(4)]
        omega = np.stack([
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw], -1)
        om = omega.copy()
        om[..., 0] -= 1.0
        op = omega.copy()
        op[..., 0] += 1.0
        flip = (np.sum(om * om, -1) > np.sum(op * op, -1))[..., None]
        rest_darboux = np.where(flip, -omega, omega)

        cnt_p = np.full((n_rods, n_p), 2.0)
        cnt_p[:, 0] = cnt_p[:, -1] = 1.0          # one SS edge at ends
        cnt_q_bt = np.full((n_rods, n_q), 2.0)    # BT edges per quat
        cnt_q_bt[:, 0] = cnt_q_bt[:, -1] = 1.0
        return RodLatticeBatch(
            rest_darboux=jnp.asarray(rest_darboux, jnp.float32),
            rest_length=jnp.float32(rest_length),
            stretch_k=jnp.float32(stretch_k),
            bend_ks=jnp.asarray(bend_ks, jnp.float32),
            inv_cnt_p=jnp.asarray(1.0 / cnt_p[..., None], jnp.float32),
            inv_cnt_q_bt=jnp.asarray(1.0 / cnt_q_bt[..., None],
                                     jnp.float32),
            n_rods=int(n_rods), n_p=int(n_p), n_q=int(n_q),
            offset_p=int(offset_p), offset_q=int(offset_q),
        )

    def project(self, x: Array, inv_mass: Array, q: Array,
                inv_mass_q: Array, omega: float = 1.0
                ) -> Tuple[Array, Array]:
        """One Jacobi pass: stretch-shear then bend-twist, both as plane
        stencils (the unstructured path's `_project_rod_batches`
        semantics with build-time count denominators)."""
        from ..ops import quaternion as quat

        b_r, n_p, n_q = self.n_rods, self.n_p, self.n_q
        op, oq = self.offset_p, self.offset_q
        l0 = self.rest_length
        xg = [x[op:op + b_r * n_p, c].reshape(b_r, n_p)
              for c in range(3)]
        wg = inv_mass[op:op + b_r * n_p].reshape(b_r, n_p)
        qg = [q[oq:oq + b_r * n_q, c].reshape(b_r, n_q)
              for c in range(4)]
        wq = inv_mass_q[oq:oq + b_r * n_q].reshape(b_r, n_q)

        # ---- stretch-shear (PositionBasedElasticRods.cpp:20-55) ----
        qw, qx, qy, qz = qg
        d3 = (2.0 * (qx * qz + qw * qy),
              2.0 * (qy * qz - qw * qx),
              qw * qw - qx * qx - qy * qy + qz * qz)
        w0 = wg[:, :-1]
        w1 = wg[:, 1:]
        denom = (w0 + w1) / l0 + wq * 4.0 * l0 + EPS
        gam = [((xg[c][:, 1:] - xg[c][:, :-1]) / l0 - d3[c])
               / denom * self.stretch_k for c in range(3)]
        # corrq = 2 wq L · (0,γ) ⊗ (q ⊗ ē3); q ⊗ ē3 = [qz, −qy, qx, −qw]
        e = (qz, -qy, qx, -qw)
        cq = _qmul((jnp.zeros_like(gam[0]),) + tuple(gam), e)
        s = 2.0 * wq * l0
        dx = [jnp.zeros_like(xg[c]) for c in range(3)]
        for c in range(3):
            dx[c] = dx[c].at[:, :-1].add(w0 * gam[c])
            dx[c] = dx[c].at[:, 1:].add(-w1 * gam[c])
            xg[c] = xg[c] + omega * self.inv_cnt_p[..., 0] * dx[c]
        qg = [qg[c] + omega * (s * cq[c]) for c in range(4)]
        # renormalize (the unstructured path normalizes after the pass)
        nrm = jnp.sqrt(sum(c * c for c in qg) + 1e-30)
        qg = [c / nrm for c in qg]

        # ---- bend-twist (PositionBasedElasticRods.cpp:57-81) ----
        if n_q > 1:
            qa = [c[:, :-1] for c in qg]
            qb = [c[:, 1:] for c in qg]
            conj_a = (qa[0], -qa[1], -qa[2], -qa[3])
            om = _qmul(conj_a, tuple(qb))
            rd = [self.rest_darboux[..., c] for c in range(4)]
            d_minus2 = sum((om[c] - rd[c]) ** 2 for c in range(4))
            d_plus2 = sum((om[c] + rd[c]) ** 2 for c in range(4))
            use_plus = d_minus2 > d_plus2
            delta = [jnp.where(use_plus, om[c] + rd[c], om[c] - rd[c])
                     for c in range(4)]
            wq0 = wq[:, :-1]
            wq1 = wq[:, 1:]
            inv = 1.0 / (wq0 + wq1 + 1e-6)
            delta = [jnp.zeros_like(delta[0])] + [
                delta[c + 1] * (self.bend_ks[c] * inv) for c in range(3)]
            c0 = _qmul(tuple(qb), tuple(delta))
            c1 = _qmul(tuple(qa), tuple(delta))
            dq = [jnp.zeros_like(qg[c]) for c in range(4)]
            for c in range(4):
                dq[c] = dq[c].at[:, :-1].add(wq0 * c0[c])
                dq[c] = dq[c].at[:, 1:].add(-wq1 * c1[c])
                qg[c] = qg[c] + omega * self.inv_cnt_q_bt[..., 0] * dq[c]
            nrm = jnp.sqrt(sum(c * c for c in qg) + 1e-30)
            qg = [c / nrm for c in qg]

        x = jax.lax.dynamic_update_slice(
            x, jnp.stack(xg, -1).reshape(-1, 3), (op, 0))
        q = jax.lax.dynamic_update_slice(
            q, jnp.stack(qg, -1).reshape(-1, 4), (oq, 0))
        return x, q

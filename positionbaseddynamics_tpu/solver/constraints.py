"""Typed constraint batches — the TPU-native replacement for the reference's
OO constraint objects (``Simulation/Constraints.{h,cpp}``, 35 classes with
virtual ``solvePositionConstraint`` dispatch).

Design: one struct-of-arrays batch per constraint family, holding
``idx (C, k)`` particle/orientation indices plus per-constraint parameters.
The solver projects a whole family at once: gather positions, ``vmap`` the
stateless kernel from ``ops/``, scatter-add the corrections. Two projection
modes are supported (cf. SURVEY §2.6):

* ``jacobi`` — all constraints of a family solved simultaneously; the
  per-particle corrections are scatter-added and divided by the number of
  constraints touching each particle (Müller-style averaged Jacobi, with an
  optional SOR weight). This is the TPU-fast default.
* ``gauss_seidel`` — constraints are greedily graph-colored at build time
  (the analogue of ``SimulationModel::initConstraintGroups``,
  ``SimulationModel.cpp:1033-1094``); colors are applied sequentially and
  within a color no two constraints share an item, so the batched
  scatter-add is *exactly* equivalent to the reference's sequential
  in-place Gauss-Seidel within a parallel group.

XPBD Lagrange multipliers λ live in a per-batch array created fresh at the
start of every projection call, matching the reference's reset-at-iter-0
semantics (``Constraints.cpp:1240-1241``).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pbd, quaternion as quat, rods, xpbd
from .coloring import greedy_color

Array = jax.Array


def _register(cls):
    """Register as a pytree; fields marked ``metadata=dict(static=True)``
    become static meta fields (hashable, not traced)."""
    data, meta = [], []
    for f in dataclasses.fields(cls):
        (meta if f.metadata.get("static") else data).append(f.name)
    return jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=meta)


def scatter_add(n: int, idx: Array, corr: Array) -> Array:
    """Scatter per-constraint corrections ``corr (C, k, d)`` at indices
    ``idx (C, k)`` into a dense ``(n, d)`` accumulator."""
    d = corr.shape[-1]
    return jnp.zeros((n, d), corr.dtype).at[idx.reshape(-1)].add(
        corr.reshape(-1, d), mode="drop"
    )


def _counts(n: int, idx: np.ndarray) -> np.ndarray:
    """#constraints touching each of ``n`` items (for Jacobi averaging)."""
    c = np.zeros((n,), np.float32)
    np.add.at(c, idx.reshape(-1), 1.0)
    return np.maximum(c, 1.0)


def _as_f32(x, shape=None):
    a = jnp.asarray(x, jnp.float32)
    if shape is not None:
        a = jnp.broadcast_to(a, shape)
    return a


def _init_isometric_bending_np(p: np.ndarray) -> np.ndarray:
    """Host-side (numpy, float64) batched Q-matrix precompute for isometric
    bending — same math as ``ops.xpbd.init_isometric_bending``
    (``XPBD.cpp:112-150``) but without touching the device at build time.
    ``p (C, 4, 3)`` in (p0, p1, p2, p3) stencil order. Returns ``(C, 4, 4)``.
    """
    p = np.asarray(p, np.float64)
    x0, x1, x2, x3 = p[:, 2], p[:, 3], p[:, 0], p[:, 1]  # internal order
    e0, e1, e2 = x1 - x0, x2 - x0, x3 - x0
    e3, e4 = x2 - x1, x3 - x1

    def cot(v, w):
        cos_t = np.einsum("cd,cd->c", v, w)
        sin_t = np.linalg.norm(np.cross(v, w), axis=-1)
        return cos_t / np.maximum(sin_t, 1e-12)

    c01, c02 = cot(e0, e1), cot(e0, e2)
    c03, c04 = cot(-e0, e3), cot(-e0, e4)
    a0 = 0.5 * np.linalg.norm(np.cross(e0, e1), axis=-1)
    a1 = 0.5 * np.linalg.norm(np.cross(e0, e2), axis=-1)
    coef = -3.0 / (2.0 * (a0 + a1))
    k = np.stack([c03 + c04, c01 + c02, -c01 - c03, -c02 - c04], axis=1)
    return (coef[:, None, None] * np.einsum("ci,cj->cij", k, k)).astype(np.float32)


def _quat_multiply_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Hamilton product on (..., 4) [w,x,y,z] numpy arrays."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


# ---------------------------------------------------------------------------
# Particle constraint batches
# ---------------------------------------------------------------------------


@_register
@dataclass(frozen=True)
class DistanceBatch:
    """XPBD/PBD distance constraints over particle pairs — the batched form
    of ``DistanceConstraint_XPBD`` (``Simulation/Constraints.cpp:1227-1258``).

    ``stiffness`` is the XPBD stiffness k (α = 1/(k dt²)); set ``xpbd=False``
    for the classic [0,1]-stiffness kernel (``PositionBasedDynamics.cpp:13``).
    """

    idx: Array            # (C, 2) int32
    rest_length: Array    # (C,)
    stiffness: Array      # (C,)
    color: Array          # (C,) int32
    num_colors: int = field(metadata=dict(static=True))
    xpbd: bool = field(metadata=dict(static=True))

    k = 2

    @staticmethod
    def create(idx, rest_length, stiffness, xpbd_mode: bool = True) -> "DistanceBatch":
        idx = np.asarray(idx, np.int32)
        color, num_colors = greedy_color(idx)
        c = idx.shape[0]
        return DistanceBatch(
            idx=jnp.asarray(idx),
            rest_length=_as_f32(rest_length, (c,)),
            stiffness=_as_f32(stiffness, (c,)),
            color=jnp.asarray(color),
            num_colors=num_colors,
            xpbd=xpbd_mode,
        )

    def init_lambda(self) -> Array:
        return jnp.zeros((self.idx.shape[0],), jnp.float32)

    def solve(self, x: Array, inv_mass: Array, lam: Array, dt) -> Tuple[Array, Array]:
        """Returns ``(corr (C, 2, 3), new_lam)``."""
        p = x[self.idx]               # (C, 2, 3)
        w = inv_mass[self.idx]        # (C, 2)
        if self.xpbd:
            corr, new_lam = jax.vmap(xpbd.solve_distance, in_axes=(0,) * 8)(
                p[:, 0], w[:, 0], p[:, 1], w[:, 1],
                self.rest_length, self.stiffness,
                jnp.broadcast_to(jnp.float32(dt), lam.shape), lam,
            )
            return corr, new_lam
        corr = jax.vmap(pbd.solve_distance)(
            p[:, 0], w[:, 0], p[:, 1], w[:, 1], self.rest_length, self.stiffness
        )
        return corr, lam


@_register
@dataclass(frozen=True)
class IsometricBendingBatch:
    """Isometric (quadratic) bending over interior-edge stencils — batched
    ``IsometricBendingConstraint_XPBD`` (``Constraints.cpp``; kernel
    ``XPBD.cpp:112-213``). ``idx`` order is (p0, p1, p2, p3) with (p2, p3)
    the shared edge, matching ``SimulationModel::addBendingConstraints``.
    """

    idx: Array        # (C, 4) int32
    q_mat: Array      # (C, 4, 4) precomputed Hessian Q
    stiffness: Array  # (C,)
    color: Array
    num_colors: int = field(metadata=dict(static=True))
    xpbd: bool = field(metadata=dict(static=True))

    k = 4

    @staticmethod
    def create(idx, x0, stiffness, xpbd_mode: bool = True) -> "IsometricBendingBatch":
        idx = np.asarray(idx, np.int32)
        color, num_colors = greedy_color(idx)
        c = idx.shape[0]
        q_mat = jnp.asarray(_init_isometric_bending_np(np.asarray(x0)[idx]))
        return IsometricBendingBatch(
            idx=jnp.asarray(idx), q_mat=q_mat,
            stiffness=_as_f32(stiffness, (c,)),
            color=jnp.asarray(color), num_colors=num_colors, xpbd=xpbd_mode,
        )

    def init_lambda(self) -> Array:
        return jnp.zeros((self.idx.shape[0],), jnp.float32)

    def solve(self, x, inv_mass, lam, dt):
        p = x[self.idx]
        w = inv_mass[self.idx]
        if self.xpbd:
            corr, new_lam = jax.vmap(xpbd.solve_isometric_bending)(
                p[:, 0], w[:, 0], p[:, 1], w[:, 1], p[:, 2], w[:, 2],
                p[:, 3], w[:, 3], self.q_mat, self.stiffness,
                jnp.broadcast_to(jnp.float32(dt), lam.shape), lam,
            )
            return corr, new_lam
        corr = jax.vmap(pbd.solve_isometric_bending)(
            p[:, 0], w[:, 0], p[:, 1], w[:, 1], p[:, 2], w[:, 2],
            p[:, 3], w[:, 3], self.q_mat, self.stiffness,
        )
        return corr, lam


@_register
@dataclass(frozen=True)
class DihedralBatch:
    """Classic dihedral-angle bending (``DihedralConstraint``,
    ``Constraints.cpp``; kernel ``PositionBasedDynamics.cpp``). ``idx`` order
    (p0, p1, p2, p3) with (p2, p3) the shared edge and rest angle from the
    initial configuration."""

    idx: Array         # (C, 4)
    rest_angle: Array  # (C,)
    stiffness: Array   # (C,)
    color: Array
    num_colors: int = field(metadata=dict(static=True))

    k = 4

    @staticmethod
    def create(idx, x0, stiffness) -> "DihedralBatch":
        idx = np.asarray(idx, np.int32)
        color, num_colors = greedy_color(idx)
        c = idx.shape[0]
        x0 = np.asarray(x0, np.float32)
        p0, p1, p2, p3 = (x0[idx[:, i]] for i in range(4))
        # rest dihedral angle between triangle normals, as in
        # DihedralConstraint::initConstraint.
        n1 = np.cross(p2 - p0, p3 - p0)
        n1 /= np.maximum((n1 * n1).sum(-1, keepdims=True), 1e-24)
        n2 = np.cross(p3 - p1, p2 - p1)
        n2 /= np.maximum((n2 * n2).sum(-1, keepdims=True), 1e-24)
        n1u = n1 / np.maximum(np.linalg.norm(n1, axis=-1, keepdims=True), 1e-12)
        n2u = n2 / np.maximum(np.linalg.norm(n2, axis=-1, keepdims=True), 1e-12)
        rest = np.arccos(np.clip((n1u * n2u).sum(-1), -1.0, 1.0))
        return DihedralBatch(
            idx=jnp.asarray(idx), rest_angle=jnp.asarray(rest, jnp.float32),
            stiffness=_as_f32(stiffness, (c,)),
            color=jnp.asarray(color), num_colors=num_colors,
        )

    def init_lambda(self) -> Array:
        return jnp.zeros((self.idx.shape[0],), jnp.float32)

    def solve(self, x, inv_mass, lam, dt):
        p = x[self.idx]
        w = inv_mass[self.idx]
        corr = jax.vmap(pbd.solve_dihedral)(
            p[:, 0], w[:, 0], p[:, 1], w[:, 1], p[:, 2], w[:, 2],
            p[:, 3], w[:, 3], self.rest_angle, self.stiffness,
        )
        return corr, lam


@_register
@dataclass(frozen=True)
class VolumeBatch:
    """Tetrahedral volume conservation — batched ``VolumeConstraint_XPBD``
    (``Constraints.cpp``; kernel ``XPBD.cpp:63-109``)."""

    idx: Array          # (C, 4)
    rest_volume: Array  # (C,)
    stiffness: Array    # (C,)
    color: Array
    num_colors: int = field(metadata=dict(static=True))
    xpbd: bool = field(metadata=dict(static=True))

    k = 4

    @staticmethod
    def create(idx, x0, stiffness, xpbd_mode: bool = True) -> "VolumeBatch":
        idx = np.asarray(idx, np.int32)
        color, num_colors = greedy_color(idx)
        c = idx.shape[0]
        x0 = np.asarray(x0, np.float64)
        p0, p1, p2, p3 = (x0[idx[:, i]] for i in range(4))
        rest = np.einsum("cd,cd->c", np.cross(p1 - p0, p2 - p0), p3 - p0) / 6.0
        return VolumeBatch(
            idx=jnp.asarray(idx),
            rest_volume=jnp.asarray(rest, jnp.float32),
            stiffness=_as_f32(stiffness, (c,)),
            color=jnp.asarray(color), num_colors=num_colors, xpbd=xpbd_mode,
        )

    def init_lambda(self) -> Array:
        return jnp.zeros((self.idx.shape[0],), jnp.float32)

    def solve(self, x, inv_mass, lam, dt):
        p = x[self.idx]
        w = inv_mass[self.idx]
        if self.xpbd:
            corr, new_lam = jax.vmap(xpbd.solve_volume)(
                p[:, 0], w[:, 0], p[:, 1], w[:, 1], p[:, 2], w[:, 2],
                p[:, 3], w[:, 3], self.rest_volume, self.stiffness,
                jnp.broadcast_to(jnp.float32(dt), lam.shape), lam,
            )
            return corr, new_lam
        corr = jax.vmap(pbd.solve_volume)(
            p[:, 0], w[:, 0], p[:, 1], w[:, 1], p[:, 2], w[:, 2],
            p[:, 3], w[:, 3], self.rest_volume, self.stiffness,
        )
        return corr, lam


@_register
@dataclass(frozen=True)
class FEMTetraBatch:
    """XPBD FEM tetra constraints (St. Venant–Kirchhoff, inversion-safe) —
    batched ``XPBD_FEMTetConstraint`` (``Constraints.cpp:1851``; kernel
    ``XPBD.cpp:217-294``)."""

    idx: Array            # (C, 4)
    rest_volume: Array    # (C,)
    inv_rest_mat: Array   # (C, 3, 3)
    youngs: Array         # (C,)
    poisson: Array        # (C,)
    color: Array
    num_colors: int = field(metadata=dict(static=True))

    k = 4

    @staticmethod
    def create(idx, x0, youngs, poisson) -> "FEMTetraBatch":
        idx = np.asarray(idx, np.int32)
        color, num_colors = greedy_color(idx)
        c = idx.shape[0]
        x0 = np.asarray(x0, np.float64)
        p0, p1, p2, p3 = (x0[idx[:, i]] for i in range(4))
        rest = np.abs(
            np.einsum("cd,cd->c", np.cross(p1 - p0, p2 - p0), p3 - p0) / 6.0
        )
        # D_m columns are edge vectors pᵢ − p3 (XPBD::init_FEMTetraConstraint).
        dm = np.stack([p0 - p3, p1 - p3, p2 - p3], axis=-1)  # (C, 3, 3)
        inv_rest = np.linalg.inv(dm)
        return FEMTetraBatch(
            idx=jnp.asarray(idx),
            rest_volume=jnp.asarray(rest, jnp.float32),
            inv_rest_mat=jnp.asarray(inv_rest, jnp.float32),
            youngs=_as_f32(youngs, (c,)), poisson=_as_f32(poisson, (c,)),
            color=jnp.asarray(color), num_colors=num_colors,
        )

    def init_lambda(self) -> Array:
        return jnp.zeros((self.idx.shape[0],), jnp.float32)

    def solve(self, x, inv_mass, lam, dt):
        p = x[self.idx]
        w = inv_mass[self.idx]
        corr, new_lam = jax.vmap(
            xpbd.solve_fem_tetra, in_axes=(0,) * 14
        )(
            p[:, 0], w[:, 0], p[:, 1], w[:, 1], p[:, 2], w[:, 2],
            p[:, 3], w[:, 3],
            self.rest_volume, self.inv_rest_mat, self.youngs, self.poisson,
            jnp.broadcast_to(jnp.float32(dt), lam.shape), lam,
        )
        return corr, new_lam


# ---------------------------------------------------------------------------
# Cosserat rod batches (touch positions AND orientation quaternions)
# ---------------------------------------------------------------------------


@_register
@dataclass(frozen=True)
class StretchShearBatch:
    """Cosserat stretch-shear constraints — batched ``StretchShearConstraint``
    (``Constraints.h:566-583``; kernel ``PositionBasedElasticRods.cpp:20-55``).
    Couples particle pair (idx_p) with one orientation quaternion (idx_q)."""

    idx_p: Array        # (C, 2) particle indices
    idx_q: Array        # (C,) orientation indices
    rest_length: Array  # (C,)
    stretch_ks: Array   # (C, 3) per-axis stiffness in the material frame
    color: Array        # colored over the union of particle & quaternion ids
    num_colors: int = field(metadata=dict(static=True))

    k = 2

    @staticmethod
    def create(idx_p, idx_q, rest_length, stretch_ks) -> "StretchShearBatch":
        idx_p = np.asarray(idx_p, np.int32)
        idx_q = np.asarray(idx_q, np.int32)
        c = idx_p.shape[0]
        # Color over combined (particle, quaternion) incidence so no two
        # same-color constraints share either kind of item.
        combined = np.concatenate(
            [idx_p, idx_q[:, None] + 2**20], axis=1
        )
        color, num_colors = greedy_color(combined)
        ks = np.broadcast_to(np.asarray(stretch_ks, np.float32), (c, 3)).copy()
        return StretchShearBatch(
            idx_p=jnp.asarray(idx_p), idx_q=jnp.asarray(idx_q),
            rest_length=_as_f32(rest_length, (c,)),
            stretch_ks=jnp.asarray(ks),
            color=jnp.asarray(color), num_colors=num_colors,
        )

    def solve(self, x, inv_mass, q, inv_mass_q):
        p = x[self.idx_p]
        w = inv_mass[self.idx_p]
        qg = q[self.idx_q]
        wq = inv_mass_q[self.idx_q]
        corr0, corr1, corrq = jax.vmap(rods.solve_stretch_shear)(
            p[:, 0], w[:, 0], p[:, 1], w[:, 1], qg, wq,
            self.stretch_ks, self.rest_length,
        )
        return jnp.stack([corr0, corr1], axis=1), corrq[:, None, :]


@_register
@dataclass(frozen=True)
class BendTwistBatch:
    """Cosserat bend-twist constraints on neighboring frames — batched
    ``BendTwistConstraint`` (``Constraints.h:584-600``; kernel
    ``PositionBasedElasticRods.cpp:57-81``)."""

    idx_q: Array         # (C, 2) orientation indices
    rest_darboux: Array  # (C, 4)
    bend_ks: Array       # (C, 3) (bendingX, bendingY, twisting) stiffness
    color: Array
    num_colors: int = field(metadata=dict(static=True))

    k = 2

    @staticmethod
    def create(idx_q, q0, bend_ks) -> "BendTwistBatch":
        idx_q = np.asarray(idx_q, np.int32)
        color, num_colors = greedy_color(idx_q)
        c = idx_q.shape[0]
        qs = np.asarray(q0, np.float64)[idx_q]
        # rest Darboux Ω₀ = q̄0 ⊗ q1 (host-side; cf. ops.rods.rest_darboux)
        conj = qs[:, 0] * np.array([1.0, -1.0, -1.0, -1.0])
        rest = jnp.asarray(_quat_multiply_np(conj, qs[:, 1]), jnp.float32)
        ks = np.broadcast_to(np.asarray(bend_ks, np.float32), (c, 3)).copy()
        return BendTwistBatch(
            idx_q=jnp.asarray(idx_q), rest_darboux=rest,
            bend_ks=jnp.asarray(ks),
            color=jnp.asarray(color), num_colors=num_colors,
        )

    def solve(self, q, inv_mass_q):
        qs = q[self.idx_q]
        wq = inv_mass_q[self.idx_q]
        corrq0, corrq1 = jax.vmap(rods.solve_bend_twist)(
            qs[:, 0], wq[:, 0], qs[:, 1], wq[:, 1],
            self.bend_ks, self.rest_darboux,
        )
        return jnp.stack([corrq0, corrq1], axis=1)


# ---------------------------------------------------------------------------
# The constraint set — scene-level container in solve order
# ---------------------------------------------------------------------------

PARTICLE_BATCH_ORDER = (
    "distance", "fem_tetra", "volume", "dihedral", "isometric_bending",
)


@_register
@dataclass(frozen=True)
class ConstraintSet:
    """All constraint batches of a scene, solved in a fixed family order per
    iteration (the batched analogue of the reference's constraint list;
    family order mirrors typical ``SimulationModel`` insertion order:
    structural before bending, cf. ``SimulationModel.cpp:1125-1240``).
    ``joints`` holds the rigid-body joint batches (``solver/joints.py``),
    one per joint kind, solved after the particle/rod families."""

    distance: Optional[DistanceBatch] = None
    fem_tetra: Optional[FEMTetraBatch] = None
    volume: Optional[VolumeBatch] = None
    dihedral: Optional[DihedralBatch] = None
    isometric_bending: Optional[IsometricBendingBatch] = None
    stretch_shear: Optional[StretchShearBatch] = None
    bend_twist: Optional[BendTwistBatch] = None
    joints: Tuple = ()

    def particle_batches(self):
        return [
            (name, getattr(self, name))
            for name in PARTICLE_BATCH_ORDER
            if getattr(self, name) is not None
        ]

    def init_lambdas(self):
        return {
            name: b.init_lambda() for name, b in self.particle_batches()
        }

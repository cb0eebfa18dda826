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

from ..ops import ghost_rods, pbd, quaternion as quat, rods, xpbd
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


_SCATTER_TILE = 512


def make_scatter_plan(n: int, idx_np):
    """Build-time plan turning a scatter-add at STATIC indices into a
    permutation + segmented prefix sums — XLA's TPU scatter-add costs
    ~15-20 ns/row (serialized duplicate handling) while the planned form
    measured 3.3× faster at 1.4M rows (docs/PERF.md r04).

    The reduction is two-level to keep f32 rounding LOCAL: rows are
    permuted into vertex order and cumsummed within 512-row tiles only;
    tile prefixes accumulate in f64 (tiny — one row per tile). A plain
    global f32 cumsum would put ~ε·Σ|corr| of error on every segment
    difference, which at 1M rows rivals the corrections themselves."""
    import numpy as np

    flat = np.asarray(idx_np).reshape(-1)
    m = flat.size
    order = np.argsort(flat, kind="stable").astype(np.int32)
    counts = np.bincount(flat, minlength=n)[:n]
    ends = np.cumsum(counts).astype(np.int64)
    starts = ends - counts
    t = _SCATTER_TILE
    n_tiles = -(-m // t)
    # boundary i -> flattened (tile, offset) index into the padded
    # per-tile inclusive-prefix array with a leading zero row (t+1 wide)
    def _enc(i):
        q, r = i // t, i % t
        return (q * (t + 1) + r).astype(np.int32)

    # numpy (not jnp) so a plan cached on a batch object is safe to
    # reuse across jit traces — device constants created inside one
    # trace would leak as tracers into the next
    return dict(
        perm=order,
        starts=_enc(starts),
        ends=_enc(ends),
        tile_s=(starts // t).astype(np.int32),
        tile_e=(ends // t).astype(np.int32),
        n_tiles=int(n_tiles), m=int(m),
    )


def scatter_add_planned(plan, corr: Array) -> Array:
    """Apply :func:`make_scatter_plan` to ``corr (C, k, d)``."""
    d = corr.shape[-1]
    t = _SCATTER_TILE
    rows = corr.reshape(-1, d)[jnp.asarray(plan["perm"])]
    pad = plan["n_tiles"] * t - plan["m"]
    if pad:
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad, d), rows.dtype)], 0)
    tiles = rows.reshape(plan["n_tiles"], t, d)
    cs = jnp.cumsum(tiles, axis=1)                      # tile-local, f32
    # exclusive tile prefixes in f64 when x64 is enabled (one row per
    # tile — cheap) so cross-tile differences carry no large-magnitude
    # cancellation; under default f32 the cross-tile error is bounded by
    # ε·Σ|corr| ONLY at tile crossings (consecutive segments mostly
    # share a tile, where cancellation is exact)
    import jax as _jax
    acc_dt = jnp.float64 if _jax.config.jax_enable_x64 else jnp.float32
    pre = jnp.cumsum(cs[:, -1].astype(acc_dt), axis=0)
    pre = jnp.concatenate(
        [jnp.zeros((1, d), acc_dt), pre[:-1]], 0)
    cs0 = jnp.concatenate(
        [jnp.zeros((plan["n_tiles"], 1, d), rows.dtype), cs],
        axis=1).reshape(-1, d)
    intra = (cs0[jnp.asarray(plan["ends"])]
             - cs0[jnp.asarray(plan["starts"])])        # f32, tile-local
    inter = (pre[jnp.asarray(plan["tile_e"])]
             - pre[jnp.asarray(plan["tile_s"])])        # f64, zero when
    return (intra + inter.astype(corr.dtype))           # tiles equal


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


def _init_isometric_bending_s_np(p: np.ndarray) -> np.ndarray:
    """Rank-1 factor of the isometric-bending Hessian: the reference's
    ``Q(j,k) = coef·K[j]·K[k]`` (``XPBD.cpp:136-148``) is exactly
    ``Q = −S Sᵀ`` with ``S = K·√(−coef)`` (coef < 0 since triangle areas
    are positive). Storing S instead of Q quarters the memory stream and
    turns the 4×4 stencil contraction into one dot: ``C = −½‖Σⱼ Sⱼxⱼ‖²``.
    ``p (C, 4, 3)`` in stencil order; returns ``S (C, 4)`` in the kernel's
    internal (p2, p3, p0, p1) index order, matching the Q variant."""
    p = np.asarray(p, np.float64)
    x0, x1, x2, x3 = p[:, 2], p[:, 3], p[:, 0], p[:, 1]
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
    coef = 3.0 / (2.0 * (a0 + a1))
    k = np.stack([c03 + c04, c01 + c02, -c01 - c03, -c02 - c04], axis=1)
    return (np.sqrt(coef)[:, None] * k).astype(np.float32)


def _init_fem_triangle_np(p: np.ndarray):
    """Host-side batched init for FEM triangles — 2D rest-edge matrix in an
    in-plane orthonormal basis (axis1 = normalized p1−p0, axis2 = n×axis1)
    and rest area, per ``init_FEMTriangleConstraint``
    (``PositionBasedDynamics.cpp:808-840``). ``p (C, 3, 3)``.
    Returns ``(area (C,), inv_rest_mat (C, 2, 2))``."""
    p = np.asarray(p, np.float64)
    p0, p1, p2 = p[:, 0], p[:, 1], p[:, 2]
    normal = np.cross(p1 - p0, p2 - p0)
    area = 0.5 * np.linalg.norm(normal, axis=-1)
    a1 = p1 - p0
    a1 = a1 / np.maximum(np.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    a2 = np.cross(normal, a1)
    a2 = a2 / np.maximum(np.linalg.norm(a2, axis=-1, keepdims=True), 1e-12)
    # 2D coords (axis2·p, axis1·p); rest matrix cols are (p0−p2, p1−p2)
    def proj(v):
        return np.stack([(v * a2).sum(-1), (v * a1).sum(-1)], axis=-1)
    c0 = proj(p0 - p2)
    c1 = proj(p1 - p2)
    rest = np.stack([c0, c1], axis=-1)  # (C, 2, 2)
    det = np.linalg.det(rest)
    bad = np.abs(det) < 1e-12
    rest[bad] = np.eye(2)
    inv = np.linalg.inv(rest)
    inv[bad] = 0.0
    return area.astype(np.float32), inv.astype(np.float32)


def _init_strain_triangle_np(p: np.ndarray) -> np.ndarray:
    """Host-side batched init for strain-based triangles: inverse of the
    2×2 rest matrix built from the x/y components of (p1−p0, p2−p0) —
    exactly the reference's planar convention
    (``init_StrainTriangleConstraint``, ``PositionBasedDynamics.cpp:562-588``).
    ``p (C, 3, 3)`` → ``(C, 2, 2)``."""
    p = np.asarray(p, np.float64)
    e1 = p[:, 1] - p[:, 0]
    e2 = p[:, 2] - p[:, 0]
    rest = np.stack([e1[:, :2], e2[:, :2]], axis=-1)  # (C, 2, 2)
    det = np.linalg.det(rest)
    bad = np.abs(det) < 1e-12
    rest[bad] = np.eye(2)
    inv = np.linalg.inv(rest)
    inv[bad] = 0.0
    return inv.astype(np.float32)


def _init_strain_tetra_np(p: np.ndarray) -> np.ndarray:
    """Inverse 3×3 rest matrix with columns (p1−p0, p2−p0, p3−p0)
    (``init_StrainTetraConstraint``, ``PositionBasedDynamics.cpp:691-708``).
    ``p (C, 4, 3)`` → ``(C, 3, 3)``."""
    p = np.asarray(p, np.float64)
    rest = np.stack([p[:, 1] - p[:, 0], p[:, 2] - p[:, 0],
                     p[:, 3] - p[:, 0]], axis=-1)
    det = np.linalg.det(rest)
    bad = np.abs(det) < 1e-12
    rest[bad] = np.eye(3)
    inv = np.linalg.inv(rest)
    inv[bad] = 0.0
    return inv.astype(np.float32)


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
    """FEM tetra constraints (St. Venant–Kirchhoff, inversion-safe) —
    batched ``XPBD_FEMTetConstraint`` (``Constraints.cpp:1851``; kernel
    ``XPBD.cpp:217-294``) when ``xpbd``, else the classic
    ``FEMTetConstraint`` (kernel ``PositionBasedDynamics.cpp:1109-1170``)."""

    idx: Array            # (C, 4)
    rest_volume: Array    # (C,)
    inv_rest_mat: Array   # (C, 3, 3)
    youngs: Array         # (C,)
    poisson: Array        # (C,)
    color: Array
    num_colors: int = field(metadata=dict(static=True))
    xpbd: bool = field(default=True, metadata=dict(static=True))

    k = 4

    @staticmethod
    def create(idx, x0, youngs, poisson, xpbd_mode: bool = True) -> "FEMTetraBatch":
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
            xpbd=bool(xpbd_mode),
        )

    def init_lambda(self) -> Array:
        return jnp.zeros((self.idx.shape[0],), jnp.float32)

    def solve(self, x, inv_mass, lam, dt):
        p = x[self.idx]
        w = inv_mass[self.idx]
        if not self.xpbd:
            corr = jax.vmap(pbd.solve_fem_tetra_classic)(
                p[:, 0], w[:, 0], p[:, 1], w[:, 1], p[:, 2], w[:, 2],
                p[:, 3], w[:, 3],
                self.rest_volume, self.inv_rest_mat, self.youngs, self.poisson,
            )
            return corr, lam
        corr, new_lam = jax.vmap(
            xpbd.solve_fem_tetra, in_axes=(0,) * 14
        )(
            p[:, 0], w[:, 0], p[:, 1], w[:, 1], p[:, 2], w[:, 2],
            p[:, 3], w[:, 3],
            self.rest_volume, self.inv_rest_mat, self.youngs, self.poisson,
            jnp.broadcast_to(jnp.float32(dt), lam.shape), lam,
        )
        return corr, new_lam


@_register
@dataclass(frozen=True)
class FEMTriangleBatch:
    """Orthotropic St. Venant–Kirchhoff membrane triangles — batched
    ``FEMTriangleConstraint`` (``Constraints.cpp``; kernel
    ``PositionBasedDynamics.cpp:843-931``). Cloth method 2 of
    ``addClothConstraints`` (``SimulationModel.cpp:1144-1156``)."""

    idx: Array           # (C, 3)
    area: Array          # (C,)
    inv_rest_mat: Array  # (C, 2, 2)
    youngs_x: Array      # (C,)
    youngs_y: Array
    youngs_shear: Array
    poisson_xy: Array
    poisson_yx: Array
    color: Array
    num_colors: int = field(metadata=dict(static=True))

    k = 3

    @staticmethod
    def create(idx, x0, youngs_x, youngs_y, youngs_shear,
               poisson_xy, poisson_yx) -> "FEMTriangleBatch":
        idx = np.asarray(idx, np.int32)
        color, num_colors = greedy_color(idx)
        c = idx.shape[0]
        area, inv = _init_fem_triangle_np(np.asarray(x0)[idx])
        return FEMTriangleBatch(
            idx=jnp.asarray(idx), area=jnp.asarray(area),
            inv_rest_mat=jnp.asarray(inv),
            youngs_x=_as_f32(youngs_x, (c,)), youngs_y=_as_f32(youngs_y, (c,)),
            youngs_shear=_as_f32(youngs_shear, (c,)),
            poisson_xy=_as_f32(poisson_xy, (c,)),
            poisson_yx=_as_f32(poisson_yx, (c,)),
            color=jnp.asarray(color), num_colors=num_colors,
        )

    def init_lambda(self) -> Array:
        return jnp.zeros((0,), jnp.float32)

    def solve(self, x, inv_mass, lam, dt):
        p = x[self.idx]
        w = inv_mass[self.idx]
        corr = jax.vmap(pbd.solve_fem_triangle)(
            p[:, 0], w[:, 0], p[:, 1], w[:, 1], p[:, 2], w[:, 2],
            self.area, self.inv_rest_mat,
            self.youngs_x, self.youngs_y, self.youngs_shear,
            self.poisson_xy, self.poisson_yx,
        )
        return corr, lam


@_register
@dataclass(frozen=True)
class StrainTriangleBatch:
    """Strain-based-dynamics triangles (Müller 2014) — batched
    ``StrainTriangleConstraint`` (kernel
    ``PositionBasedDynamics.cpp:590-688``). Cloth method 3."""

    idx: Array           # (C, 3)
    inv_rest_mat: Array  # (C, 2, 2)
    stretch_k: Array     # (C, 2) (xx, yy)
    shear_k: Array       # (C, 1) (xy,)
    color: Array
    num_colors: int = field(metadata=dict(static=True))
    normalize_stretch: bool = field(metadata=dict(static=True))
    normalize_shear: bool = field(metadata=dict(static=True))

    k = 3

    @staticmethod
    def create(idx, x0, stretch_k, shear_k, normalize_stretch=False,
               normalize_shear=False) -> "StrainTriangleBatch":
        idx = np.asarray(idx, np.int32)
        color, num_colors = greedy_color(idx)
        c = idx.shape[0]
        inv = _init_strain_triangle_np(np.asarray(x0)[idx])
        return StrainTriangleBatch(
            idx=jnp.asarray(idx), inv_rest_mat=jnp.asarray(inv),
            stretch_k=jnp.broadcast_to(
                jnp.asarray(stretch_k, jnp.float32), (c, 2)),
            shear_k=jnp.broadcast_to(
                jnp.asarray(shear_k, jnp.float32).reshape(-1), (c, 1))
            if np.ndim(shear_k) == 0 else
            jnp.broadcast_to(jnp.asarray(shear_k, jnp.float32), (c, 1)),
            color=jnp.asarray(color), num_colors=num_colors,
            normalize_stretch=bool(normalize_stretch),
            normalize_shear=bool(normalize_shear),
        )

    def init_lambda(self) -> Array:
        return jnp.zeros((0,), jnp.float32)

    def solve(self, x, inv_mass, lam, dt):
        from functools import partial
        p = x[self.idx]
        w = inv_mass[self.idx]
        fn = partial(pbd.solve_strain_triangle,
                     normalize_stretch=self.normalize_stretch,
                     normalize_shear=self.normalize_shear)
        corr = jax.vmap(fn)(
            p[:, 0], w[:, 0], p[:, 1], w[:, 1], p[:, 2], w[:, 2],
            self.inv_rest_mat, self.stretch_k, self.shear_k,
        )
        return corr, lam


@_register
@dataclass(frozen=True)
class StrainTetraBatch:
    """Strain-based-dynamics tetrahedra — batched ``StrainTetConstraint``
    (kernel ``PositionBasedDynamics.cpp:711-805``). Solid method 4 of
    ``addSolidConstraints`` (``SimulationModel.cpp``)."""

    idx: Array           # (C, 4)
    inv_rest_mat: Array  # (C, 3, 3)
    stretch_k: Array     # (C, 3)
    shear_k: Array       # (C, 3)
    color: Array
    num_colors: int = field(metadata=dict(static=True))
    normalize_stretch: bool = field(metadata=dict(static=True))
    normalize_shear: bool = field(metadata=dict(static=True))

    k = 4

    @staticmethod
    def create(idx, x0, stretch_k, shear_k, normalize_stretch=False,
               normalize_shear=False) -> "StrainTetraBatch":
        idx = np.asarray(idx, np.int32)
        color, num_colors = greedy_color(idx)
        c = idx.shape[0]
        inv = _init_strain_tetra_np(np.asarray(x0)[idx])
        return StrainTetraBatch(
            idx=jnp.asarray(idx), inv_rest_mat=jnp.asarray(inv),
            stretch_k=jnp.broadcast_to(
                jnp.asarray(stretch_k, jnp.float32), (c, 3)),
            shear_k=jnp.broadcast_to(
                jnp.asarray(shear_k, jnp.float32), (c, 3)),
            color=jnp.asarray(color), num_colors=num_colors,
            normalize_stretch=bool(normalize_stretch),
            normalize_shear=bool(normalize_shear),
        )

    def init_lambda(self) -> Array:
        return jnp.zeros((0,), jnp.float32)

    def solve(self, x, inv_mass, lam, dt):
        from functools import partial
        p = x[self.idx]
        w = inv_mass[self.idx]
        fn = partial(pbd.solve_strain_tetra,
                     normalize_stretch=self.normalize_stretch,
                     normalize_shear=self.normalize_shear)
        corr = jax.vmap(fn)(
            p[:, 0], w[:, 0], p[:, 1], w[:, 1], p[:, 2], w[:, 2],
            p[:, 3], w[:, 3], self.inv_rest_mat,
            self.stretch_k, self.shear_k,
        )
        return corr, lam


@_register
@dataclass(frozen=True)
class ShapeMatchingBatch:
    """Cluster shape matching — batched ``ShapeMatchingConstraint``
    (``Constraints.h:459-491``; kernel ``PositionBasedDynamics.cpp:481-558``).
    Clusters are padded to a fixed width K with ``mask``; per-slot corrections
    are pre-scaled by 1/#clusters-containing-the-vertex exactly as solid
    method 5 passes ``numClusters`` (``SimulationModel.cpp`` addSolidConstraints),
    so the batch is *self-averaged*: the stepper must add corrections without
    the Jacobi count division."""

    idx: Array         # (C, K) int32, padded with 0
    mask: Array        # (C, K) float32
    inv_nc: Array      # (C, K) 1/#clusters per member (0 on pads)
    x0_members: Array  # (C, K, 3) rest positions
    rest_cm: Array     # (C, 3)
    stiffness: Array   # (C,)
    color: Array
    num_colors: int = field(metadata=dict(static=True))

    self_averaged = True

    @staticmethod
    def create(clusters, x0, stiffness, num_clusters=None,
               inv_mass=None) -> "ShapeMatchingBatch":
        """``clusters``: list of index lists (or (C, K) array); ``num_clusters``
        optional per-slot cluster counts (defaults to global membership
        counts over all clusters, the reference's ``vTets`` sizes).
        ``inv_mass`` optionally provides final inverse masses so the rest
        centers of mass are correct immediately (defaults to all-dynamic
        unit masses); call :meth:`finalize` to re-weight later."""
        if isinstance(clusters, np.ndarray) and clusters.ndim == 2:
            clusters = [list(r) for r in clusters]
        kmax = max(len(c) for c in clusters)
        cn = len(clusters)
        idx = np.zeros((cn, kmax), np.int32)
        mask = np.zeros((cn, kmax), np.float32)
        for r, mem in enumerate(clusters):
            idx[r, :len(mem)] = mem
            mask[r, :len(mem)] = 1.0
        x0 = np.asarray(x0, np.float64)
        if num_clusters is None:
            counts = np.zeros((x0.shape[0],), np.float64)
            for mem in clusters:
                counts[list(mem)] += 1.0
            nc = counts[idx]
        else:
            nc = np.broadcast_to(np.asarray(num_clusters, np.float64),
                                 idx.shape)
        inv_nc = np.where(mask > 0, 1.0 / np.maximum(nc, 1.0), 0.0)
        # color over cluster membership; pads get unique non-conflicting ids
        conflict = idx.astype(np.int64).copy()
        uid = x0.shape[0]
        pads = mask == 0.0
        conflict[pads] = uid + np.arange(pads.sum())
        color, num_colors = greedy_color(conflict)
        # rest center of mass with the kernel's m = mask/(w + EPS) weights;
        # build() re-finalizes with the true inverse masses so pinned
        # particles anchor the cluster.
        batch = ShapeMatchingBatch._finish(idx, mask, inv_nc, x0, stiffness,
                                           color, num_colors)
        w = (np.ones((x0.shape[0],)) if inv_mass is None
             else np.asarray(inv_mass, np.float64))
        return batch.finalize(w)

    @staticmethod
    def _finish(idx, mask, inv_nc, x0, stiffness, color, num_colors):
        cn = idx.shape[0]
        return ShapeMatchingBatch(
            idx=jnp.asarray(idx), mask=jnp.asarray(mask),
            inv_nc=jnp.asarray(inv_nc, jnp.float32),
            x0_members=jnp.asarray(x0[idx], jnp.float32),
            rest_cm=jnp.zeros((cn, 3), jnp.float32),  # set by finalize()
            stiffness=_as_f32(stiffness, (cn,)),
            color=jnp.asarray(color), num_colors=num_colors,
        )

    def finalize(self, inv_mass: np.ndarray) -> "ShapeMatchingBatch":
        """Compute rest centers of mass using the final inverse masses
        (must be called after pins are applied, as the reference's
        ``initConstraint`` runs after ``setMass``)."""
        from ..ops.mathutils import EPS as _EPS
        w = np.asarray(inv_mass, np.float64)[np.asarray(self.idx)]
        m = np.asarray(self.mask, np.float64) / (w + _EPS)
        x0m = np.asarray(self.x0_members, np.float64)
        cm = (m[..., None] * x0m).sum(1) / np.maximum(
            m.sum(1)[:, None], 1e-30)
        return dataclasses.replace(
            self, rest_cm=jnp.asarray(cm, jnp.float32))

    def init_lambda(self) -> Array:
        return jnp.zeros((0,), jnp.float32)

    def solve(self, x, inv_mass, lam, dt):
        xs = x[self.idx]
        ws = inv_mass[self.idx]
        corr = jax.vmap(pbd.solve_shape_matching_cluster)(
            xs, self.x0_members, ws, self.rest_cm, self.stiffness, self.mask)
        # only dynamic members receive corrections — the reference's
        # ``m_w[i] != 0`` gate (ShapeMatchingConstraint::solvePositionConstraint)
        corr = corr * (ws > 0.0)[..., None]
        return corr * self.inv_nc[..., None], lam


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
        rest = _quat_multiply_np(conj, qs[:, 1])
        # double-cover sign fix at init (Constraints.cpp:2408-2413):
        # flip Ω₀ when ‖Ω₀ − 1‖² > ‖Ω₀ + 1‖²
        one = np.array([1.0, 0.0, 0.0, 0.0])
        flip = (np.sum((rest - one) ** 2, axis=-1)
                > np.sum((rest + one) ** 2, axis=-1))
        rest = jnp.asarray(np.where(flip[:, None], -rest, rest), jnp.float32)
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

@_register
@dataclass(frozen=True)
class PerpendicularBisectorBatch:
    """Ghost-rod constraint keeping each ghost point on its edge's
    perpendicular bisector (``PerpendiculaBisectorConstraint``;
    kernel ``PositionBasedElasticRods.cpp:82-107``). ``idx`` = (edge p0,
    edge p1, ghost)."""

    idx: Array         # (C, 3)
    stiffness: Array   # (C,)
    color: Array
    num_colors: int = field(metadata=dict(static=True))

    k = 3

    @staticmethod
    def create(idx, stiffness=1.0) -> "PerpendicularBisectorBatch":
        idx = np.asarray(idx, np.int32)
        color, num_colors = greedy_color(idx)
        return PerpendicularBisectorBatch(
            idx=jnp.asarray(idx), stiffness=_as_f32(stiffness, (len(idx),)),
            color=jnp.asarray(color), num_colors=num_colors)

    def init_lambda(self) -> Array:
        return jnp.zeros((0,), jnp.float32)

    def solve(self, x, inv_mass, lam, dt):
        p = x[self.idx]
        w = inv_mass[self.idx]
        c0, c1, c2 = jax.vmap(ghost_rods.solve_perpendicular_bisector)(
            p[:, 0], w[:, 0], p[:, 1], w[:, 1], p[:, 2], w[:, 2],
            self.stiffness)
        return jnp.stack([c0, c1, c2], axis=1), lam


@_register
@dataclass(frozen=True)
class GhostEdgeDistanceBatch:
    """Ghost-point-to-edge-midpoint distance
    (``GhostPointEdgeDistanceConstraint``; kernel
    ``PositionBasedElasticRods.cpp:109-136``)."""

    idx: Array         # (C, 3)
    rest: Array        # (C,)
    stiffness: Array   # (C,)
    color: Array
    num_colors: int = field(metadata=dict(static=True))

    k = 3

    @staticmethod
    def create(idx, x0, stiffness=1.0) -> "GhostEdgeDistanceBatch":
        idx = np.asarray(idx, np.int32)
        color, num_colors = greedy_color(idx)
        x0 = np.asarray(x0, np.float64)
        pm = 0.5 * (x0[idx[:, 0]] + x0[idx[:, 1]])
        rest = np.linalg.norm(x0[idx[:, 2]] - pm, axis=-1)
        return GhostEdgeDistanceBatch(
            idx=jnp.asarray(idx), rest=jnp.asarray(rest, jnp.float32),
            stiffness=_as_f32(stiffness, (len(idx),)),
            color=jnp.asarray(color), num_colors=num_colors)

    def init_lambda(self) -> Array:
        return jnp.zeros((0,), jnp.float32)

    def solve(self, x, inv_mass, lam, dt):
        p = x[self.idx]
        w = inv_mass[self.idx]
        c0, c1, c2 = jax.vmap(ghost_rods.solve_ghost_edge_distance)(
            p[:, 0], w[:, 0], p[:, 1], w[:, 1], p[:, 2], w[:, 2],
            self.stiffness, self.rest)
        return jnp.stack([c0, c1, c2], axis=1), lam


@_register
@dataclass(frozen=True)
class DarbouxVectorBatch:
    """Ghost-rod bend/twist elements (``DarbouxVectorConstraint``; kernel
    ``PositionBasedElasticRods.cpp:138-225``). ``idx`` = (p0, p1, p2,
    ghost0, ghost1) into the global particle array; rest Darboux from the
    rest positions with the demo's mid-edge length 1.0
    (``PositionBasedElasticRodsConstraints.cpp:132-157``)."""

    idx: Array          # (C, 5)
    ks: Array           # (C, 3) bending/twisting stiffness
    rest_darboux: Array  # (C, 3)
    mid_len: Array      # (C,)
    color: Array
    num_colors: int = field(metadata=dict(static=True))

    k = 5

    @staticmethod
    def create(idx, x0, bending_twisting=(0.5, 0.5, 0.5),
               mid_edge_length=1.0) -> "DarbouxVectorBatch":
        idx = np.asarray(idx, np.int32)
        color, num_colors = greedy_color(idx)
        c = idx.shape[0]
        ks = np.broadcast_to(
            np.asarray(bending_twisting, np.float32), (c, 3)).copy()
        ml = np.broadcast_to(np.float32(mid_edge_length), (c,)).copy()
        x0j = jnp.asarray(np.asarray(x0, np.float32))
        rest = jax.vmap(ghost_rods.element_darboux)(
            x0j[idx[:, 0]], x0j[idx[:, 1]], x0j[idx[:, 2]],
            x0j[idx[:, 3]], x0j[idx[:, 4]], jnp.asarray(ml))
        return DarbouxVectorBatch(
            idx=jnp.asarray(idx), ks=jnp.asarray(ks),
            rest_darboux=rest, mid_len=jnp.asarray(ml),
            color=jnp.asarray(color), num_colors=num_colors)

    def init_lambda(self) -> Array:
        return jnp.zeros((0,), jnp.float32)

    def solve(self, x, inv_mass, lam, dt):
        p = x[self.idx]
        w = inv_mass[self.idx]
        corrs = jax.vmap(ghost_rods.solve_darboux_vector)(
            p[:, 0], w[:, 0], p[:, 1], w[:, 1], p[:, 2], w[:, 2],
            p[:, 3], w[:, 3], p[:, 4], w[:, 4],
            self.ks, self.mid_len, self.rest_darboux)
        return jnp.stack(corrs, axis=1), lam


@_register
@dataclass(frozen=True)
class GenericConstraintBatch:
    """User-defined particle constraints solved with autodiff Jacobians
    (``PositionBasedGenericConstraints.h:31-121``; ``jax.jacfwd``
    replaces the finite-difference ``approximateGradient``). ``fn`` maps
    the stacked positions ``(k, 3)`` of one constraint to a ``(dim,)``
    value."""

    idx: Array         # (C, k)
    stiffness: Array   # (C,)
    color: Array
    params: Optional[Array] = None   # (C, p) per-constraint data, passed
    # to ``fn(pts, params_row)`` when present (the reference's userData)
    fn: object = field(default=None, metadata=dict(static=True))
    num_colors: int = field(default=1, metadata=dict(static=True))

    @staticmethod
    def create(fn, idx, stiffness=1.0, params=None
               ) -> "GenericConstraintBatch":
        idx = np.asarray(idx, np.int32)
        if idx.ndim == 1:
            idx = idx[None, :]
        color, num_colors = greedy_color(idx)
        return GenericConstraintBatch(
            idx=jnp.asarray(idx), stiffness=_as_f32(stiffness, (len(idx),)),
            color=jnp.asarray(color),
            params=(None if params is None
                    else jnp.asarray(np.atleast_2d(params), jnp.float32)),
            fn=fn, num_colors=num_colors)

    @property
    def k(self):
        return self.idx.shape[1]

    def init_lambda(self) -> Array:
        return jnp.zeros((0,), jnp.float32)

    def solve(self, x, inv_mass, lam, dt):
        from ..ops.generic import solve_generic_particle_constraint

        p = x[self.idx]
        w = inv_mass[self.idx]
        if self.params is None:
            corr = jax.vmap(
                lambda pts, ws, s: solve_generic_particle_constraint(
                    self.fn, pts, ws, s))(p, w, self.stiffness)
        else:
            corr = jax.vmap(
                lambda pts, ws, s, pr: solve_generic_particle_constraint(
                    lambda pp: self.fn(pp, pr), pts, ws, s))(
                        p, w, self.stiffness, self.params)
        return corr, lam


@_register
@dataclass(frozen=True)
class GenericRigidBatch:
    """User-defined rigid-body constraints
    (``PositionBasedGenericConstraints.h:218-280``). ``fn(x (k, 3),
    q (k, 4)) -> (dim,)``; Jacobians by autodiff, rotations corrected via
    the quaternion G-matrix parametrization."""

    bodies: Array      # (C, k)
    stiffness: Array   # (C,)
    color: Array
    fn: object = field(metadata=dict(static=True))
    num_colors: int = field(metadata=dict(static=True))

    @staticmethod
    def create(fn, bodies, stiffness=1.0) -> "GenericRigidBatch":
        bodies = np.asarray(bodies, np.int32)
        if bodies.ndim == 1:
            bodies = bodies[None, :]
        color, num_colors = greedy_color(bodies)
        return GenericRigidBatch(
            bodies=jnp.asarray(bodies),
            stiffness=_as_f32(stiffness, (len(bodies),)),
            color=jnp.asarray(color), fn=fn, num_colors=num_colors)

    def solve(self, rx, rq, inv_mass, inv_iw):
        from ..ops.generic import solve_generic_rigid_constraint

        x = rx[self.bodies]
        q = rq[self.bodies]
        w = inv_mass[self.bodies]
        iw = inv_iw[self.bodies]
        corr_x, ot = jax.vmap(
            lambda xx, qq, ww, ii, s: solve_generic_rigid_constraint(
                self.fn, xx, qq, ww, ii, s))(x, q, w, iw, self.stiffness)
        corr_q = 0.5 * jax.vmap(jax.vmap(quat.multiply))(
            jax.vmap(jax.vmap(quat.from_vec))(ot), q)
        return corr_x, corr_q


PARTICLE_BATCH_ORDER = (
    "distance", "fem_triangle", "strain_triangle", "fem_tetra",
    "strain_tetra", "volume", "shape_matching", "dihedral",
    "isometric_bending",
    "perpendicular_bisector", "ghost_edge", "darboux_vector",
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
    fem_triangle: Optional[FEMTriangleBatch] = None
    strain_triangle: Optional[StrainTriangleBatch] = None
    fem_tetra: Optional[FEMTetraBatch] = None
    strain_tetra: Optional[StrainTetraBatch] = None
    volume: Optional[VolumeBatch] = None
    shape_matching: Optional[ShapeMatchingBatch] = None
    dihedral: Optional[DihedralBatch] = None
    isometric_bending: Optional[IsometricBendingBatch] = None
    perpendicular_bisector: Optional[PerpendicularBisectorBatch] = None
    ghost_edge: Optional[GhostEdgeDistanceBatch] = None
    darboux_vector: Optional[DarbouxVectorBatch] = None
    generics: Tuple = ()          # GenericConstraintBatch instances
    rigid_generics: Tuple = ()    # GenericRigidBatch instances
    direct_rods: Tuple = ()       # DirectRodBatch instances (stiff rods)
    # overflow slots for families mixing classic/XPBD (or strain flags)
    # in one scene — the reference freely mixes methods per model
    # (SimulationModel::addSolidConstraints), so the builder partitions
    # by flag instead of rejecting (named f"extra{i}" in the solve order)
    extra_batches: Tuple = ()
    stretch_shear: Optional[StretchShearBatch] = None
    bend_twist: Optional[BendTwistBatch] = None
    joints: Tuple = ()
    grid_cloths: Tuple = ()   # structured-grid fast path (solver/grid_cloth.py)
    rod_lattices: Tuple = ()  # uniform-rod fast path (solver/grid_rods.py)
    grid_tets: Tuple = ()     # structured tet-grid fast path (solver/grid_tet.py)
    # build-time-precomputed 1/#constraints-per-item Jacobi denominators,
    # keyed by family name (+ "_q" suffix for quaternion items). Computed by
    # with_jacobi_counts(); the stepper falls back to an in-graph scatter
    # when a key is missing (hand-built ConstraintSets in tests).
    jacobi_inv_counts: dict = field(default_factory=dict)

    def with_jacobi_counts(self, n_particles: int,
                           n_orientations: int = 0) -> "ConstraintSet":
        """Precompute the averaged-Jacobi denominators 1/count for every
        family at build time so they never enter the jitted hot loop (the
        counts are static — they depend only on topology)."""
        inv = {}

        def add(key, n, idx):
            c = _counts(n, np.asarray(idx))
            inv[key] = jnp.asarray((1.0 / c)[:, None], jnp.float32)

        for name, b in self.particle_batches():
            if getattr(b, "self_averaged", False):
                continue
            add(name, n_particles, b.idx)
        if self.stretch_shear is not None:
            add("stretch_shear", n_particles, self.stretch_shear.idx_p)
            add("stretch_shear_q", n_orientations, self.stretch_shear.idx_q)
        if self.bend_twist is not None:
            add("bend_twist_q", n_orientations, self.bend_twist.idx_q)
        return dataclasses.replace(self, jacobi_inv_counts=inv)

    def particle_batches(self):
        named = [
            (name, getattr(self, name))
            for name in PARTICLE_BATCH_ORDER
            if getattr(self, name) is not None
        ]
        named += [(f"generic{i}", b) for i, b in enumerate(self.generics)]
        named += [(f"extra{i}", b) for i, b in enumerate(self.extra_batches)]
        return named

    def init_lambdas(self):
        lams = {
            name: b.init_lambda() for name, b in self.particle_batches()
        }
        for i, gc in enumerate(self.grid_cloths):
            lams[f"grid_cloth{i}"] = gc.init_lambda()
        for i, gt in enumerate(self.grid_tets):
            lams[f"grid_tet{i}"] = gt.init_lambda()
        return lams

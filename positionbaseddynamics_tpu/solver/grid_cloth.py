"""Structured-grid XPBD cloth — the TPU-first fast path for regular
triangle grids (``SimulationModel::addRegularTriangleModel``,
``SimulationModel.cpp:831-903`` + ``addClothConstraints``/
``addBendingConstraints``, ``:1125-1240``).

Why this exists: the generic constraint path gathers/scatters (C, k, 3)
rows at irregular indices, and TPUs execute tiny-row random access ~1000x
off HBM speed-of-light (measured: a single 306k-edge scatter-add costs
~10 ms on v5e while the moved bytes are worth ~15 us). On a *regular*
grid, every constraint family is a fixed stencil, so the whole
gather-solve-scatter round becomes dense shifted-slice arithmetic the XLA
TPU backend fuses into a handful of vector loops — no gather, no scatter,
no indices on device at all.

Families (alternating-diagonal triangulation of ``regular_triangle_grid``):

* distance (cloth methods 1/4): horizontal edges ``(i,j)-(i,j+1)``,
  vertical ``(i,j)-(i+1,j)``, and one diagonal per quad — the main
  diagonal ``(i,j)-(i+1,j+1)`` where ``helper = (i%2==j%2)`` else the
  anti-diagonal ``(i,j+1)-(i+1,j)``.
* isometric bending (bending methods 2/3): one stencil per interior edge;
  flap vertices are parity-blended shifted slices (derived from the same
  triangulation):
    - horizontal edge ``(i,j)-(i,j+1)``, 0<i<H-1: flaps ``(i+1, j+h)``
      and ``(i-1, j+h)``;
    - vertical edge ``(i,j)-(i+1,j)``, 0<j<W-1: flaps ``(i+h, j+1)``
      and ``(i+h, j-1)``;
    - quad diagonal: flaps are the two off-diagonal quad corners.

Solve semantics are identical to the unstructured Jacobi path
(``solver/step.py``): distance family pass (averaged by per-particle
distance-constraint counts), then bending family pass, XPBD lambdas reset
per projection call (``Constraints.cpp:1240-1241``). A regular-grid scene
built structured and unstructured produces the same trajectory up to
float-summation order (asserted in ``tests/test_grid_cloth.py``).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _register(cls):
    data, meta = [], []
    for f in dataclasses.fields(cls):
        (meta if f.metadata.get("static") else data).append(f.name)
    return jax.tree_util.register_dataclass(cls, data_fields=data,
                                            meta_fields=meta)


def _helper_grid(height: int, width: int) -> np.ndarray:
    """``helper(i,j) = (i%2 == j%2)`` over the quad grid (H-1, W-1) —
    the alternating-diagonal parity of ``regular_triangle_grid``."""
    i, j = np.meshgrid(np.arange(height - 1), np.arange(width - 1),
                       indexing="ij")
    return (i % 2 == j % 2)


def _grid_edges_np(height: int, width: int):
    """(a, b) index grids for the 3 distance families, as numpy index
    arrays into the flat (H*W) particle block. Returns dict of
    ``family -> (ai, bi)`` flat index arrays (family grid shape order)."""
    h, w = height, width
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    flat = ii * w + jj

    hz = (flat[:, :-1], flat[:, 1:])                        # (H, W-1)
    vt = (flat[:-1, :], flat[1:, :])                        # (H-1, W)
    hp = _helper_grid(h, w)
    da = np.where(hp, flat[:-1, :-1], flat[:-1, 1:])        # (H-1, W-1)
    db = np.where(hp, flat[1:, 1:], flat[1:, :-1])
    return {"h": hz, "v": vt, "d": (da, db)}


def _bend_stencils_np(height: int, width: int):
    """Flat stencil indices (p0=flap0, p1=flap1, p2=a, p3=b) for the 3
    bending families, in family grid shape. Matches the parity derivation
    in the module docstring."""
    h, w = height, width
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    flat = ii * w + jj
    par = np.zeros((h, w), bool)
    par[: h - 1, : w - 1] = _helper_grid(h, w)

    out = {}
    # horizontal interior edges: i in 1..H-2, j in 0..W-2
    if h > 2:
        hp = par[1:-1, : w - 1]                               # helper(i, j)
        a = flat[1:-1, :-1]
        b = flat[1:-1, 1:]
        f0 = np.where(hp, flat[2:, 1:], flat[2:, :-1])        # (i+1, j+h)
        f1 = np.where(hp, flat[:-2, 1:], flat[:-2, :-1])      # (i-1, j+h)
        out["bh"] = (f0, f1, a, b)
    # vertical interior edges: i in 0..H-2, j in 1..W-2
    if w > 2:
        hp = par[: h - 1, 1:-1]
        a = flat[:-1, 1:-1]
        b = flat[1:, 1:-1]
        f0 = np.where(hp, flat[1:, 2:], flat[:-1, 2:])        # (i+h, j+1)
        f1 = np.where(hp, flat[1:, :-2], flat[:-1, :-2])      # (i+h, j-1)
        out["bv"] = (f0, f1, a, b)
    # quad diagonals: every quad
    hp = par[: h - 1, : w - 1]
    a = np.where(hp, flat[:-1, :-1], flat[:-1, 1:])
    b = np.where(hp, flat[1:, 1:], flat[1:, :-1])
    f0 = np.where(hp, flat[:-1, 1:], flat[:-1, :-1])
    f1 = np.where(hp, flat[1:, :-1], flat[1:, 1:])
    out["bd"] = (f0, f1, a, b)
    return out


_DIST_FAMILIES = ("h", "v", "d")
_BEND_FAMILIES = ("bh", "bv", "bd")


@_register
@dataclass(frozen=True)
class GridClothBatch:
    """Stencil-form distance + isometric-bending constraints of one regular
    grid cloth. All per-constraint data lives in family-grid-shaped arrays;
    the device never sees an index."""

    rest: dict          # family -> rest length, (Fh, Fw) or scalar
    stiff: dict         # family -> stiffness scalar (distance fams)
    q_mat: dict         # family -> rank-1 bending factor S (Fh, Fw, 4)
    #                     with Q = −S Sᵀ (see _init_isometric_bending_s_np)
    bend_stiff: dict    # family -> stiffness scalar
    inv_cnt_dist: Array     # (H, W) 1/#distance constraints per particle
    inv_cnt_bend: Array     # (H, W) 1/#bending stencils per particle
    height: int = field(metadata=dict(static=True))
    width: int = field(metadata=dict(static=True))
    offset: int = field(metadata=dict(static=True))
    xpbd_distance: bool = field(metadata=dict(static=True))
    xpbd_bending: bool = field(metadata=dict(static=True))
    has_distance: bool = field(metadata=dict(static=True))
    has_bending: bool = field(metadata=dict(static=True))

    # -- build -------------------------------------------------------------

    @staticmethod
    def create(height: int, width: int, offset: int, x0: np.ndarray,
               distance_stiffness, bending_stiffness=None,
               xpbd_distance: bool = True,
               xpbd_bending: bool = True) -> "GridClothBatch":
        """``x0`` is the FULL scene rest-position array (N, 3); the cloth
        occupies rows ``offset : offset + H*W`` in row-major (i*W + j)
        order. ``bending_stiffness=None`` disables the bending families."""
        from .constraints import _init_isometric_bending_s_np

        h, w = height, width
        blk = np.asarray(x0, np.float64)[offset:offset + h * w]
        edges = _grid_edges_np(h, w)
        rest, stiff = {}, {}
        cnt_d = np.zeros((h * w,), np.float64)
        has_distance = distance_stiffness is not None

        def _collapse(a, shape):
            """Uniform per-constraint data collapses to a broadcastable
            scalar/sub-array — on a uniform grid every stencil of a
            family is congruent, so rest lengths and Q matrices are
            identical across the family grid. This removes the dominant
            HBM stream of the bending pass (the (Fh, Fw, 4, 4) Q read,
            ~19 MB/substep at 320x320 — docs/PERF.md). Congruent stencils
            produce values equal only up to f64→f32 init rounding, so the
            tolerance is a few f32 ulps relative; the collapsed value is
            the mean (the noise-free uniform value)."""
            flat = a.reshape(-1, *a.shape[len(shape):])
            mean = flat.mean(axis=0)
            scale = np.maximum(np.abs(mean), 1e-12)
            if np.all(np.abs(flat - mean) <= 1e-5 * scale + 1e-7):
                return jnp.asarray(mean, jnp.float32)
            return jnp.asarray(a, jnp.float32)

        if has_distance:
            for fam in _DIST_FAMILIES:
                ai, bi = edges[fam]
                r = np.linalg.norm(blk[ai] - blk[bi], axis=-1)
                rest[fam] = _collapse(r, r.shape)
                stiff[fam] = jnp.float32(distance_stiffness)
                np.add.at(cnt_d, ai.ravel(), 1.0)
                np.add.at(cnt_d, bi.ravel(), 1.0)

        q_mat, bstiff = {}, {}
        cnt_b = np.zeros((h * w,), np.float64)
        has_bending = bending_stiffness is not None
        if has_bending:
            for fam, (f0, f1, a, b) in _bend_stencils_np(h, w).items():
                sten = np.stack([f0, f1, a, b], axis=-1)       # (Fh, Fw, 4)
                pts = blk[sten.reshape(-1, 4)]                 # (F, 4, 3)
                s_vec = _init_isometric_bending_s_np(pts)      # rank-1 factor
                q_mat[fam] = _collapse(
                    s_vec.reshape(sten.shape[:2] + (4,)), sten.shape[:2])
                bstiff[fam] = jnp.float32(bending_stiffness)
                np.add.at(cnt_b, sten.reshape(-1), 1.0)

        return GridClothBatch(
            rest=rest, stiff=stiff, q_mat=q_mat, bend_stiff=bstiff,
            inv_cnt_dist=jnp.asarray(
                (1.0 / np.maximum(cnt_d, 1.0)).reshape(h, w, 1), jnp.float32),
            inv_cnt_bend=jnp.asarray(
                (1.0 / np.maximum(cnt_b, 1.0)).reshape(h, w, 1), jnp.float32),
            height=h, width=w, offset=offset,
            xpbd_distance=bool(xpbd_distance),
            xpbd_bending=bool(xpbd_bending),
            has_distance=has_distance,
            has_bending=has_bending,
        )

    def _family_shape(self, fam):
        h, w = self.height, self.width
        return {"h": (h, w - 1), "v": (h - 1, w), "d": (h - 1, w - 1),
                "bh": (h - 2, w - 1), "bv": (h - 1, w - 2),
                "bd": (h - 1, w - 1)}[fam]

    def init_lambda(self):
        z = {f: jnp.zeros(self._family_shape(f), jnp.float32)
             for f in self.rest}
        zb = {f: jnp.zeros(self._family_shape(f), jnp.float32)
              for f in self.q_mat}
        return (z, zb)

    # -- family gathers (static slices + parity selects) --------------------

    def _parity(self):
        hp = _helper_grid(self.height, self.width)
        return jnp.asarray(hp[..., None], jnp.float32)  # (H-1, W-1, 1)

    def _dist_endpoints(self, g, fam, hp):
        if fam == "h":
            return g[:, :-1], g[:, 1:]
        if fam == "v":
            return g[:-1, :], g[1:, :]
        a = hp * g[:-1, :-1] + (1.0 - hp) * g[:-1, 1:]
        b = hp * g[1:, 1:] + (1.0 - hp) * g[1:, :-1]
        return a, b

    @staticmethod
    def _scatter_dist(acc, fam, hp, ca, cb):
        if fam == "h":
            acc = acc.at[:, :-1].add(ca)
            return acc.at[:, 1:].add(cb)
        if fam == "v":
            acc = acc.at[:-1, :].add(ca)
            return acc.at[1:, :].add(cb)
        acc = acc.at[:-1, :-1].add(ca * hp)
        acc = acc.at[:-1, 1:].add(ca * (1.0 - hp))
        acc = acc.at[1:, 1:].add(cb * hp)
        return acc.at[1:, :-1].add(cb * (1.0 - hp))

    def _bend_points(self, g, fam, hp):
        """Returns (list of 4 point grids ``[a, b, f0, f1]`` — internal
        [p2, p3, p0, p1] order, each (Fh, Fw, 3) — and a scatter closure
        taking the matching list of 4 correction grids). Kept as separate
        arrays, never stacked: a (…, 4, k) axis would put tiny dims in
        lanes and block VPU vectorization on TPU."""
        if fam == "bh":
            # helper(i, j) for i in 1..H-2 — hp has quad-grid shape (H-1, W-1)
            p = hp[1:, :]
            a, b = g[1:-1, :-1], g[1:-1, 1:]
            f0 = p * g[2:, 1:] + (1.0 - p) * g[2:, :-1]
            f1 = p * g[:-2, 1:] + (1.0 - p) * g[:-2, :-1]

            def scatter(acc, c):
                ca, cb, c0, c1 = c
                acc = acc.at[1:-1, :-1].add(ca).at[1:-1, 1:].add(cb)
                acc = acc.at[2:, 1:].add(c0 * p).at[2:, :-1].add(c0 * (1 - p))
                return acc.at[:-2, 1:].add(c1 * p).at[:-2, :-1].add(c1 * (1 - p))
        elif fam == "bv":
            p = hp[:, 1:]
            a, b = g[:-1, 1:-1], g[1:, 1:-1]
            f0 = p * g[1:, 2:] + (1.0 - p) * g[:-1, 2:]
            f1 = p * g[1:, :-2] + (1.0 - p) * g[:-1, :-2]

            def scatter(acc, c):
                ca, cb, c0, c1 = c
                acc = acc.at[:-1, 1:-1].add(ca).at[1:, 1:-1].add(cb)
                acc = acc.at[1:, 2:].add(c0 * p).at[:-1, 2:].add(c0 * (1 - p))
                return acc.at[1:, :-2].add(c1 * p).at[:-1, :-2].add(c1 * (1 - p))
        else:  # bd
            p = hp
            a = p * g[:-1, :-1] + (1.0 - p) * g[:-1, 1:]
            b = p * g[1:, 1:] + (1.0 - p) * g[1:, :-1]
            f0 = p * g[:-1, 1:] + (1.0 - p) * g[:-1, :-1]
            f1 = p * g[1:, :-1] + (1.0 - p) * g[1:, 1:]

            def scatter(acc, c):
                ca, cb, c0, c1 = c
                acc = acc.at[:-1, :-1].add(ca * p).at[:-1, 1:].add(ca * (1 - p))
                acc = acc.at[1:, 1:].add(cb * p).at[1:, :-1].add(cb * (1 - p))
                acc = acc.at[:-1, 1:].add(c0 * p).at[:-1, :-1].add(c0 * (1 - p))
                return acc.at[1:, :-1].add(c1 * p).at[1:, 1:].add(c1 * (1 - p))
        return [a, b, f0, f1], scatter

    # -- solve passes --------------------------------------------------------

    def _distance_pass(self, g, wg, lams, dt, omega):
        """One Jacobi pass of the distance family (all 3 stencil dirs) —
        dense form of ``XPBD::solve_DistanceConstraint`` (``XPBD.cpp:14-60``)
        / classic ``PositionBasedDynamics.cpp:13``."""
        hp = self._parity()
        acc = jnp.zeros_like(g)
        new_lams = {}
        for fam in _DIST_FAMILIES:
            pa, pb = self._dist_endpoints(g, fam, hp)
            wa, wb = self._dist_endpoints(wg, fam, hp)
            n = pa - pb
            d = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True))
            c = d[..., 0] - self.rest[fam]
            nn = n / jnp.maximum(d, 1e-6)
            if self.xpbd_distance:
                alpha = jnp.where(self.stiff[fam] != 0.0,
                                  1.0 / (self.stiff[fam] * dt * dt), 0.0)
                k = wa[..., 0] + wb[..., 0] + alpha
                valid = (d[..., 0] > 1e-6) & (jnp.abs(k) > 1e-6)
                dlam = jnp.where(valid, -(c + alpha * lams[fam]) / k, 0.0)
                new_lams[fam] = lams[fam] + dlam
                pt = nn * dlam[..., None]
            else:
                k = wa[..., 0] + wb[..., 0]
                valid = (d[..., 0] > 1e-6) & (k > 1e-9)
                s = jnp.where(valid, self.stiff[fam] * c / jnp.maximum(k, 1e-9),
                              0.0)
                new_lams[fam] = lams[fam]
                pt = nn * (-s[..., None])
            acc = self._scatter_dist(acc, fam, hp, wa * pt, -wb * pt)
        return g + omega * self.inv_cnt_dist * acc, new_lams

    def _bending_pass(self, g, wg, lams, dt, omega):
        """One Jacobi pass of the isometric-bending family — dense form of
        ``XPBD::solve_IsometricBendingConstraint`` (``XPBD.cpp:153-213``) /
        classic ``PositionBasedDynamics.h:241``."""
        hp = self._parity()
        acc = jnp.zeros_like(g)
        new_lams = {}
        for fam in self.q_mat:
            xs, scatter = self._bend_points(g, fam, hp)
            ws4, _ = self._bend_points(wg, fam, hp)           # 4× (Fh, Fw, 1)
            s = self.q_mat[fam]                               # rank-1 factor
            sj = [s[..., j, None] for j in range(4)]          # (…, 1)
            # Q = −S Sᵀ (XPBD.cpp:136-148 is exactly rank 1), so the 4×4
            # contraction collapses to one weighted stencil sum:
            # t = Σⱼ Sⱼ xⱼ;  C = −½|t|²;  ∇ⱼC = −Sⱼ t
            t = sj[0] * xs[0]
            for j in range(1, 4):
                t = t + sj[j] * xs[j]
            t2 = jnp.sum(t * t, -1)
            energy = -0.5 * t2
            w_s2 = sum(ws4[j][..., 0] * s[..., j] * s[..., j]
                       for j in range(4))
            sum_norm = w_s2 * t2
            if self.xpbd_bending:
                stiffk = self.bend_stiff[fam]
                alpha = jnp.where(stiffk != 0.0, 1.0 / (stiffk * dt * dt), 0.0)
                kk = sum_norm + alpha
                valid = jnp.abs(kk) > 1e-9
                dlam = jnp.where(valid, -(energy + alpha * lams[fam])
                                 / jnp.where(valid, kk, 1.0), 0.0)
                new_lams[fam] = lams[fam] + dlam
            else:
                valid = jnp.abs(sum_norm) > 1e-9
                dlam = jnp.where(valid, -self.bend_stiff[fam] * energy
                                 / jnp.where(valid, sum_norm, 1.0), 0.0)
                new_lams[fam] = lams[fam]
            dt_plane = dlam[..., None] * t
            corr = [-ws4[j] * sj[j] * dt_plane for j in range(4)]
            acc = scatter(acc, corr)
        return g + omega * self.inv_cnt_bend * acc, new_lams

    # lattice chromatic structure per family: constraints of one family
    # at lattice cells (i, j) and (i', j') share a vertex iff |Δi| / |Δj|
    # are within the family's stencil reach, so (i mod a, j mod b) with
    # (a, b) = reach+1 is an exact coloring — the structured-grid form
    # of SimulationModel::initConstraintGroups (SimulationModel.cpp:
    # 1033-1094)
    _GS_COLORS = {"h": (1, 2), "v": (2, 1), "d": (2, 2),
                  "bh": (3, 2), "bv": (2, 3), "bd": (2, 2)}

    def project_gs(self, x: Array, inv_mass: Array, lams, dt
                   ) -> Tuple[Array, tuple]:
        """Color-sequential Gauss-Seidel projection on the grid: per
        family, per lattice color, solve from the CURRENT positions and
        apply the color's (vertex-disjoint) corrections immediately —
        true Gauss-Seidel fidelity at structured-grid speed, at the cost
        of #colors redundant family computes per pass.

        NOTE: the sweep order (families h,v,d,bh,bv,bd × lexicographic
        lattice colors) is a VALID Gauss-Seidel order but not the
        greedy-coloring order of the unstructured builder, so
        trajectories match the reference bar only when the reference is
        run with the same order; oracle-parity tests use the
        unstructured build (tests/test_reference_parity.py)."""
        h, w = self.height, self.width
        o = self.offset
        g = x[o:o + h * w].reshape(h, w, 3)
        wg = inv_mass[o:o + h * w].reshape(h, w, 1)
        hp = self._parity()
        dist_lams, bend_lams = lams
        dist_lams = dict(dist_lams)
        bend_lams = dict(bend_lams)
        dt = jnp.float32(dt)

        def _color_masks(shape, fam):
            a, b = self._GS_COLORS[fam]
            ii = jnp.arange(shape[0])[:, None]
            jj = jnp.arange(shape[1])[None, :]
            return [((ii % a == ca) & (jj % b == cb)).astype(jnp.float32)
                    for ca in range(a) for cb in range(b)]

        if self.has_distance:
            for fam in _DIST_FAMILIES:
                lam_shape = dist_lams[fam].shape
                for cm in _color_masks(lam_shape, fam):
                    pa, pb = self._dist_endpoints(g, fam, hp)
                    wa, wb = self._dist_endpoints(wg, fam, hp)
                    n = pa - pb
                    d = jnp.sqrt(jnp.sum(n * n, -1, keepdims=True))
                    c = d[..., 0] - self.rest[fam]
                    nn = n / jnp.maximum(d, 1e-6)
                    if self.xpbd_distance:
                        alpha = jnp.where(
                            self.stiff[fam] != 0.0,
                            1.0 / (self.stiff[fam] * dt * dt), 0.0)
                        k = wa[..., 0] + wb[..., 0] + alpha
                        valid = (d[..., 0] > 1e-6) & (jnp.abs(k) > 1e-6)
                        dlam = jnp.where(
                            valid, -(c + alpha * dist_lams[fam]) / k,
                            0.0) * cm
                        dist_lams[fam] = dist_lams[fam] + dlam
                        pt = nn * dlam[..., None]
                    else:
                        k = wa[..., 0] + wb[..., 0]
                        valid = (d[..., 0] > 1e-6) & (k > 1e-9)
                        s = jnp.where(
                            valid,
                            self.stiff[fam] * c / jnp.maximum(k, 1e-9),
                            0.0) * cm
                        pt = nn * (-s[..., None])
                    acc = self._scatter_dist(
                        jnp.zeros_like(g), fam, hp, wa * pt, -wb * pt)
                    g = g + acc           # disjoint within a color
        if self.has_bending:
            for fam in self.q_mat:
                lam_shape = bend_lams[fam].shape
                s = self.q_mat[fam]
                sj = [s[..., j, None] for j in range(4)]
                for cm in _color_masks(lam_shape, fam):
                    xs, scatter = self._bend_points(g, fam, hp)
                    ws4, _ = self._bend_points(wg, fam, hp)
                    t = sj[0] * xs[0]
                    for j in range(1, 4):
                        t = t + sj[j] * xs[j]
                    t2 = jnp.sum(t * t, -1)
                    energy = -0.5 * t2
                    w_s2 = sum(ws4[j][..., 0] * s[..., j] * s[..., j]
                               for j in range(4))
                    if self.xpbd_bending:
                        stiffk = self.bend_stiff[fam]
                        alpha = jnp.where(stiffk != 0.0,
                                          1.0 / (stiffk * dt * dt), 0.0)
                        kk = w_s2 * t2 + alpha
                        valid = jnp.abs(kk) > 1e-9
                        dlam = jnp.where(
                            valid, -(energy + alpha * bend_lams[fam])
                            / jnp.where(valid, kk, 1.0), 0.0) * cm
                        bend_lams[fam] = bend_lams[fam] + dlam
                    else:
                        sum_norm = w_s2 * t2
                        valid = jnp.abs(sum_norm) > 1e-9
                        dlam = jnp.where(
                            valid, -self.bend_stiff[fam] * energy
                            / jnp.where(valid, sum_norm, 1.0), 0.0) * cm
                    dt_plane = dlam[..., None] * t
                    corr = [-ws4[j] * sj[j] * dt_plane for j in range(4)]
                    g = g + scatter(jnp.zeros_like(g), corr)
        x = jax.lax.dynamic_update_slice(x, g.reshape(-1, 3), (o, 0))
        return x, (dist_lams, bend_lams)

    def project(self, x: Array, inv_mass: Array, lams, dt,
                omega: float = 1.0) -> Tuple[Array, tuple]:
        """Distance family pass then bending family pass on the grid block
        of ``x`` — same per-family Jacobi semantics as the unstructured
        path in ``solver/step.py``."""
        h, w = self.height, self.width
        o = self.offset
        g = x[o:o + h * w].reshape(h, w, 3)
        wg = inv_mass[o:o + h * w].reshape(h, w, 1)
        dist_lams, bend_lams = lams
        if self.has_distance:
            g, dist_lams = self._distance_pass(g, wg, dist_lams,
                                               jnp.float32(dt), omega)
        if self.has_bending:
            g, bend_lams = self._bending_pass(g, wg, bend_lams,
                                              jnp.float32(dt), omega)
        x = jax.lax.dynamic_update_slice(x, g.reshape(-1, 3), (o, 0))
        return x, (dist_lams, bend_lams)

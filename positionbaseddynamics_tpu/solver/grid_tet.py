"""Structured-grid XPBD FEM-tet solids — the TPU-first fast path for
regular tet bars (``SimulationModel::addRegularTetModel``,
``SimulationModel.cpp:921-1005`` + ``addSolidConstraints`` method 3,
``SimulationModel.cpp:1242-1320`` / ``XPBD.cpp:217-294``), i.e. the
BarDemo / BASELINE config-2 workload.

Why this exists: the generic FEM-tet path gathers and scatter-adds
``(C, 4, 3)`` rows at irregular indices — the access pattern measured
~1000× off HBM speed-of-light on TPU (``docs/PERF.md``). On a *regular*
tet grid (hex cells split into 5 tets with parity flip so neighbors
share faces) every tet is one of 5 families whose 4 vertices sit at
fixed cell-corner offsets, so the whole gather→solve→scatter round
becomes dense shifted-slice arithmetic:

* the 8 cell-corner vertex grids are **8 static slices** of the
  ``(W, H, D, 3)`` position grid, shared by all 5 families;
* each family's 4 stencil points are parity blends of two corners
  (odd/even cells use mirrored tets, ``regular_tet_grid``);
* all 5 families' corrections accumulate into 8 per-corner buffers,
  written back with **8 dense slice-adds** — no scatter indices on
  device at all.

Per-cell rest data (inv rest matrix, rest volume) is congruent across
cells of one parity, so it collapses to 2×5 host-side constants — no
per-constraint parameter stream from HBM.

Solve semantics are identical to the unstructured Jacobi path
(``FEMTetraBatch`` + ``solver/step.py``): XPBD λ per tet reset per
projection call, Jacobi averaging by per-vertex tet counts, and the
reference's SVD inversion handling (``PositionBasedDynamics.cpp:
1034-1106``) — computed lazily via ``lax.cond`` only when some tet is
actually inverted, which never happens in ordinary bar bending.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# cell corner offsets in (i, j, k) — vertex flat index i*H*D + j*D + k;
# numbering mirrors ``regular_tet_grid`` (p0..p7)
_CORNERS = np.array([
    (0, 0, 0), (0, 0, 1), (1, 0, 1), (1, 0, 0),
    (0, 1, 0), (0, 1, 1), (1, 1, 1), (1, 1, 0),
], np.int32)
# 5 tet families per cell; odd cells ((i+j+k)%2==1) use the mirrored set
_TETS_ODD = np.array([
    (2, 1, 6, 3), (6, 3, 4, 7), (4, 1, 6, 5), (3, 1, 4, 0), (6, 1, 4, 3),
], np.int32)
_TETS_EVEN = np.array([
    (0, 2, 5, 1), (7, 2, 0, 3), (5, 2, 7, 6), (7, 0, 5, 4), (0, 2, 7, 5),
], np.int32)


def _register(cls):
    data, meta = [], []
    for f in dataclasses.fields(cls):
        (meta if f.metadata.get("static") else data).append(f.name)
    return jax.tree_util.register_dataclass(cls, data_fields=data,
                                            meta_fields=meta)


def _collapse_uniform(a, what):
    """Congruent cells produce identical rest data up to f64 rounding;
    collapse to the mean or refuse the fast path."""
    flat = a.reshape(-1, *a.shape[3:])
    mean = flat.mean(axis=0)
    scale = np.maximum(np.abs(mean), 1e-12)
    if not np.all(np.abs(flat - mean) <= 1e-5 * scale + 1e-9):
        raise NotImplementedError(
            f"grid tet fast path requires congruent cells ({what} varies)")
    return mean


@_register
@dataclass(frozen=True)
class GridTetBatch:
    """Stencil-form XPBD FEM-tet constraints of one regular tet grid."""

    inv_rest_odd: Array     # (5, 3, 3) per-family rest matrix, odd cells
    inv_rest_even: Array    # (5, 3, 3)
    rest_vol_odd: Array     # (5,)
    rest_vol_even: Array    # (5,)
    youngs: Array           # scalar
    poisson: Array          # scalar
    inv_cnt: Array          # (W, H, D, 1) 1/#tets per vertex
    width: int = field(metadata=dict(static=True))
    height: int = field(metadata=dict(static=True))
    depth: int = field(metadata=dict(static=True))
    offset: int = field(metadata=dict(static=True))

    @staticmethod
    def create(width: int, height: int, depth: int, offset: int,
               x0: np.ndarray, stiffness: float,
               poisson_ratio: float) -> "GridTetBatch":
        """``x0`` is the FULL scene rest-position array; the tet grid
        occupies rows ``offset : offset + W*H*D`` in ``i*H*D + j*D + k``
        order (``regular_tet_grid``)."""
        w, h, d = width, height, depth
        blk = np.asarray(x0, np.float64)[offset:offset + w * h * d]
        g = blk.reshape(w, h, d, 3)
        wc, hc, dc = w - 1, h - 1, d - 1

        corners = [g[a:a + wc, b:b + hc, c:c + dc] for a, b, c in _CORNERS]
        ii, jj, kk = np.meshgrid(np.arange(wc), np.arange(hc),
                                 np.arange(dc), indexing="ij")
        odd = ((ii + jj + kk) % 2 == 1)

        def _family_rest(tet_table, mask):
            irm, vol = [], []
            for t in range(5):
                pts = [corners[c][mask] for c in tet_table[t]]  # 4×(M, 3)
                p0, p1, p2, p3 = pts
                dm = np.stack([p0 - p3, p1 - p3, p2 - p3], axis=-1)
                v = np.abs(np.einsum(
                    "cd,cd->c", np.cross(p1 - p0, p2 - p0), p3 - p0) / 6.0)
                irm.append(_collapse_uniform(
                    np.linalg.inv(dm).reshape(-1, 1, 1, 3, 3), "rest matrix"))
                vol.append(float(_collapse_uniform(
                    v.reshape(-1, 1, 1), "rest volume")))
            return np.stack(irm), np.asarray(vol)

        irm_o, vol_o = _family_rest(_TETS_ODD, odd)
        irm_e, vol_e = _family_rest(_TETS_EVEN, ~odd)

        cnt = np.zeros((w * h * d,), np.float64)
        hd = h * d
        cell_base = (ii * hd + jj * d + kk).ravel()
        for t in range(5):
            for parity, table in ((odd, _TETS_ODD), (~odd, _TETS_EVEN)):
                for c in table[t]:
                    a, b, cc = _CORNERS[c]
                    vidx = cell_base[parity.ravel()] + a * hd + b * d + cc
                    np.add.at(cnt, vidx, 1.0)

        return GridTetBatch(
            inv_rest_odd=jnp.asarray(irm_o, jnp.float32),
            inv_rest_even=jnp.asarray(irm_e, jnp.float32),
            rest_vol_odd=jnp.asarray(vol_o, jnp.float32),
            rest_vol_even=jnp.asarray(vol_e, jnp.float32),
            youngs=jnp.float32(stiffness),
            poisson=jnp.float32(poisson_ratio),
            inv_cnt=jnp.asarray(
                (1.0 / np.maximum(cnt, 1.0)).reshape(w, h, d, 1),
                jnp.float32),
            width=w, height=h, depth=d, offset=offset,
        )

    def init_lambda(self) -> Array:
        wc, hc, dc = self.width - 1, self.height - 1, self.depth - 1
        return jnp.zeros((5, wc * hc * dc), jnp.float32)

    # -- solve ---------------------------------------------------------------

    def _solve_family(self, pts, ws, irm, vol, dt, lam):
        """Vectorized XPBD FEM-tet solve over all cells of one family —
        math of ``XPBD::solve_FEMTetraConstraint`` (``XPBD.cpp:217-294``)
        with ``C = sqrt(2U')`` factor bookkeeping, exactly as the
        unstructured kernel ``ops.xpbd.solve_fem_tetra``. ``pts`` 4×(C,3),
        ``ws`` 4×(C,), ``irm`` (C,3,3), ``vol`` (C,). Returns
        (4×(C,3) corrections, new λ)."""
        from ..ops.xpbd import (grad_c_green, green_strain_energy,
                                green_strain_energy_inversion)
        from ..ops.mathutils import EPS, safe_inv

        p0, p1, p2, p3 = pts
        mu = 0.5 / (1.0 + self.poisson)
        lame = self.poisson / ((1.0 + self.poisson)
                               * (1.0 - 2.0 * self.poisson))

        volume = jnp.einsum("cd,cd->c",
                            jnp.cross(p1 - p0, p2 - p0), p3 - p0) / 6.0
        any_inverted = jnp.any(volume <= 0.0)

        def regular(_):
            u, sig, _f = jax.vmap(
                green_strain_energy, in_axes=(0, 0, 0, 0, 0, 0, None, None)
            )(p0, p1, p2, p3, irm, vol, mu, lame)
            return u, sig

        def with_inversion(_):
            u_reg, sig_reg = regular(None)
            u_inv, sig_inv, _f = jax.vmap(
                green_strain_energy_inversion,
                in_axes=(0, 0, 0, 0, 0, 0, None, None)
            )(p0, p1, p2, p3, irm, vol, mu, lame)
            inv = volume <= 0.0
            return (jnp.where(inv, u_inv, u_reg),
                    jnp.where(inv[:, None, None], sig_inv, sig_reg))

        # the SVD branch only runs when some tet is actually inverted —
        # bar bending never inverts, so the hot path stays SVD-free
        u_prime, sigma = jax.lax.cond(any_inverted, with_inversion, regular,
                                      None)

        grad_u = jax.vmap(grad_c_green, in_axes=(0, 0, 0))(vol, irm, sigma)
        c = jnp.sqrt(jnp.maximum(2.0 * u_prime, 0.0))
        ws4 = jnp.stack(ws, axis=1)                       # (C, 4)
        sum_norm = jnp.sum(ws4 * jnp.sum(grad_u * grad_u, axis=-1), axis=-1)
        alpha = safe_inv(self.youngs * dt * dt)
        sum_norm = sum_norm + c * c * alpha
        valid = (sum_norm >= EPS) & (self.youngs > 0.0)
        dlam = jnp.where(valid, -c * (c + alpha * lam) * safe_inv(sum_norm),
                         0.0)
        corr = dlam[:, None, None] * ws4[:, :, None] * grad_u   # (C, 4, 3)
        return [corr[:, i] for i in range(4)], lam + dlam

    def project(self, x: Array, inv_mass: Array, lams, dt,
                omega: float = 1.0) -> Tuple[Array, Array]:
        """One Jacobi pass of all 5 tet families on the grid block of
        ``x`` — same per-family semantics as the unstructured path."""
        w, h, d = self.width, self.height, self.depth
        wc, hc, dc = w - 1, h - 1, d - 1
        o = self.offset
        n_blk = w * h * d
        g = x[o:o + n_blk].reshape(w, h, d, 3)
        wg = inv_mass[o:o + n_blk].reshape(w, h, d)

        corners_x = [g[a:a + wc, b:b + hc, c:c + dc].reshape(-1, 3)
                     for a, b, c in _CORNERS]
        corners_w = [wg[a:a + wc, b:b + hc, c:c + dc].reshape(-1)
                     for a, b, c in _CORNERS]
        ii, jj, kk = np.meshgrid(np.arange(wc), np.arange(hc),
                                 np.arange(dc), indexing="ij")
        odd = jnp.asarray(((ii + jj + kk) % 2 == 1).reshape(-1))
        oddf = odd.astype(jnp.float32)

        acc = [jnp.zeros((wc * hc * dc, 3), jnp.float32) for _ in range(8)]
        new_lams = []
        for t in range(5):
            co = _TETS_ODD[t]
            ce = _TETS_EVEN[t]
            pts = [oddf[:, None] * corners_x[co[k]]
                   + (1.0 - oddf[:, None]) * corners_x[ce[k]]
                   for k in range(4)]
            ws = [oddf * corners_w[co[k]] + (1.0 - oddf) * corners_w[ce[k]]
                  for k in range(4)]
            irm = jnp.where(odd[:, None, None],
                            self.inv_rest_odd[t], self.inv_rest_even[t])
            vol = jnp.where(odd, self.rest_vol_odd[t], self.rest_vol_even[t])
            corrs, nl = self._solve_family(pts, ws, irm, vol, dt, lams[t])
            new_lams.append(nl)
            for k in range(4):
                # parity-route the correction back to the two corners
                acc[co[k]] = acc[co[k]] + oddf[:, None] * corrs[k]
                acc[ce[k]] = acc[ce[k]] + (1.0 - oddf[:, None]) * corrs[k]

        dx = jnp.zeros((w, h, d, 3), jnp.float32)
        for ci, (a, b, c) in enumerate(_CORNERS):
            dx = dx.at[a:a + wc, b:b + hc, c:c + dc].add(
                acc[ci].reshape(wc, hc, dc, 3))

        g = g + omega * self.inv_cnt * dx
        x = jax.lax.dynamic_update_slice(x, g.reshape(-1, 3), (o, 0))
        return x, jnp.stack(new_lams)

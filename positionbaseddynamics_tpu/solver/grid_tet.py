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

Solve semantics match the unstructured Jacobi path (``FEMTetraBatch`` +
``solver/step.py``) — XPBD λ per tet reset per projection call, Jacobi
averaging by per-vertex tet counts — with ONE documented divergence:
the reference's SVD stress for inverted tets
(``PositionBasedDynamics.cpp:1034-1106``) is select-based here and
costs ~4× even when nothing inverts, so it is **opt-in**
(``inversion_handling``, threaded through
``SceneBuilder.add_solid_constraints``). Without inversions the two
settings are bitwise identical; scenes that can invert tets should
enable it (or use an irregular mesh to stay on the unstructured path,
which always handles inversion).
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
    # True = reference inversion semantics, computed the way the
    # unstructured batch computes them: the SVD energy is evaluated for
    # every tet and selected where det F ≤ 0. That batched 3×3 SVD
    # dominates the substep, so the default is False: bar-bending
    # workloads never invert a tet, and without inversions the two
    # settings produce bitwise-identical trajectories. (A lax.cond
    # "only pay when it fires" variant was tried and is ~100× WORSE —
    # the conditional is a fusion barrier that materializes every
    # operand plane.)
    inversion_handling: bool = field(default=False,
                                     metadata=dict(static=True))

    @staticmethod
    def create(width: int, height: int, depth: int, offset: int,
               x0: np.ndarray, stiffness: float,
               poisson_ratio: float,
               inversion_handling: bool = False) -> "GridTetBatch":
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
            inversion_handling=bool(inversion_handling),
        )

    def init_lambda(self) -> Array:
        wc, hc, dc = self.width - 1, self.height - 1, self.depth - 1
        return jnp.zeros((5, wc * hc * dc), jnp.float32)

    # -- solve ---------------------------------------------------------------

    def _solve_family(self, pts, ws, irm9, vol, dt, lam):
        """Vectorized XPBD FEM-tet solve over all cells of one family —
        math of ``XPBD::solve_FEMTetraConstraint`` (``XPBD.cpp:217-294``)
        with ``C = sqrt(2U')`` factor bookkeeping, exactly as the
        unstructured kernel ``ops.xpbd.solve_fem_tetra``.

        TPU layout: the 3×3 algebra (F = Dₛ·Dₘ⁻¹, Green strain, Piola
        stress, H = V₀σDₘ⁻ᵀ) is fully unrolled over *component planes* —
        3×3 matrices are Python lists of (C,) arrays, so everything fuses
        into flat VPU multiply-adds. Batched ``(C, 3, 3)`` matmuls pad
        the 3-wide dims onto (8, 128) tiles and run ~40× off peak (the
        first version of this path measured 15 ms/step at 13k vertices).

        ``pts`` 4×[(C,) x, y, z], ``ws`` 4×(C,), ``irm9`` 3×3 list of
        (C,) (inverse rest matrix), ``vol`` (C,).
        Returns (4×3 list of (C,) corrections, new λ)."""
        from ..ops.mathutils import EPS, safe_inv

        mu = 0.5 / (1.0 + self.poisson)
        lame = self.poisson / ((1.0 + self.poisson)
                               * (1.0 - 2.0 * self.poisson))

        # edge vectors dᵢ = pᵢ − p₃ as component planes: ds[a][i]
        ds = [[pts[i][a] - pts[3][a] for i in range(3)] for a in range(3)]
        # F = D_s · D_m⁻¹  (PositionBasedDynamics.cpp:958-980)
        f = [[sum(ds[a][c] * irm9[c][b] for c in range(3))
              for b in range(3)] for a in range(3)]

        # ε = ½(FᵀF − I); symmetric — 6 unique planes
        def _ftf(a, b):
            return f[0][a] * f[0][b] + f[1][a] * f[1][b] + f[2][a] * f[2][b]
        eps = [[0.5 * (_ftf(a, b) - (1.0 if a == b else 0.0))
                for b in range(3)] for a in range(3)]
        trace = eps[0][0] + eps[1][1] + eps[2][2]
        # σ = F(2με + λ tr(ε) I); Ψ = μ‖ε‖² + ½λ tr²  (…cpp:958-1008)
        two_mu = 2.0 * mu
        s_in = [[two_mu * eps[a][b] + (lame * trace if a == b else 0.0)
                 for b in range(3)] for a in range(3)]
        sigma = [[sum(f[a][c] * s_in[c][b] for c in range(3))
                  for b in range(3)] for a in range(3)]
        psi = mu * sum(eps[a][b] * eps[a][b]
                       for a in range(3) for b in range(3)) \
            + 0.5 * lame * trace * trace
        u_prime = vol * psi

        if self.inversion_handling:
            # det F ≤ 0 → the reference's SVD path
            # (computeGreenStrainAndPiolaStressInversion,
            # PositionBasedDynamics.cpp:1034-1106), computed for every
            # tet and selected — exactly the unstructured batch's
            # behavior. Expensive; see the field docstring.
            from ..ops.xpbd import green_strain_energy_inversion
            p_vecs = [jnp.stack([pts[i][0], pts[i][1], pts[i][2]], axis=-1)
                      for i in range(4)]
            irm_m = jnp.stack(
                [jnp.stack([irm9[a][b] for b in range(3)], axis=-1)
                 for a in range(3)], axis=-2)
            volume = jnp.einsum(
                "cd,cd->c",
                jnp.cross(p_vecs[1] - p_vecs[0], p_vecs[2] - p_vecs[0]),
                p_vecs[3] - p_vecs[0]) / 6.0
            u_inv, sig_inv, _f = jax.vmap(
                green_strain_energy_inversion,
                in_axes=(0, 0, 0, 0, 0, 0, None, None)
            )(p_vecs[0], p_vecs[1], p_vecs[2], p_vecs[3],
              irm_m, vol, mu, lame)
            inv = volume <= 0.0
            u_prime = jnp.where(inv, u_inv, u_prime)
            sigma = [[jnp.where(inv, sig_inv[:, a, b], sigma[a][b])
                      for b in range(3)] for a in range(3)]

        # H = V₀ σ D_m⁻ᵀ; columns are ∇₀..∇₂, ∇₃ = −Σ (computeGradCGreen)
        grad = [[vol * sum(sigma[a][c] * irm9[b][c] for c in range(3))
                 for a in range(3)] for b in range(3)]   # grad[j][comp]
        grad.append([-(grad[0][a] + grad[1][a] + grad[2][a])
                     for a in range(3)])

        c = jnp.sqrt(jnp.maximum(2.0 * u_prime, 0.0))
        sum_norm = sum(ws[j] * (grad[j][0] * grad[j][0]
                                + grad[j][1] * grad[j][1]
                                + grad[j][2] * grad[j][2])
                       for j in range(4))
        alpha = safe_inv(self.youngs * dt * dt)
        sum_norm = sum_norm + c * c * alpha
        valid = (sum_norm >= EPS) & (self.youngs > 0.0)
        dlam = jnp.where(valid, -c * (c + alpha * lam) * safe_inv(sum_norm),
                         0.0)
        corrs = [[dlam * ws[j] * grad[j][a] for a in range(3)]
                 for j in range(4)]
        return corrs, lam + dlam

    def project_gs(self, x: Array, inv_mass: Array, lams, dt
                   ) -> Tuple[Array, Array]:
        """Color-sequential Gauss-Seidel on the tet grid: per family,
        per (i%2, j%2, k%2) lattice color — tets of one family in
        non-adjacent cells share no vertices, so each of the 8 colors
        applies its corrections immediately and conflict-free (the
        structured form of ``initConstraintGroups``,
        ``SimulationModel.cpp:1033-1094``). 8 redundant family computes
        per pass; a fidelity mode, not the production path."""
        w, h, d = self.width, self.height, self.depth
        wc, hc, dc = w - 1, h - 1, d - 1
        o = self.offset
        n_blk = w * h * d
        ii, jj, kk = np.meshgrid(np.arange(wc), np.arange(hc),
                                 np.arange(dc), indexing="ij")
        odd = jnp.asarray(((ii + jj + kk) % 2 == 1).reshape(-1))
        oddf = odd.astype(jnp.float32)
        evenf = 1.0 - oddf
        colors = [jnp.asarray(((ii % 2 == a) & (jj % 2 == b)
                               & (kk % 2 == c)).reshape(-1)
                              .astype(np.float32))
                  for a in (0, 1) for b in (0, 1) for c in (0, 1)]

        g = x[o:o + n_blk].reshape(w, h, d, 3)
        wg_full = inv_mass[o:o + n_blk].reshape(w, h, d)
        corners_w = [wg_full[a:a + wc, b:b + hc, c:c + dc].reshape(-1)
                     for a, b, c in _CORNERS]
        new_lams = list(lams)
        for t in range(5):
            co = _TETS_ODD[t]
            ce = _TETS_EVEN[t]
            ws = [oddf * corners_w[co[k]] + evenf * corners_w[ce[k]]
                  for k in range(4)]
            irm9 = [[jnp.where(odd, self.inv_rest_odd[t, a, b],
                               self.inv_rest_even[t, a, b])
                     for b in range(3)] for a in range(3)]
            vol = jnp.where(odd, self.rest_vol_odd[t],
                            self.rest_vol_even[t])
            for cm in colors:
                corners_x = [
                    [g[a:a + wc, b:b + hc, c:c + dc, comp].reshape(-1)
                     for comp in range(3)] for a, b, c in _CORNERS]
                pts = [[oddf * corners_x[co[k]][a]
                        + evenf * corners_x[ce[k]][a]
                        for a in range(3)] for k in range(4)]
                corrs, nl = self._solve_family(pts, ws, irm9, vol, dt,
                                               new_lams[t])
                new_lams[t] = new_lams[t] \
                    + (nl - new_lams[t]) * cm
                dx = jnp.zeros((w, h, d, 3), jnp.float32)
                for k in range(4):
                    for parf, corner in ((oddf, co[k]), (evenf, ce[k])):
                        a, b, c = _CORNERS[corner]
                        plane = jnp.stack(
                            [corrs[k][comp] * parf * cm
                             for comp in range(3)],
                            axis=-1).reshape(wc, hc, dc, 3)
                        dx = dx.at[a:a + wc, b:b + hc,
                                   c:c + dc].add(plane)
                g = g + dx            # disjoint within a color
        x = jax.lax.dynamic_update_slice(x, g.reshape(-1, 3), (o, 0))
        return x, jnp.stack(new_lams)

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

        # component planes per cell corner: corners_x[corner][comp] (C,)
        corners_x = [[g[a:a + wc, b:b + hc, c:c + dc, comp].reshape(-1)
                      for comp in range(3)] for a, b, c in _CORNERS]
        corners_w = [wg[a:a + wc, b:b + hc, c:c + dc].reshape(-1)
                     for a, b, c in _CORNERS]
        ii, jj, kk = np.meshgrid(np.arange(wc), np.arange(hc),
                                 np.arange(dc), indexing="ij")
        odd = jnp.asarray(((ii + jj + kk) % 2 == 1).reshape(-1))
        oddf = odd.astype(jnp.float32)
        evenf = 1.0 - oddf

        # acc[corner][comp] (C,)
        acc = [[jnp.zeros((wc * hc * dc,), jnp.float32) for _c in range(3)]
               for _k in range(8)]
        new_lams = []
        for t in range(5):
            co = _TETS_ODD[t]
            ce = _TETS_EVEN[t]
            pts = [[oddf * corners_x[co[k]][a] + evenf * corners_x[ce[k]][a]
                    for a in range(3)] for k in range(4)]
            ws = [oddf * corners_w[co[k]] + evenf * corners_w[ce[k]]
                  for k in range(4)]
            irm9 = [[jnp.where(odd, self.inv_rest_odd[t, a, b],
                               self.inv_rest_even[t, a, b])
                     for b in range(3)] for a in range(3)]
            vol = jnp.where(odd, self.rest_vol_odd[t], self.rest_vol_even[t])
            corrs, nl = self._solve_family(pts, ws, irm9, vol, dt, lams[t])
            new_lams.append(nl)
            for k in range(4):
                # parity-route the correction back to the two corners
                for a in range(3):
                    acc[co[k]][a] = acc[co[k]][a] + oddf * corrs[k][a]
                    acc[ce[k]][a] = acc[ce[k]][a] + evenf * corrs[k][a]

        dx = jnp.zeros((w, h, d, 3), jnp.float32)
        for ci, (a, b, c) in enumerate(_CORNERS):
            dx = dx.at[a:a + wc, b:b + hc, c:c + dc].add(
                jnp.stack(acc[ci], axis=-1).reshape(wc, hc, dc, 3))

        g = g + omega * self.inv_cnt * dx
        x = jax.lax.dynamic_update_slice(x, g.reshape(-1, 3), (o, 0))
        return x, jnp.stack(new_lams)

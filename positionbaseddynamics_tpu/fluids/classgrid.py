"""Occupancy-partitioned PBF iterations — dead-lane elimination.

Measured on the 100k dam (r05): the per-cell engine
(``cellgrid.pbf_iterations``) is pure VPU-flop-bound — XLA cost
analysis charges one iteration ~52 GFLOP and the chip sustains
~1.9 TF/s f32, which fully explains the 28 ms/iteration; the neighbor
row gathers are noise. The flops are dominated by DEAD pair lanes:
the slot tables are sized for worst-case impact compression
(``cap=28``) while the median cell holds 8 particles and the p90
neighborhood max is ~15, and every cell pays the 27·capb boundary-ψ
lanes while only ~26% of active cells have a boundary particle in
range.

This module removes both:

* active cells are partitioned by their 27-neighborhood max occupancy
  into a narrow class (pair block ``(·, capn, 27·capn)`` with
  ``capn = cap_narrow``) and a full-cap class; rank-based slot packing
  means slicing the tables to ``[:, :capn]`` is exact for cells whose
  whole neighborhood fits. Cells spill UP (narrow → full) when the
  narrow list is out of capacity — always correct, just slower; cells
  that do not fit the full list are counted in the loud overflow.
* boundary (Akinci ψ) lanes run only for the compacted list of
  boundary-*adjacent* occupied cells (``BoundaryTables.near``, static);
  their density/∇C partial sums scatter into per-cell tables and the
  class kernels pick them up before the λ solve.

The math and per-step frozen-pair semantics are identical to
``cellgrid.pbf_iterations`` (``PositionBasedFluids.cpp:8-141``,
``TimeStepFluidModel.cpp:30-38``); parity vs the unpartitioned path is
asserted in ``tests/test_fluids.py``.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import sph

Array = jax.Array

_OFFS = np.array([(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                  for dz in (-1, 0, 1)], np.int32)


def narrow_cap(spec) -> int:
    """Slot width of the narrow class: the settled-liquid occupancy
    band (rest is 8 particles/support cell; moderate compression
    reaches the mid-teens), clamped to the table cap."""
    return int(min(16, spec.cap))


def class_capacities(spec) -> tuple:
    """(narrow, full, bnd_narrow, bnd_full) static list capacities.

    The boundary-adjacent lists scale with the STATIC near-boundary
    cell fraction: occupied cells cluster near the floor, so the
    fraction of OCCUPIED cells that are boundary-adjacent runs well
    above the whole-domain fraction — the 3x safety factor covers the
    measured skew (100k dam: 15% of cells near-boundary, 26% of
    occupied ones; a 12k thin-z dam approaches 100%). Beyond-capacity
    cells hit the loud overflow counter."""
    k = spec.max_active
    frac = 1.0
    if spec.boundary is not None:
        frac = min(1.0, 3.0 * spec.boundary.near_frac)
    total_b = min(k, max(1024, int(k * frac)))
    # cap_narrow must cover the WHOLE active budget: a settled scene is
    # ~all-narrow, and any occupied cell that fits neither list loses
    # its entire solve (measured at the 12k dam when narrow was 3/4·k:
    # the dropped cells' particles free-fall, crowd wall cells past the
    # table cap, and trip the build overflow)
    return (k, max(256, k // 8), total_b, max(256, total_b // 4))


def _nbhd_max_occ(spec, mt):
    """Per-cell max occupancy over the 27-neighborhood, via three
    separable axis max-pools on the cell grid (no gathers)."""
    dims = spec.dims
    cnt = jnp.sum(mt > 0.0, axis=-1).astype(jnp.int32).reshape(dims)
    for ax in range(3):
        p = jnp.pad(cnt, [(1, 1) if a == ax else (0, 0)
                          for a in range(3)])
        lo = jax.lax.slice_in_dim(p, 0, dims[ax], axis=ax)
        hi = jax.lax.slice_in_dim(p, 2, dims[ax] + 2, axis=ax)
        cnt = jnp.maximum(cnt, jnp.maximum(lo, hi))
    return cnt.reshape(-1)


def _select(mask: Array, n: int, capacity: int):
    """Stable occupied-first selection of ids under ``mask`` (packed-key
    sort, as in ``cellgrid.build_fluid_tables``)."""
    bits = max(n - 1, 1).bit_length()
    assert bits + 1 <= 31
    packed = jnp.where(mask, 0, 1 << bits) + jnp.arange(n, dtype=jnp.int32)
    ids = (jnp.sort(packed)[:capacity] & ((1 << bits) - 1)).astype(jnp.int32)
    valid = jnp.arange(capacity) < jnp.sum(mask)
    return ids, valid


def _nbr_of(spec, cells, valid):
    """27 neighbor cell ids + validity for a cell-id list."""
    dims = spec.dims
    cx = cells // (dims[1] * dims[2])
    rem = cells - cx * (dims[1] * dims[2])
    cy = rem // dims[2]
    cz = rem - cy * dims[2]
    offs = jnp.asarray(_OFFS)
    nx = cx[:, None] + offs[None, :, 0]
    ny = cy[:, None] + offs[None, :, 1]
    nz = cz[:, None] + offs[None, :, 2]
    ok = ((nx >= 0) & (nx < dims[0]) & (ny >= 0) & (ny < dims[1])
          & (nz >= 0) & (nz < dims[2]) & valid[:, None])
    nbr = ((jnp.clip(nx, 0, dims[0] - 1) * dims[1]
            + jnp.clip(ny, 0, dims[1] - 1)) * dims[2]
           + jnp.clip(nz, 0, dims[2] - 1)).astype(jnp.int32)
    return nbr, ok


def partition_active(spec, mt):
    """Partition occupied cells into (narrow, full) lists by
    neighborhood max occupancy, and compact the boundary-adjacent
    occupied cells. Returns ``(narrow, full, bnd, overflow)`` where
    each entry is ``(cells, valid, nbr, nbr_ok)`` (bnd may be None)."""
    capn = narrow_cap(spec)
    cap_narrow, cap_full, cap_bn, cap_bf = class_capacities(spec)
    n_cells = spec.n_cells
    occ = jnp.any(mt > 0.0, axis=-1)
    m = _nbhd_max_occ(spec, mt)
    is_narrow = occ & (m <= capn)
    is_full = occ & (m > capn)

    def split(sel_a, sel_b, cap_a, cap_b_):
        """Spill-up partition: sel_a beyond cap_a joins sel_b; sel_b
        beyond cap_b_ is DROPPED (counted)."""
        rank_a = jnp.cumsum(sel_a.astype(jnp.int32)) - 1
        spill = sel_a & (rank_a >= cap_a)
        a = sel_a & ~spill
        b = sel_b | spill
        rank_b = jnp.cumsum(b.astype(jnp.int32)) - 1
        dropped = jnp.sum(b & (rank_b >= cap_b_))
        return a, b, dropped

    sel_n, sel_f, over = split(is_narrow, is_full, cap_narrow, cap_full)
    cells_n, valid_n = _select(sel_n, n_cells, cap_narrow)
    cells_f, valid_f = _select(sel_f, n_cells, cap_full)
    narrow = (cells_n, valid_n) + _nbr_of(spec, cells_n, valid_n)
    full = (cells_f, valid_f) + _nbr_of(spec, cells_f, valid_f)

    bnd = None
    bt = spec.boundary
    if bt is not None and bt.near is not None:
        # the boundary pass splits on OWN occupancy only (its ψ lane
        # width is fixed at 27·capb regardless of class)
        cnt = jnp.sum(mt > 0.0, axis=-1)
        occ_b = occ & bt.near
        sel_bn, sel_bf, over_b = split(occ_b & (cnt <= capn),
                                       occ_b & (cnt > capn),
                                       cap_bn, cap_bf)
        over = over + over_b
        cells_bn, valid_bn = _select(sel_bn, n_cells, cap_bn)
        cells_bf, valid_bf = _select(sel_bf, n_cells, cap_bf)
        bnd = [(cells_bn, valid_bn) + _nbr_of(spec, cells_bn, valid_bn),
               (cells_bf, valid_bf) + _nbr_of(spec, cells_bf, valid_bf)]
    return narrow, full, bnd, over


def _slice_cap(t: Array, capc: int) -> Array:
    return t if capc == t.shape[-1] else t[:, :capc]


def _pad_rows(a: Array, cap: int) -> Array:
    """(Kc, capc) -> (Kc, cap) zero-padded: class scatters must stay
    whole-row ops — TPU lowers mixed advanced+slice index scatters to
    per-element updates (~17 ns/element, serialized), which measured 10x
    slower than the entire unpartitioned step."""
    capc = a.shape[-1]
    if capc == cap:
        return a
    return jnp.pad(a, ((0, 0), (0, cap - capc)))


class _ClassCtx:
    """Per-class frozen data: own slots, neighbor gathers of the
    pre-projection state, and the frozen pair mask."""

    def __init__(self, spec, xt, mt, part, capc, h):
        cells, valid, nbr, nbr_ok = part
        self.cells, self.valid = cells, valid
        self.nbr, self.nbr_ok = nbr, nbr_ok
        self.capc = capc
        # scatter target ids: padding rows (valid=False) are real but
        # UNSELECTED cell ids — possibly owned by the other class — so
        # .set-style scatters must drop them (redirect out of range)
        self.scatter_cells = jnp.where(valid, cells, spec.n_cells)
        self.ma = _slice_cap(mt, capc)[cells]            # (Kc, capc)
        self.mfree = self.ma > 0.0
        m27 = _slice_cap(mt, capc)[nbr]                  # (Kc, 27, capc)
        m27 = jnp.where(nbr_ok[:, :, None], m27, 0.0)
        self.m27 = m27.reshape(cells.shape[0], 27 * capc)
        xa0 = [_slice_cap(p, capc)[cells] for p in xt]
        x27_0 = [self.gather27(p) for p in xt]
        r2_0 = sum((xa0[c][:, :, None] - x27_0[c][:, None, :]) ** 2
                   for c in range(3))
        self.pair_ok = ((self.m27[:, None, :] > 0.0)
                        & self.mfree[..., None]
                        & (r2_0 > 1e-18) & (r2_0 < h * h))

    def gather27(self, plane):
        """Current-state neighbor slots (Kc, 27·capc)."""
        t = _slice_cap(plane, self.capc)
        g = t[self.nbr]
        return g.reshape(g.shape[0], 27 * self.capc)

    def own(self, plane):
        return _slice_cap(plane, self.capc)[self.cells]


def _fluid_sums(ctx, xa, x27, density0, h):
    """Density/Σ‖∇C‖²/∇Cᵢ partial sums of the fluid pairs. The pair
    geometry is NOT returned: keeping (dc, gc) alive across the λ solve
    materializes ~8 GB/iteration of (Kc, capc, 27capc) planes (measured
    66 GB accessed/step); the correction phase recomputes them — flops
    are 3x cheaper than the bytes here."""
    dc = [xa[c][:, :, None] - x27[c][:, None, :] for c in range(3)]
    r2 = dc[0] * dc[0] + dc[1] * dc[1] + dc[2] * dc[2]
    rl = jnp.sqrt(r2)
    wk = jnp.where(ctx.pair_ok, sph.w_r(rl, h), 0.0)
    density = ctx.ma * sph.w_zero(h) \
        + jnp.sum(ctx.m27[:, None, :] * wk, -1)
    gc = -(ctx.m27[:, None, :] / density0) * sph.grad_w_coef(rl, h)
    gc = jnp.where(ctx.pair_ok, gc, 0.0)
    s2 = jnp.sum(gc * gc * r2, -1)
    gi = [-jnp.sum(gc * d, -1) for d in dc]
    return density, s2, gi


def _fluid_corr(ctx, xa, x27, lam, lam27, density0, h):
    """Δx of the fluid pairs (recomputed geometry, see _fluid_sums)."""
    dc = [xa[c][:, :, None] - x27[c][:, None, :] for c in range(3)]
    r2 = dc[0] * dc[0] + dc[1] * dc[1] + dc[2] * dc[2]
    gc = -(ctx.m27[:, None, :] / density0) \
        * sph.grad_w_coef(jnp.sqrt(r2), h)
    gc = jnp.where(ctx.pair_ok, gc, 0.0)
    coef = (lam[:, :, None] + lam27[:, None, :]) * gc
    return [-jnp.sum(coef * d, -1) for d in dc]


class _BndCtx:
    """Boundary-adjacent compacted cells (own axis sliced to ``capc``)
    with frozen static ψ tables."""

    def __init__(self, spec, xt, mt, part, capc, h):
        bt = spec.boundary
        cells, valid, nbr, nbr_ok = part
        self.cells = cells
        self.capc = capc
        self.scatter_cells = jnp.where(valid, cells, spec.n_cells)
        capb = bt.capb
        self.xb27 = [p[nbr].reshape(-1, 27 * capb) for p in bt.xt]
        self.pb27 = jnp.where(nbr_ok[:, :, None], bt.psit[nbr],
                              0.0).reshape(-1, 27 * capb)
        self.mb = _slice_cap(mt, capc)[cells]
        xa0 = [_slice_cap(p, capc)[cells] for p in xt]
        r2_0 = sum((xa0[c][:, :, None] - self.xb27[c][:, None, :]) ** 2
                   for c in range(3))
        self.ok = ((self.pb27[:, None, :] > 0.0)
                   & (self.mb[..., None] > 0.0) & (r2_0 < h * h))

    def gather_own(self, xt):
        return [_slice_cap(p, self.capc)[self.cells] for p in xt]

    def sums(self, xa, density0, h):
        dc = [xa[c][:, :, None] - self.xb27[c][:, None, :]
              for c in range(3)]
        r2 = dc[0] * dc[0] + dc[1] * dc[1] + dc[2] * dc[2]
        rl = jnp.sqrt(r2)
        wk = jnp.where(self.ok, sph.w_r(rl, h), 0.0)
        density = jnp.sum(self.pb27[:, None, :] * wk, -1)
        gc = -(self.pb27[:, None, :] / density0) * sph.grad_w_coef(rl, h)
        gc = jnp.where(self.ok, gc, 0.0)
        s2 = jnp.sum(gc * gc * r2, -1)
        gi = [-jnp.sum(gc * d, -1) for d in dc]
        return density, s2, gi

    def corr(self, xa, lam_b, density0, h):
        dc = [xa[c][:, :, None] - self.xb27[c][:, None, :]
              for c in range(3)]
        r2 = dc[0] * dc[0] + dc[1] * dc[1] + dc[2] * dc[2]
        gc = -(self.pb27[:, None, :] / density0) \
            * sph.grad_w_coef(jnp.sqrt(r2), h)
        gc = jnp.where(self.ok, gc, 0.0)
        coefb = lam_b[:, :, None] * gc
        return [-jnp.sum(coefb * d, -1) for d in dc]


def pbf_iterations_classes(spec, xt, mt, narrow, full, bnd,
                           n_iter: int, density0, support):
    """Occupancy-partitioned density projection; same math/contract as
    ``cellgrid.pbf_iterations``. Returns ``(xt, density, ctxs)`` with
    ``ctxs`` reusable by :func:`xsph_classes`."""
    eps = 1.0e-6
    h = support
    cap = spec.cap
    n_cells = spec.n_cells
    capn = narrow_cap(spec)

    ctxs = [_ClassCtx(spec, xt, mt, narrow, capn, h),
            _ClassCtx(spec, xt, mt, full, cap, h)]
    bctxs = ([_BndCtx(spec, xt, mt, bnd[0], capn, h),
              _BndCtx(spec, xt, mt, bnd[1], cap, h)]
             if bnd is not None else [])

    def body(carry, _):
        xt, _ = carry

        bnd_data = []
        if bctxs:
            bt_dens = jnp.zeros((n_cells, cap), jnp.float32)
            bt_s2 = jnp.zeros((n_cells, cap), jnp.float32)
            bt_gi = [jnp.zeros((n_cells, cap), jnp.float32)
                     for _ in range(3)]
            for bctx in bctxs:
                xab = bctx.gather_own(xt)
                b_dens, b_s2, b_gi = bctx.sums(xab, density0, h)
                sc = bctx.scatter_cells
                bt_dens = bt_dens.at[sc].set(_pad_rows(b_dens, cap),
                                             mode="drop")
                bt_s2 = bt_s2.at[sc].set(_pad_rows(b_s2, cap),
                                         mode="drop")
                bt_gi = [t.at[sc].set(_pad_rows(g, cap), mode="drop")
                         for t, g in zip(bt_gi, b_gi)]
                bnd_data.append(xab)

        lam_t = jnp.zeros((n_cells, cap), jnp.float32)
        dens_t = jnp.zeros((n_cells, cap), jnp.float32)
        cls_data = []
        for ctx in ctxs:
            xa = [ctx.own(p) for p in xt]
            x27 = [ctx.gather27(p) for p in xt]
            density, s2, gi = _fluid_sums(ctx, xa, x27, density0, h)
            if bctxs:
                density = density + ctx.own(bt_dens)
                s2 = s2 + ctx.own(bt_s2)
                gi = [g + ctx.own(t) for g, t in zip(gi, bt_gi)]
            s2 = s2 + sum(g * g for g in gi)
            c_val = jnp.maximum(density / density0 - 1.0, 0.0)
            lam = jnp.where((c_val > 0.0) & ctx.mfree,
                            -c_val / (s2 + eps), 0.0)
            # whole-row scatters: slots >= capc of a narrow cell hold
            # no particles, so padding zeros is exact
            lam_t = lam_t.at[ctx.scatter_cells].set(
                _pad_rows(lam, cap), mode="drop")
            dens_t = dens_t.at[ctx.scatter_cells].set(
                _pad_rows(density, cap), mode="drop")
            cls_data.append((lam, xa, x27))

        new_xt = list(xt)
        for ctx, (lam, xa, x27) in zip(ctxs, cls_data):
            lam27 = ctx.gather27(lam_t)
            corr = _fluid_corr(ctx, xa, x27, lam, lam27, density0, h)
            upd = [jnp.where(ctx.mfree & ctx.valid[:, None], cc, 0.0)
                   for cc in corr]
            for c in range(3):
                new_xt[c] = new_xt[c].at[ctx.scatter_cells].add(
                    _pad_rows(upd[c], cap), mode="drop")

        for bctx, xab in zip(bctxs, bnd_data):
            lam_b = _slice_cap(lam_t, bctx.capc)[bctx.cells]
            corr_b = bctx.corr(xab, lam_b, density0, h)
            for c in range(3):
                new_xt[c] = new_xt[c].at[bctx.scatter_cells].add(
                    _pad_rows(jnp.where(bctx.mb > 0.0, corr_b[c], 0.0),
                              cap), mode="drop")

        return (tuple(new_xt), dens_t), None

    (xt, density), _ = jax.lax.scan(
        body, (tuple(xt), jnp.zeros_like(mt)), None, length=n_iter)
    return xt, density, ctxs


def xsph_classes(spec, xt, vt, mt, ctxs, density, viscosity, support):
    """XSPH viscosity over the occupancy classes (fluid neighbors only,
    frozen pair masks) — math of ``cellgrid.xsph_cell``."""
    dmax = jnp.maximum(density, 1e-6)
    out = list(vt)
    for ctx in ctxs:
        xa = [ctx.own(p) for p in xt]
        va = [ctx.own(p) for p in vt]
        x27 = [ctx.gather27(p) for p in xt]
        v27 = [ctx.gather27(p) for p in vt]
        d27 = jnp.maximum(ctx.gather27(dmax), 1e-6)
        rl = jnp.sqrt(sum((xa[c][:, :, None] - x27[c][:, None, :]) ** 2
                          for c in range(3)))
        wk = jnp.where(ctx.pair_ok, sph.w_r(rl, support), 0.0)
        coef = ctx.m27[:, None, :] / d27[:, None, :] * wk
        for c in range(3):
            dv = jnp.sum(coef * (va[c][:, :, None] - v27[c][:, None, :]),
                         -1)
            out[c] = out[c].at[ctx.cells].add(
                _pad_rows(jnp.where(ctx.mfree & ctx.valid[:, None],
                                    -viscosity * dv, 0.0),
                          out[c].shape[-1]), mode="drop")
    return tuple(out)

"""Cell-dense PBF pipeline — the TPU-native neighbor design.

The hash-candidate path (``neighborhood.py``) evaluates 27·cap
candidates per PARTICLE via random scalar gathers; at the 100k dam that
is ~72M gathers per density iteration at ~several ns each (measured
440 ms/iteration). This module restructures the solve around per-cell
tables (SURVEY §7 step 8 "fixed-grid cell-sort neighbor search"):

* once per step, fluid particles are sorted by cell id on a STATIC
  domain grid (cell = support radius) and scattered into a dense
  ``(n_cells, cap)`` slot table — O(N) rows, the only per-particle
  irregular op;
* the OCCUPIED cells are compacted into a fixed-capacity active list
  (fluid fills a small fraction of a dam's domain box; dense
  whole-domain pair arrays cost 8×+ waste and blow HBM at 100k scale);
* each active cell gathers its 27 neighbor cells' table ROWS — coarse
  ``cap·3``-element rows, not per-particle scalars — and all SPH sums
  become dense ``(K, cap, 27·cap)`` pairwise arithmetic on the VPU;
* pair sets are FROZEN per step from pre-projection distances (the
  reference's once-per-step neighborhood semantics,
  ``TimeStepFluidModel.cpp:30-38``);
* boundary particles are static: their compact per-cell tables and ψ
  weights bake once at scene build with exact per-scene capacity.

Semantics match ``PositionBasedFluids.cpp:8-141`` (density → λ →
correction per iteration; boundary neighbors ψ-weighted with λ_b = 0),
asserted against the hash path in ``tests/test_fluids.py``.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from . import sph

Array = jax.Array


def _register(cls):
    data = [f.name for f in dataclasses.fields(cls)
            if not f.metadata.get("static")]
    meta = [f.name for f in dataclasses.fields(cls)
            if f.metadata.get("static")]
    return jax.tree_util.register_dataclass(cls, data_fields=data,
                                            meta_fields=meta)


_OFFS = np.array([(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                  for dz in (-1, 0, 1)], np.int32)


@_register
@dataclass(frozen=True)
class BoundaryTables:
    """Static boundary-particle cell tables (compact; baked per scene)."""

    xt: tuple      # 3 × (n_cells, capb) component planes
    psit: Array    # (n_cells, capb) ψ weights, 0 on empty slots
    capb: int = field(metadata=dict(static=True))
    # (n_cells,) bool — cell has a boundary particle in its
    # 27-neighborhood (static: boundary never moves). Lets the
    # partitioned path (classgrid.py) restrict ψ pair lanes to
    # adjacent cells. near_frac is its static density, used to size
    # the boundary-adjacent list capacities (a thin/small domain can
    # have nearly ALL cells boundary-adjacent).
    near: Array = None
    near_frac: float = field(default=1.0, metadata=dict(static=True))


@_register
@dataclass(frozen=True)
class CellGridSpec:
    """Static fluid cell grid over a bounded domain."""

    origin: tuple = field(metadata=dict(static=True))
    dims: tuple = field(metadata=dict(static=True))    # (ncx, ncy, ncz)
    cell: float = field(metadata=dict(static=True))    # = support radius
    cap: int = field(metadata=dict(static=True))
    max_active: int = field(metadata=dict(static=True))
    boundary: BoundaryTables = None

    @property
    def n_cells(self) -> int:
        ncx, ncy, ncz = self.dims
        return ncx * ncy * ncz

    @staticmethod
    def create(lo, hi, support, cap=12, boundary_x=None, boundary_psi=None,
               max_active=None, n_fluid_hint=None):
        """``max_active`` defaults to ``n_fluid/6`` — valid for settled
        or pouring liquids (~8 particles per support cell at rest). A
        fully DISPERSED spray/splash phase can occupy far more cells
        than n/6; occupied cells beyond the cap silently lose their SPH
        interactions for the step, detected only via the overflow
        counter (ADVICE r4). If a workload has a ballistic/spray phase,
        pass ``max_active`` explicitly (up to the domain cell count) and
        ALWAYS check ``FluidState.overflow == 0`` in production drives —
        bench.py and the tests assert it."""
        lo = np.asarray(lo, np.float64) - support
        hi = np.asarray(hi, np.float64) + support
        dims = tuple(int(v) for v in
                     np.maximum(np.ceil((hi - lo) / support), 1))
        n_cells = int(np.prod(dims))
        if max_active is None:
            hint = n_fluid_hint if n_fluid_hint else n_cells
            # rest occupancy is (h/diam)³ = 8 particles/cell; /6 leaves
            # ~25% headroom over a settled liquid's occupied-cell count
            # before the loud overflow counter fires
            max_active = int(min(n_cells, max(hint // 6, 512)))
        spec = CellGridSpec(origin=tuple(float(v) for v in lo),
                            dims=dims, cell=float(support), cap=int(cap),
                            max_active=max_active)
        if boundary_x is not None and len(boundary_x):
            bx = np.asarray(boundary_x, np.float64)
            cell = np.clip(((bx - lo) / support).astype(np.int64), 0,
                           np.asarray(dims) - 1)
            cid = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
            counts = np.bincount(cid, minlength=n_cells)
            capb = int(counts.max())
            order = np.argsort(cid, kind="stable")
            rank = np.arange(len(bx)) - (np.cumsum(counts)
                                         - counts)[cid[order]]
            slot = cid[order] * capb + rank
            xt = np.zeros((n_cells * capb, 3), np.float32)
            pt = np.zeros((n_cells * capb,), np.float32)
            xt[slot] = bx[order]
            pt[slot] = np.asarray(boundary_psi, np.float32)[order]
            # static boundary-adjacency (27-cell dilation of occupancy)
            occ = (pt.reshape(n_cells, capb) > 0).any(-1).reshape(dims)
            near = np.zeros(dims, bool)
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dz in (-1, 0, 1):
                        sl = lambda d, n: slice(max(d, 0), n + min(d, 0))
                        dst = tuple(sl(-d, n)
                                    for d, n in zip((dx, dy, dz), dims))
                        src = tuple(sl(d, n)
                                    for d, n in zip((dx, dy, dz), dims))
                        near[dst] |= occ[src]
            spec = dataclasses.replace(spec, boundary=BoundaryTables(
                xt=tuple(jnp.asarray(xt[:, c].reshape(n_cells, capb))
                         for c in range(3)),
                psit=jnp.asarray(pt.reshape(n_cells, capb)),
                capb=capb, near=jnp.asarray(near.reshape(-1)),
                near_frac=float(near.mean())))
        return spec


def build_fluid_tables(spec: CellGridSpec, x: Array, mass: Array):
    """Sort fluid particles into cell slots and compact occupied cells.

    Returns ``(slot (N,), kept (N,), xt (n_cells, cap, 3),
    mt (n_cells, cap), active (K,), nbr (K, 27), nbr_ok (K, 27),
    overflow)`` — ``overflow`` counts particles crowded out by ``cap``
    PLUS occupied cells beyond ``max_active`` (loud counter)."""
    n = x.shape[0]
    dims = spec.dims
    dimj = jnp.asarray(dims)
    cell = jnp.clip(
        jnp.floor((x - jnp.asarray(spec.origin, jnp.float32))
                  / spec.cell).astype(jnp.int32), 0, dimj - 1)
    cid = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
    # sort_key_val, not argsort: argsort's TPU lowering is far slower
    # (order within a cell is arbitrary either way)
    cid_s, order = jax.lax.sort_key_val(
        cid, jnp.arange(n, dtype=jnp.int32))
    first = jnp.searchsorted(cid_s, cid_s, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    over_slots = jnp.sum(rank >= spec.cap)
    slot_s = jnp.where(rank < spec.cap, cid_s * spec.cap + rank,
                       spec.n_cells * spec.cap)
    nslots = spec.n_cells * spec.cap
    # component-plane tables: a (slots, 3) layout makes every later
    # per-component slice of gathered (K, 27cap, 3) arrays a strided
    # relayout copy of the whole array (measured 459 ms/iteration at
    # the 100k dam; planes run the same math at a fraction of that)
    xt = tuple(
        jnp.zeros((nslots,), jnp.float32).at[slot_s].set(
            x[order, c], mode="drop").reshape(spec.n_cells, spec.cap)
        for c in range(3))
    mt = jnp.zeros((nslots,), jnp.float32).at[slot_s].set(
        mass[order], mode="drop")
    slot = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.minimum(slot_s, nslots - 1).astype(jnp.int32))
    kept = jnp.zeros((n,), bool).at[order].set(rank < spec.cap)
    mt = mt.reshape(spec.n_cells, spec.cap)

    # active-cell compaction (occupied cells first, stable) via ONE
    # packed-key value sort — argsort/stable-argsort lower terribly on
    # TPU (comparator sorts of key+index pairs)
    occupied = jnp.any(mt > 0.0, axis=-1)
    bits = max(spec.n_cells - 1, 1).bit_length()
    assert bits + 1 <= 31, "cell count exceeds int32 packing"
    packed = jnp.where(occupied, 0, 1 << bits) \
        + jnp.arange(spec.n_cells, dtype=jnp.int32)
    active = (jnp.sort(packed)[:spec.max_active]
              & ((1 << bits) - 1)).astype(jnp.int32)         # (K,)
    n_occ = jnp.sum(occupied)
    overflow = over_slots + jnp.maximum(n_occ - spec.max_active, 0)
    act_occ = occupied[active]

    # 27 neighbor cell ids per active cell (+ in-domain validity)
    az = active // (dims[1] * dims[2])
    rem = active - az * (dims[1] * dims[2])
    ay = rem // dims[2]
    ax_ = rem - ay * dims[2]
    offs = jnp.asarray(_OFFS)
    nx = az[:, None] + offs[None, :, 0]
    ny = ay[:, None] + offs[None, :, 1]
    nz = ax_[:, None] + offs[None, :, 2]
    nbr_ok = ((nx >= 0) & (nx < dims[0]) & (ny >= 0) & (ny < dims[1])
              & (nz >= 0) & (nz < dims[2]) & act_occ[:, None])
    nbr = ((jnp.clip(nx, 0, dims[0] - 1) * dims[1]
            + jnp.clip(ny, 0, dims[1] - 1)) * dims[2]
           + jnp.clip(nz, 0, dims[2] - 1)).astype(jnp.int32)
    return (slot, kept, xt, mt, active, nbr, nbr_ok, overflow)


def _gather27(table: Array, nbr: Array, nbr_ok=None, fill=0.0) -> Array:
    """``table (n_cells, cap, ...)`` gathered at ``nbr (K, 27)`` →
    ``(K, 27·cap, ...)`` (coarse cell-row gathers)."""
    g = table[nbr]                                  # (K, 27, cap, ...)
    if nbr_ok is not None:
        shape = nbr_ok.shape + (1,) * (g.ndim - 2)
        g = jnp.where(nbr_ok.reshape(shape), g, fill)
    return g.reshape((g.shape[0], 27 * g.shape[2]) + g.shape[3:])


def pbf_iterations(spec: CellGridSpec, xt, mt, active, nbr, nbr_ok,
                   n_iter: int, density0, support):
    """Run ``n_iter`` density-projection iterations over the active
    cells. Returns ``(xt, density (n_cells, cap))``; pair sets frozen
    from the pre-projection positions."""
    eps = 1.0e-6
    bt = spec.boundary
    w0 = sph.w_zero(support)
    ma = mt[active]                                  # (K, cap)
    m27 = _gather27(mt, nbr, nbr_ok)                 # (K, 27cap)

    def _pair_dc(xt):
        xa = [p[active] for p in xt]
        x27 = [_gather27(p, nbr) for p in xt]
        return [xa[c][:, :, None] - x27[c][:, None, :] for c in range(3)]

    dc0 = _pair_dc(xt)
    r2_0 = dc0[0] ** 2 + dc0[1] ** 2 + dc0[2] ** 2
    pair_ok = ((m27[:, None, :] > 0.0) & (ma[..., None] > 0.0)
               & (r2_0 > 1e-18) & (r2_0 < support * support))
    if bt is not None:
        xb27 = [_gather27(p, nbr) for p in bt.xt]    # 3 × (K, 27capb)
        pb27 = _gather27(bt.psit, nbr, nbr_ok)       # (K, 27capb)

        def _pair_dcb(xt):
            xa = [p[active] for p in xt]
            return [xa[c][:, :, None] - xb27[c][:, None, :]
                    for c in range(3)]

        dcb0 = _pair_dcb(xt)
        r2b_0 = dcb0[0] ** 2 + dcb0[1] ** 2 + dcb0[2] ** 2
        okb = ((pb27[:, None, :] > 0.0) & (ma[..., None] > 0.0)
               & (r2b_0 < support * support))

    def body(carry, _):
        xt, _ = carry
        dc = _pair_dc(xt)                            # 3 × (K, cap, 27cap)
        r2 = dc[0] * dc[0] + dc[1] * dc[1] + dc[2] * dc[2]
        rl = jnp.sqrt(r2)
        wk = jnp.where(pair_ok, sph.w_r(rl, support), 0.0)
        density = ma * w0 + jnp.sum(m27[:, None, :] * wk, -1)
        gc = -(m27[:, None, :] / density0) * sph.grad_w_coef(rl, support)
        gc = jnp.where(pair_ok, gc, 0.0)
        sum_grad2 = jnp.sum(gc * gc * r2, -1)
        grad_i = [-jnp.sum(gc * d, -1) for d in dc]

        if bt is not None:
            dcb = _pair_dcb(xt)
            r2b = dcb[0] * dcb[0] + dcb[1] * dcb[1] + dcb[2] * dcb[2]
            rlb = jnp.sqrt(r2b)
            wkb = jnp.where(okb, sph.w_r(rlb, support), 0.0)
            density = density + jnp.sum(pb27[:, None, :] * wkb, -1)
            gcb = (-(pb27[:, None, :] / density0)
                   * sph.grad_w_coef(rlb, support))
            gcb = jnp.where(okb, gcb, 0.0)
            sum_grad2 = sum_grad2 + jnp.sum(gcb * gcb * r2b, -1)
            grad_i = [g - jnp.sum(gcb * d, -1)
                      for g, d in zip(grad_i, dcb)]

        sum_grad2 = sum_grad2 + sum(g * g for g in grad_i)
        c_val = jnp.maximum(density / density0 - 1.0, 0.0)
        lam = jnp.where((c_val > 0.0) & (ma > 0.0),
                        -c_val / (sum_grad2 + eps), 0.0)
        lam_t = jnp.zeros((spec.n_cells, spec.cap),
                          jnp.float32).at[active].set(lam)
        lam27 = _gather27(lam_t, nbr, nbr_ok)
        coef = (lam[:, :, None] + lam27[:, None, :]) * gc
        corr = [-jnp.sum(coef * d, -1) for d in dc]
        if bt is not None:
            coefb = lam[:, :, None] * gcb
            corr = [cc - jnp.sum(coefb * d, -1)
                    for cc, d in zip(corr, dcb)]
        mfree = (ma > 0.0)
        xt = tuple(p.at[active].add(jnp.where(mfree, cc, 0.0))
                   for p, cc in zip(xt, corr))
        dens_t = jnp.zeros((spec.n_cells, spec.cap),
                           jnp.float32).at[active].set(density)
        return (xt, dens_t), None

    (xt, density), _ = jax.lax.scan(
        body, (tuple(xt), jnp.zeros_like(mt)), None, length=n_iter)
    return xt, density, pair_ok


def xsph_cell(spec: CellGridSpec, xt, vt, mt, active, nbr, nbr_ok,
              density, viscosity, support, pair_ok):
    """XSPH viscosity over active cells (fluid neighbors only;
    ``pair_ok`` is the step's frozen pair mask)."""
    xa = [p[active] for p in xt]
    va = [p[active] for p in vt]
    ma = mt[active]
    x27 = [_gather27(p, nbr) for p in xt]
    v27 = [_gather27(p, nbr) for p in vt]
    m27 = _gather27(mt, nbr, nbr_ok)
    d27 = _gather27(density, nbr, nbr_ok, fill=1.0)
    rl = jnp.sqrt(sum((xa[c][:, :, None] - x27[c][:, None, :]) ** 2
                      for c in range(3)))
    wk = jnp.where(pair_ok, sph.w_r(rl, support), 0.0)
    coef = m27[:, None, :] / jnp.maximum(d27[:, None, :], 1e-6) * wk
    mfree = ma > 0.0
    out = []
    for c in range(3):
        dv = jnp.sum(coef * (va[c][:, :, None] - v27[c][:, None, :]), -1)
        out.append(vt[c].at[active].add(
            jnp.where(mfree, -viscosity * dv, 0.0)))
    return tuple(out)

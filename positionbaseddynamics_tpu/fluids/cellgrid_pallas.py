"""Fused Pallas kernels for the cell-dense PBF pipeline.

The XLA cell-dense path (``fluids/cellgrid.py``) materializes
``(K, cap, 27·cap)`` pair planes — at the 100k dam that is ~1.4 GB per
plane and the step is pure HBM traffic (4.4 steps/s measured). These
kernels fuse each density-projection pass over a block of active cells
so every pair-plane intermediate lives in VMEM; the only HBM traffic
per iteration is the ``(K, L)`` neighbor gathers (done by XLA between
kernels, where L = lane-padded ``27·cap``) and the ``(K, cap)``
outputs.

Three kernels, mirroring the reference PBF math exactly
(``PositionBasedFluids.{h,cpp}``, ``TimeStepFluidModel.cpp:21-68``):

* **density+λ** (per iteration) — ``computePBFDensity`` +
  ``computePBFLagrangeMultiplier`` with Akinci boundary ψ terms;
* **corrections** (per iteration) — ``solveDensityConstraint``; needs
  the λ of *neighbor* particles, hence the split (λ is scattered to the
  cell table and re-gathered between the two kernels);
* **XSPH** (once per step) — ``computeXSPHViscosity`` over fluid
  neighbors.

Pair-set semantics match the XLA path bit-for-bit: the neighbor SET is
frozen from the pre-projection positions (``r²₀ < h²``, self excluded,
mass-masked), while kernel values use current positions.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import sph

Array = jax.Array


def _pad128(n: int) -> int:
    return ((n + 127) // 128) * 128


def _gather27_padded(table: Array, nbr: Array, nbr_ok: Array, l: int,
                     fill=0.0) -> Array:
    """``table (n_cells, cap)`` gathered at ``nbr (K, 27)`` → lane-padded
    ``(K, l)``. WHOLE-ROW gathers (cell rows are contiguous) — per-slot
    element gathers here were 15× slower end-to-end on TPU."""
    g = table[nbr]                                  # (K, 27, cap)
    g = jnp.where(nbr_ok[:, :, None], g, fill)
    k = g.shape[0]
    g = g.reshape(k, -1)
    if l > g.shape[1]:
        g = jnp.pad(g, ((0, 0), (0, l - g.shape[1])),
                    constant_values=fill)
    return g


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _pair_geometry(xa_ref, x27_ref, xa0_ref, x270_ref, ma, m27e, h):
    """Frozen pair mask + current displacement planes, shared by all
    three kernels (the pair SET is frozen from pre-projection distances
    — the reference's per-step neighborhood search semantics,
    ``NeighborhoodSearchSpatialHashing.cpp:89-160``)."""
    dc0 = [xa0_ref[c][:, :, None] - x270_ref[c][:, None, :]
           for c in range(3)]
    r2_0 = dc0[0] ** 2 + dc0[1] ** 2 + dc0[2] ** 2
    ok = ((m27e > 0.0) & (ma[:, :, None] > 0.0)
          & (r2_0 > 1e-18) & (r2_0 < h * h))
    dc = [xa_ref[c][:, :, None] - x27_ref[c][:, None, :]
          for c in range(3)]
    r2 = dc[0] ** 2 + dc[1] ** 2 + dc[2] ** 2
    return ok, dc, r2


def _boundary_geometry(xa_ref, xa0_ref, xb27_ref, pb27_ref, ma, h):
    pb = pb27_ref[:][:, None, :]
    dcb0 = [xa0_ref[c][:, :, None] - xb27_ref[c][:, None, :]
            for c in range(3)]
    r2b0 = dcb0[0] ** 2 + dcb0[1] ** 2 + dcb0[2] ** 2
    okb = (pb > 0.0) & (ma[:, :, None] > 0.0) & (r2b0 < h * h)
    dcb = [xa_ref[c][:, :, None] - xb27_ref[c][:, None, :]
           for c in range(3)]
    r2b = dcb[0] ** 2 + dcb[1] ** 2 + dcb[2] ** 2
    return okb, pb, dcb, r2b


def _density_lambda_kernel(xa_ref, xa0_ref, x27_ref, x270_ref, ma_ref,
                           m27_ref, xb27_ref, pb27_ref, lam_ref,
                           dens_ref, *, h, density0, w0):
    eps = 1.0e-6
    ma = ma_ref[:]                                   # (Kb, cap)
    m27e = m27_ref[:][:, None, :]                    # (Kb, 1, L)
    ok, dc, r2 = _pair_geometry(xa_ref, x27_ref, xa0_ref, x270_ref,
                                ma, m27e, h)
    rl = jnp.sqrt(r2)
    wk = jnp.where(ok, sph.w_r(rl, h), 0.0)
    dens = ma * w0 + jnp.sum(m27e * wk, -1)
    gc = jnp.where(ok, -(m27e / density0) * sph.grad_w_coef(rl, h), 0.0)
    sg2 = jnp.sum(gc * gc * r2, -1)
    gi = [-jnp.sum(gc * d, -1) for d in dc]

    okb, pb, dcb, r2b = _boundary_geometry(xa_ref, xa0_ref, xb27_ref,
                                           pb27_ref, ma, h)
    rlb = jnp.sqrt(r2b)
    wkb = jnp.where(okb, sph.w_r(rlb, h), 0.0)
    dens = dens + jnp.sum(pb * wkb, -1)
    gcb = jnp.where(okb, -(pb / density0) * sph.grad_w_coef(rlb, h), 0.0)
    sg2 = sg2 + jnp.sum(gcb * gcb * r2b, -1)
    gi = [g - jnp.sum(gcb * d, -1) for g, d in zip(gi, dcb)]

    sg2 = sg2 + sum(g * g for g in gi)
    c_val = jnp.maximum(dens / density0 - 1.0, 0.0)
    lam_ref[:] = jnp.where((c_val > 0.0) & (ma > 0.0),
                           -c_val / (sg2 + eps), 0.0)
    dens_ref[:] = dens


def _corr_kernel(xa_ref, xa0_ref, x27_ref, x270_ref, ma_ref, m27_ref,
                 lam_ref, lam27_ref, xb27_ref, pb27_ref, corr_ref,
                 *, h, density0):
    ma = ma_ref[:]
    m27e = m27_ref[:][:, None, :]
    ok, dc, r2 = _pair_geometry(xa_ref, x27_ref, xa0_ref, x270_ref,
                                ma, m27e, h)
    rl = jnp.sqrt(r2)
    gc = jnp.where(ok, -(m27e / density0) * sph.grad_w_coef(rl, h), 0.0)
    coef = (lam_ref[:][:, :, None] + lam27_ref[:][:, None, :]) * gc

    okb, pb, dcb, r2b = _boundary_geometry(xa_ref, xa0_ref, xb27_ref,
                                           pb27_ref, ma, h)
    rlb = jnp.sqrt(r2b)
    gcb = jnp.where(okb, -(pb / density0) * sph.grad_w_coef(rlb, h), 0.0)
    coefb = lam_ref[:][:, :, None] * gcb

    mfree = ma > 0.0
    for c in range(3):
        corr = (-jnp.sum(coef * dc[c], -1)
                - jnp.sum(coefb * dcb[c], -1))
        corr_ref[c] = jnp.where(mfree, corr, 0.0)


def _xsph_kernel(xa_ref, xa0_ref, x27_ref, x270_ref, va_ref, v27_ref,
                 ma_ref, m27_ref, d27_ref, dv_ref, *, h):
    ma = ma_ref[:]
    m27e = m27_ref[:][:, None, :]
    ok, dc, r2 = _pair_geometry(xa_ref, x27_ref, xa0_ref, x270_ref,
                                ma, m27e, h)
    rl = jnp.sqrt(r2)
    wk = jnp.where(ok, sph.w_r(rl, h), 0.0)
    d27e = d27_ref[:][:, None, :]
    coef = m27e / jnp.maximum(d27e, 1e-6) * wk
    mfree = ma > 0.0
    for c in range(3):
        dv = jnp.sum(coef * (va_ref[c][:, :, None]
                             - v27_ref[c][:, None, :]), -1)
        dv_ref[c] = jnp.where(mfree, dv, 0.0)


# ---------------------------------------------------------------------------
# host-side assembly
# ---------------------------------------------------------------------------


def _pad_k(a, kp):
    k = a.shape[0]
    if k == kp:
        return a
    pad = [(0, kp - k)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad)


def _specs(kb, cap, l, lb, n3=True):
    """BlockSpec helpers: component-plane stacks (3, K, ·) and flat
    (K, ·) arrays, blocked along K."""
    def s3(width):
        return pl.BlockSpec((3, kb, width), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def s1(width):
        return pl.BlockSpec((kb, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return s3, s1


def pbf_step_pallas(spec, xt, mt, active, nbr, nbr_ok, n_iter,
                    density0, support, vt=None, viscosity=0.0,
                    block_k=8, interpret=None, density=None):
    """Density-projection iterations (+ optional XSPH when ``vt`` is
    given) through the fused kernels. Same inputs/semantics as
    ``cellgrid.pbf_iterations`` (+``xsph_cell``); returns
    ``(xt, density_table, vt_or_None)``. ``n_iter=0`` with ``vt`` and a
    precomputed ``density`` runs only the XSPH kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cap = spec.cap
    k = active.shape[0]
    kp = ((k + block_k - 1) // block_k) * block_k
    grid = (kp // block_k,)
    h = float(support)

    l = _pad128(27 * cap)
    bt = spec.boundary
    if bt is not None:
        lb = _pad128(27 * bt.capb)
        xb27 = jnp.stack([_gather27_padded(p, nbr, nbr_ok, lb)
                          for p in bt.xt])
        pb27 = _gather27_padded(bt.psit, nbr, nbr_ok, lb)
    else:
        lb = 128
        xb27 = jnp.zeros((3, k, lb), jnp.float32)
        pb27 = jnp.zeros((k, lb), jnp.float32)

    ma = mt[active]
    m27 = _gather27_padded(mt, nbr, nbr_ok, l)
    xa0 = jnp.stack([p[active] for p in xt])                 # (3, K, cap)
    x270 = jnp.stack([_gather27_padded(p, nbr, nbr_ok, l)
                      for p in xt])                          # (3, K, L)

    # pad the K axis to a whole number of blocks (padded rows carry
    # ma=0 → fully masked)
    ma_p = _pad_k(ma, kp)
    m27_p = _pad_k(m27, kp)
    xa0_p = jnp.moveaxis(_pad_k(jnp.moveaxis(xa0, 1, 0), kp), 0, 1)
    x270_p = jnp.moveaxis(_pad_k(jnp.moveaxis(x270, 1, 0), kp), 0, 1)
    xb27_p = jnp.moveaxis(_pad_k(jnp.moveaxis(xb27, 1, 0), kp), 0, 1)
    pb27_p = _pad_k(pb27, kp)

    s3, s1 = _specs(block_k, cap, l, lb)
    w0 = 8.0 / (np.pi * h ** 3)        # sph.w_zero, host-side scalar

    dens_kernel = pl.pallas_call(
        functools.partial(_density_lambda_kernel, h=h,
                          density0=float(density0), w0=w0),
        grid=grid,
        in_specs=[s3(cap), s3(cap), s3(l), s3(l), s1(cap), s1(l),
                  s3(lb), s1(lb)],
        out_specs=[s1(cap), s1(cap)],
        out_shape=[jax.ShapeDtypeStruct((kp, cap), jnp.float32),
                   jax.ShapeDtypeStruct((kp, cap), jnp.float32)],
        interpret=interpret,
    )
    corr_kernel = pl.pallas_call(
        functools.partial(_corr_kernel, h=h, density0=float(density0)),
        grid=grid,
        in_specs=[s3(cap), s3(cap), s3(l), s3(l), s1(cap), s1(l),
                  s1(cap), s1(l), s3(lb), s1(lb)],
        out_specs=s3(cap),
        out_shape=jax.ShapeDtypeStruct((3, kp, cap), jnp.float32),
        interpret=interpret,
    )

    def body(carry, _):
        xt, _ = carry
        xa = jnp.moveaxis(
            _pad_k(jnp.stack([p[active] for p in xt], 1), kp), 0, 1)
        x27 = jnp.moveaxis(
            _pad_k(jnp.stack([_gather27_padded(p, nbr, nbr_ok, l)
                              for p in xt], 1), kp), 0, 1)
        lam, dens = dens_kernel(xa, xa0_p, x27, x270_p, ma_p, m27_p,
                                xb27_p, pb27_p)
        lam = lam[:k]
        lam_t = jnp.zeros((spec.n_cells, cap),
                          jnp.float32).at[active].set(lam)
        lam27 = _pad_k(_gather27_padded(lam_t, nbr, nbr_ok, l), kp)
        corr = corr_kernel(xa, xa0_p, x27, x270_p, ma_p, m27_p,
                           _pad_k(lam, kp), lam27, xb27_p, pb27_p)
        xt = tuple(p.at[active].add(corr[c][:k])
                   for c, p in enumerate(xt))
        dens_t = jnp.zeros((spec.n_cells, cap),
                           jnp.float32).at[active].set(dens[:k])
        return (xt, dens_t), None

    if n_iter > 0:
        (xt, density), _ = jax.lax.scan(
            body, (tuple(xt), jnp.zeros_like(mt)), None, length=n_iter)
    else:
        xt = tuple(xt)
        if density is None:
            density = jnp.zeros_like(mt)

    vt_out = None
    if vt is not None:
        xsph_kernel = pl.pallas_call(
            functools.partial(_xsph_kernel, h=h),
            grid=grid,
            in_specs=[s3(cap), s3(cap), s3(l), s3(l), s3(cap), s3(l),
                      s1(cap), s1(l), s1(l)],
            out_specs=s3(cap),
            out_shape=jax.ShapeDtypeStruct((3, kp, cap), jnp.float32),
            interpret=interpret,
        )
        xa = jnp.moveaxis(
            _pad_k(jnp.stack([p[active] for p in xt], 1), kp), 0, 1)
        x27 = jnp.moveaxis(
            _pad_k(jnp.stack([_gather27_padded(p, nbr, nbr_ok, l)
                              for p in xt], 1), kp), 0, 1)
        va = jnp.moveaxis(
            _pad_k(jnp.stack([p[active] for p in vt], 1), kp), 0, 1)
        v27 = jnp.moveaxis(
            _pad_k(jnp.stack([_gather27_padded(p, nbr, nbr_ok, l)
                              for p in vt], 1), kp), 0, 1)
        d27 = _pad_k(_gather27_padded(density, nbr, nbr_ok, l), kp)
        dv = xsph_kernel(xa, xa0_p, x27, x270_p, va, v27, ma_p, m27_p,
                         d27)
        vt_out = tuple(
            p.at[active].add(-viscosity * dv[c][:k])
            for c, p in enumerate(vt))
    return xt, density, vt_out

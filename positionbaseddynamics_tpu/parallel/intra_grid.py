"""Intra-scene sharding v2: one structured-grid cloth distributed over
the device mesh by ROW BLOCKS with halo exchange.

SURVEY.md §2.6 row 4, second iteration. v1 (``parallel/intra.py``)
all_gathers the full (N, 3) position array per constraint family per
iteration and psums a full-size correction buffer — O(N) ICI traffic
per shard per family pass, which erases the point of sharding at large
N. A regular grid shards naturally by rows instead:

* every device owns ``H/n_dev`` grid rows; integration and velocity
  update are purely local;
* a projection pass needs neighbor data only one row deep (distance
  stencils reach ±1 row, bending flaps ±1 row), so each pass exchanges
  exactly ONE boundary row each way (``lax.ppermute``) before the
  gather and ONE accumulator row each way after the scatter;
* per-constraint XPBD λ lives with the shard that owns the constraint's
  anchor row — no communication at all.

Per-substep ICI traffic: 2 passes × 4 one-row transfers of (W, 3)
float32 ≈ **30 KB at W=320** vs the v1 path's ~7 MB (6 families ×
all_gather + psum of the full 1.2 MB position array) — O(halo), not
O(N). Trajectory equals the single-device structured-grid stepper to
float tolerance (``tests/test_intra_sharding.py``).

Stencil algebra matches ``solver/grid_cloth.py`` exactly (same
constraint anchors; masks written like the Pallas kernel's
``solver/grid_cloth_pallas.py``: validity from global row/col index,
ownership from the block's row range, parity from
``helper(i,j) = (i%2 == j%2)``, ``SimulationModel.cpp:831-903``).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver.grid_cloth import GridClothBatch
from ..solver.grid_cloth_pallas import (_DIST, _BEND, _family_rest,
                                        _family_svec)
from ..solver.step import StepConfig

SHARD_AXIS = "scene"


def _shift(p, di, dj):
    """Plane (rows, W, k) whose (i, j) entry is p[i+di, j+dj] (circular;
    callers mask the wrapped rows/cols — halo rows absorb row wrap)."""
    if di:
        p = jnp.roll(p, -di, 0)
    if dj:
        p = jnp.roll(p, -dj, 1)
    return p


def _scatter(acc, c, di, dj):
    """acc[i+di, j+dj] += c[i, j] (c already masked)."""
    if di:
        c = jnp.roll(c, di, 0)
    if dj:
        c = jnp.roll(c, dj, 1)
    return acc + c


def _blend_gather(plane, blend, par):
    wsel = {"1": None, "p": par, "q": 1.0 - par}
    acc = None
    for wname, (di, dj) in blend:
        term = _shift(plane, di, dj)
        if wsel[wname] is not None:
            term = term * wsel[wname]
        acc = term if acc is None else acc + term
    return acc


def _blend_scatter(acc, c, blend, par):
    wsel = {"1": None, "p": par, "q": 1.0 - par}
    for wname, (di, dj) in blend:
        term = c if wsel[wname] is None else c * wsel[wname]
        acc = _scatter(acc, term, di, dj)
    return acc


def _row_mask(spec_i, gi, h_grid):
    if spec_i == "i<=H-1":
        return (gi >= 0) & (gi <= h_grid - 1)
    if spec_i == "i<=H-2":
        return (gi >= 0) & (gi <= h_grid - 2)
    return (gi >= 1) & (gi <= h_grid - 2)       # "1<=i<=H-2"


def _col_mask(spec_j, gj, w_grid):
    if spec_j == "j<=W-1":
        return gj <= w_grid - 1
    if spec_j == "j<=W-2":
        return gj <= w_grid - 2
    return (gj >= 1) & (gj <= w_grid - 2)       # "1<=j<=W-2"


def make_grid_intra_step_fn(batch: GridClothBatch, inv_mass, cfg: StepConfig,
                            mesh: Mesh, axis: str = SHARD_AXIS,
                            dp_axis: str = None):
    """Build a jitted ``(x (N, 3), v (N, 3)) -> (x, v)`` sim step with the
    grid's row axis sharded over ``mesh``'s ``axis``. Requires a
    uniform-parameter grid batch covering particles ``[0, H*W)`` with
    ``H`` divisible by the device count.

    With ``dp_axis`` the mesh is 2-D (rollout batch × grid rows): the
    step takes/returns ``(B, N, 3)`` with B sharded over ``dp_axis`` and
    the grid rows over ``axis`` — the composed DP×intra parallelism of
    SURVEY §2.6 (halo ``ppermute``s ride the ``axis`` submesh; the DP
    dimension needs no collectives at all)."""
    h_grid, w_grid = batch.height, batch.width
    if batch.offset != 0:
        raise NotImplementedError("grid intra-sharding expects offset 0")
    if not (batch.has_distance and batch.has_bending
            and batch.xpbd_distance and batch.xpbd_bending):
        raise NotImplementedError("XPBD distance+bending grids only")
    n_dev = int(np.prod([mesh.shape[axis]]))
    if h_grid % n_dev:
        raise NotImplementedError(
            f"grid rows ({h_grid}) must divide by device count ({n_dev})")
    br = h_grid // n_dev

    rest = {f: _family_rest(batch, f) for f in ("h", "v", "d")}
    stiff = {f: float(batch.stiff[f]) for f in ("h", "v", "d")}
    svec = {f: _family_svec(batch, f) for f in ("bh", "bv", "bd")}
    bstiff = {f: float(batch.bend_stiff[f]) for f in ("bh", "bv", "bd")}

    h_sub = cfg.dt / cfg.substeps
    alpha_d = {f: (1.0 / (stiff[f] * h_sub * h_sub)
                   if stiff[f] != 0.0 else 0.0) for f in stiff}
    alpha_b = {f: (1.0 / (bstiff[f] * h_sub * h_sub)
                   if bstiff[f] != 0.0 else 0.0) for f in bstiff}
    gravity = jnp.asarray(cfg.gravity, jnp.float32)
    omega = cfg.jacobi_omega

    icd_g = jnp.asarray(batch.inv_cnt_dist).reshape(h_grid, w_grid, 1)
    icb_g = jnp.asarray(batch.inv_cnt_bend).reshape(h_grid, w_grid, 1)
    w_g = jnp.asarray(inv_mass, jnp.float32).reshape(h_grid, w_grid, 1)

    fwd = [(i, i + 1) for i in range(n_dev - 1)]   # send down (to next)
    bwd = [(i + 1, i) for i in range(n_dev - 1)]   # send up (to prev)

    def halo_exchange(a):
        """(br, W, k) -> (br+2, W, k): row −1 from prev device, row +br
        from next (zeros at the global edges)."""
        from_prev = jax.lax.ppermute(a[-1:], axis, fwd)
        from_next = jax.lax.ppermute(a[:1], axis, bwd)
        return jnp.concatenate([from_prev, a, from_next], axis=0)

    def halo_reduce(acc_ext):
        """(br+2, W, k) -> (br, W, k): my halo contributions are added to
        the neighbors' boundary rows (and theirs to mine). The NEXT
        device's top-halo row (its ext row 0, global row (d+1)·br − 1)
        is MY last row; the PREV device's bottom-halo row is my first."""
        from_next = jax.lax.ppermute(acc_ext[:1], axis, bwd)
        from_prev = jax.lax.ppermute(acc_ext[-1:], axis, fwd)
        acc = acc_ext[1:-1]
        acc = acc.at[-1:].add(from_next)
        return acc.at[:1].add(from_prev)

    def fn(x, v):
        if dp_axis is None:
            shard = NamedSharding(mesh, P(axis))
            state_spec = P(axis)
            xg = jax.lax.with_sharding_constraint(
                x.reshape(h_grid, w_grid, 3), shard)
            vg = jax.lax.with_sharding_constraint(
                v.reshape(h_grid, w_grid, 3), shard)
        else:
            b = x.shape[0]
            shard = NamedSharding(mesh, P(dp_axis, axis))
            state_spec = P(dp_axis, axis)
            xg = jax.lax.with_sharding_constraint(
                x.reshape(b, h_grid, w_grid, 3), shard)
            vg = jax.lax.with_sharding_constraint(
                v.reshape(b, h_grid, w_grid, 3), shard)

        @partial(shard_map, mesh=mesh,
                 in_specs=(state_spec, state_spec, P(axis), P(axis),
                           P(axis)),
                 out_specs=(state_spec, state_spec))
        def sharded(xl, vl, wl, icdl, icbl):
            if dp_axis is not None:
                # DP dimension: map the single-rollout body over the
                # local batch (collectives inside commute with vmap)
                return jax.vmap(
                    lambda xs, vs: _rollout_body(xs, vs, wl, icdl, icbl)
                )(xl, vl)
            return _rollout_body(xl, vl, wl, icdl, icbl)

        def _rollout_body(xl, vl, wl, icdl, icbl):
            di = jax.lax.axis_index(axis)
            row0 = di * br                      # global row of local row 0
            # extended-block global indices: ext row l ↔ global row
            # row0 + l − 1
            gi = (jnp.arange(br + 2, dtype=jnp.int32)
                  + (row0 - 1))[:, None, None]        # (br+2, 1, 1)
            gj = jnp.arange(w_grid, dtype=jnp.int32)[None, :, None]
            par = ((gi & 1) == (gj & 1)).astype(jnp.float32)
            own = ((gi >= row0) & (gi < row0 + br))   # anchor ownership

            w_ext = halo_exchange(wl)

            masks = {}
            for f, spec in _DIST.items():
                masks[f] = (_row_mask(spec["mask"][0], gi, h_grid) & own
                            & _col_mask(spec["mask"][1], gj, w_grid)
                            ).astype(jnp.float32)
            for f, spec in _BEND.items():
                masks[f] = (_row_mask(spec["mask"][0], gi, h_grid) & own
                            & _col_mask(spec["mask"][1], gj, w_grid)
                            ).astype(jnp.float32)

            def substep(carry, _):
                xl, vl = carry
                old = xl
                dyn = (wl > 0.0).astype(jnp.float32)
                vl = jnp.where(wl > 0.0, vl + h_sub * gravity, vl)
                xl = xl + h_sub * dyn * vl

                lams = {f: jnp.zeros((br + 2, w_grid, 1), jnp.float32)
                        for f in masks}
                for _i in range(cfg.max_iterations):
                    # ---- distance families ----
                    x_ext = halo_exchange(xl)
                    acc = jnp.zeros_like(x_ext)
                    for fam in ("h", "v", "d"):
                        spec = _DIST[fam]
                        m = masks[fam]
                        pa = _blend_gather(x_ext, spec["a"], par)
                        pb = _blend_gather(x_ext, spec["b"], par)
                        wa = _blend_gather(w_ext, spec["a"], par)
                        wb = _blend_gather(w_ext, spec["b"], par)
                        n_v = pa - pb
                        d = jnp.sqrt(jnp.sum(n_v * n_v, -1, keepdims=True))
                        c = d - rest[fam]
                        k = wa + wb + alpha_d[fam]
                        valid = (d > 1e-6) & (jnp.abs(k) > 1e-6)
                        dlam = jnp.where(
                            valid, -(c + alpha_d[fam] * lams[fam])
                            / jnp.where(valid, k, 1.0), 0.0) * m
                        lams[fam] = lams[fam] + dlam
                        pt = n_v * (dlam / jnp.maximum(d, 1e-6))
                        acc = _blend_scatter(acc, wa * pt, spec["a"], par)
                        acc = _blend_scatter(acc, -wb * pt, spec["b"], par)
                    xl = xl + omega * icdl * halo_reduce(acc)

                    # ---- bending families (rank-1 factored) ----
                    x_ext = halo_exchange(xl)
                    acc = jnp.zeros_like(x_ext)
                    for fam in ("bh", "bv", "bd"):
                        spec = _BEND[fam]
                        m = masks[fam]
                        se, so = svec[fam]
                        sv = [par * sej + (1.0 - par) * soj
                              for sej, soj in zip(se, so)]
                        t = jnp.zeros_like(x_ext)
                        ws4 = []
                        for j4, blend in enumerate(spec["pts"]):
                            t = t + sv[j4] * _blend_gather(x_ext, blend,
                                                           par)
                            ws4.append(_blend_gather(w_ext, blend, par))
                        t2 = jnp.sum(t * t, -1, keepdims=True)
                        energy = -0.5 * t2
                        w_s2 = sum(ws4[j] * sv[j] * sv[j] for j in range(4))
                        kk = w_s2 * t2 + alpha_b[fam]
                        valid = jnp.abs(kk) > 1e-9
                        dlam = jnp.where(
                            valid, -(energy + alpha_b[fam] * lams[fam])
                            / jnp.where(valid, kk, 1.0), 0.0) * m
                        lams[fam] = lams[fam] + dlam
                        dt_p = dlam * t
                        for j4 in range(4):
                            acc = _blend_scatter(
                                acc, -ws4[j4] * sv[j4] * dt_p,
                                spec["pts"][j4], par)
                    xl = xl + omega * icbl * halo_reduce(acc)

                vl = jnp.where(wl > 0.0, (xl - old) / h_sub, vl)
                if cfg.damping:
                    vl = vl * (1.0 - cfg.damping)
                return (xl, vl), None

            (xl, vl), _ = jax.lax.scan(substep, (xl, vl), None,
                                       length=cfg.substeps)
            return xl, vl

        xg, vg = sharded(xg, vg, w_g, icd_g, icb_g)
        if dp_axis is not None:
            return (xg.reshape(xg.shape[0], -1, 3),
                    vg.reshape(vg.shape[0], -1, 3))
        return xg.reshape(-1, 3), vg.reshape(-1, 3)

    return jax.jit(fn)

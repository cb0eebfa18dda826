"""Fused Pallas TPU kernel for structured-grid XPBD cloth.

SURVEY §7 step 12: one kernel launch per *substep* that runs the whole
XPBD update — integrate → 3 distance families → 3 isometric-bending
families → velocity update — with each row-block of the cloth resident
in VMEM, so a substep costs one HBM read of (x, v) windows and one
write instead of the ~30 separate fused-elementwise passes (each a full
HBM round trip) of the jnp path in ``solver/grid_cloth.py``.

TPU-native layout rules (the first version of this kernel violated
them all and hung the Mosaic compiler; the second held the full
320×384 plane set in VMEM and overflowed the 16 MB scoped limit):

* **Aligned planes.** Positions/velocities are (H, W) component planes
  zero-padded to lane/sublane multiples — a trailing dim of 3 would
  waste 42× of each (8, 128) float32 tile.
* **Row-block grid + halo.** The kernel runs on a 1-D grid of row
  blocks. Inputs stay in HBM (``memory_space=ANY``) and each grid step
  DMAs its block window *plus a halo margin* into VMEM scratch; one
  projection iteration has an influence radius of 3 rows (distance ±1
  then bending ±2), so ``halo = 8·⌈(3·iters+1)/8⌉`` rows of redundant
  compute make block results exactly equal to the full-plane result.
  Outputs use ordinary blocked VMEM specs (disjoint row blocks).
* **Rolls, not slices.** Neighbor access and the Jacobi scatter-back
  are circular shifts (``pltpu.roll``) of whole planes plus validity
  masks — never sub-plane slice reads or ``.at[1:-1, :-1].add()``
  masked stores, which Mosaic lowers to per-row masked ops with
  explosive compile cost. Wrapped rows land in the discarded halo.
* **Masks from iota.** Constraint-family validity and the
  triangulation parity ``helper(i,j) = (i%2 == j%2)``
  (``SimulationModel.cpp:831-903``) are computed in-kernel from
  ``broadcasted_iota`` offset by the block's absolute row — no mask
  planes travel through HBM.

Semantics are identical to ``GridClothBatch.project`` + the substep
loop of ``solver/step.py`` (asserted in
``tests/test_grid_cloth_pallas.py``): XPBD compliance per
``XPBD.cpp:14-60`` (distance) and ``XPBD.cpp:153-213`` (rank-1
factored isometric bending), λ reset each substep
(``Constraints.cpp:1240-1241``), Jacobi averaging with the build-time
count denominators.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid_cloth import GridClothBatch


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _family_rest(batch, fam):
    r = batch.rest[fam]
    if r.ndim != 0:
        raise NotImplementedError(
            "pallas cloth kernel requires uniform rest lengths "
            "(regular grid)")
    return float(r)


def _family_svec(batch, fam):
    """Rank-1 bending S vectors of a family, collapsed to two scalar
    4-vectors ``(S_even, S_odd)`` keyed by the triangulation parity
    ``helper(i,j)`` — on a regular grid the stencils alternate between
    exactly two congruence classes (mirror images across the quad
    diagonal), so ``S = par·S_even + (1−par)·S_odd``."""
    s = np.asarray(batch.q_mat[fam], np.float32)
    if s.ndim == 1:
        sv = [float(v) for v in s]
        return sv, sv
    h, w = batch.height, batch.width
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    helper = (ii % 2 == jj % 2)
    par = {"bh": helper[1:h - 1, :w - 1], "bv": helper[:h - 1, 1:w - 1],
           "bd": helper[:h - 1, :w - 1]}[fam]
    if par.shape != s.shape[:2]:
        raise NotImplementedError(
            f"unexpected {fam} S-plane shape {s.shape} for "
            f"{h}x{w} grid")
    out = []
    for m in (par, ~par):
        rows = s[m]
        if rows.size == 0:
            out.append([0.0, 0.0, 0.0, 0.0])
            continue
        mean = rows.mean(axis=0, dtype=np.float64)
        if not np.all(np.abs(rows - mean)
                      <= 1e-4 * np.maximum(np.abs(mean), 1e-12) + 1e-6):
            raise NotImplementedError(
                "pallas cloth kernel requires per-parity-uniform bending "
                "stencils (regular grid)")
        out.append([float(v) for v in mean])
    return out[0], out[1]


# Stencil tables. A "blend" is a list of (parity_weight, (di, dj)) pairs:
# the point is  Σ w(par) · x[i+di, j+dj]  where w is 'p' (parity), 'q'
# (1−parity) or '1'. Offsets/parities mirror the slice algebra of
# ``grid_cloth.GridClothBatch`` exactly (same constraint (i,j) anchors).
_DIST = {
    "h": {"mask": ("i<=H-1", "j<=W-2"),
          "a": [("1", (0, 0))], "b": [("1", (0, 1))]},
    "v": {"mask": ("i<=H-2", "j<=W-1"),
          "a": [("1", (0, 0))], "b": [("1", (1, 0))]},
    "d": {"mask": ("i<=H-2", "j<=W-2"),
          "a": [("p", (0, 0)), ("q", (0, 1))],
          "b": [("p", (1, 1)), ("q", (1, 0))]},
}
# bending stencil point order [a, b, f0, f1] matches the S-vector index
# order of ``_init_isometric_bending_s_np`` (internal (p2, p3, p0, p1))
_BEND = {
    "bh": {"mask": ("1<=i<=H-2", "j<=W-2"),
           "pts": [[("1", (0, 0))], [("1", (0, 1))],
                   [("p", (1, 1)), ("q", (1, 0))],
                   [("p", (-1, 1)), ("q", (-1, 0))]]},
    "bv": {"mask": ("i<=H-2", "1<=j<=W-2"),
           "pts": [[("1", (0, 0))], [("1", (1, 0))],
                   [("p", (1, 1)), ("q", (0, 1))],
                   [("p", (1, -1)), ("q", (0, -1))]]},
    "bd": {"mask": ("i<=H-2", "j<=W-2"),
           "pts": [[("p", (0, 0)), ("q", (0, 1))],
                   [("p", (1, 1)), ("q", (1, 0))],
                   [("p", (0, 1)), ("q", (0, 0))],
                   [("p", (1, 0)), ("q", (1, 1))]]},
}

_N_IN = 9  # xx xy xz vx vy vz w icd icb


def make_pallas_cloth_step(batch: GridClothBatch, inv_mass, inv_cnt_dist,
                           inv_cnt_bend, *, dt: float, substeps: int,
                           max_iterations: int = 1,
                           gravity=(0.0, -9.81, 0.0),
                           damping: float = 0.0,
                           block_rows: int = None,
                           n_batch: int = 1,
                           n_steps: int = 1,
                           fuse_substeps: bool = False,
                           height_override: int = None,
                           global_height: int = None,
                           external_params: bool = False):
    """Build ``step(x (N, 3), v (N, 3)) -> (x, v)``: one flat scan of
    ``n_steps·substeps`` fused Pallas substep kernels. Requires a
    uniform-parameter grid batch covering particles ``[0, H*W)`` (the
    headline bench scene shape). For a pure grid-cloth scene a step
    boundary adds nothing over a substep boundary (no per-step collision
    pass), so ``n_steps > 1`` advances whole rollout chunks per call.

    ``n_batch > 1`` builds the batched-rollout variant
    ``step(x (B, N, 3), v (B, N, 3))`` — the kernel grid gains a leading
    batch dimension (one extra DMA index), which is how the north-star
    *4096 parallel rollouts* workload maps onto a chip: all rollouts
    share the masks/parameters; only state is batched."""
    h_grid, w_grid = batch.height, batch.width
    if height_override is not None:
        # sharded mode (parallel/intra_pallas.py): the kernel runs on a
        # device-local row window; stencil parameters still come from
        # the GLOBAL batch (uniform / parity-class scalars)
        h_grid = int(height_override)
    if batch.offset != 0:
        raise NotImplementedError("pallas cloth kernel expects offset 0")
    if not (batch.has_distance and batch.has_bending):
        raise NotImplementedError("expects distance + bending families")
    if not (batch.xpbd_distance and batch.xpbd_bending):
        raise NotImplementedError("XPBD families only")

    wp_pad = _round_up(w_grid, 128)
    if block_rows is None:
        # measured sweep (PERF.md): 64 is best for the per-substep
        # kernel (halo 8); the fused kernel's halo-16 redundancy favors
        # 80-row blocks (windows of 112 rows; >=96 overflows VMEM with
        # the hoisted parameter planes)
        block_rows = 80 if fuse_substeps else 64
    br = min(block_rows, _round_up(h_grid, 8))
    hp_pad = _round_up(h_grid, br)          # content rows, in whole blocks
    # PERF.md lever 2 (multi-substep kernel): run all ``substeps``
    # inside one kernel pass per block. The per-substep influence radius
    # is 3 rows (distance ±1 then bending ±2, applied sequentially), so
    # a halo of 3·iters·S rows of redundant compute buys removing S−1 of
    # S HBM round trips per step.
    fused = substeps if fuse_substeps else 1
    halo = _round_up(3 * max_iterations * fused + 1, 8)
    h_tot = hp_pad + 2 * halo               # stored rows incl. margins
    h_win = br + 2 * halo                   # VMEM window rows
    n_blocks = hp_pad // br
    total_steps = n_batch * n_blocks        # linear grid length

    rest = {f: _family_rest(batch, f) for f in ("h", "v", "d")}
    stiff = {f: float(batch.stiff[f]) for f in ("h", "v", "d")}
    svec = {f: _family_svec(batch, f) for f in ("bh", "bv", "bd")}
    bstiff = {f: float(batch.bend_stiff[f]) for f in ("bh", "bv", "bd")}

    h_sub = dt / substeps
    inv_h = 1.0 / h_sub
    alpha_d = {f: (1.0 / (stiff[f] * h_sub * h_sub)
                   if stiff[f] != 0.0 else 0.0) for f in stiff}
    alpha_b = {f: (1.0 / (bstiff[f] * h_sub * h_sub)
                   if bstiff[f] != 0.0 else 0.0) for f in bstiff}
    gx, gy, gz = (float(g) for g in gravity)

    def _roll(p, shift, axis):
        # pltpu.roll requires a non-negative shift; wrap (circular —
        # wrapped rows/lanes are masked or land in the discarded halo)
        size = (h_win, wp_pad)[axis]
        return pltpu.roll(p, shift % size, axis)

    def _shift(p, di, dj):
        """Plane whose (i, j) entry is p[i+di, j+dj]."""
        if di:
            p = _roll(p, -di, 0)
        if dj:
            p = _roll(p, -dj, 1)
        return p

    gh = global_height if global_height is not None else None

    def _fam_mask(spec, i_idx, j_idx):
        mh = gh if gh is not None else h_grid
        mi, mj = spec
        if mi == "i<=H-1":
            m = (i_idx >= 0) & (i_idx <= mh - 1)
        elif mi == "i<=H-2":
            m = (i_idx >= 0) & (i_idx <= mh - 2)
        else:  # "1<=i<=H-2"
            m = (i_idx >= 1) & (i_idx <= mh - 2)
        if mj == "j<=W-1":
            m &= j_idx <= w_grid - 1
        elif mj == "j<=W-2":
            m &= j_idx <= w_grid - 2
        else:  # "1<=j<=W-2"
            m &= (j_idx >= 1) & (j_idx <= w_grid - 2)
        return m.astype(jnp.float32)

    def kernel(xx_hbm, xy_hbm, xz_hbm, vx_hbm, vy_hbm, vz_hbm,
               w_hbm, icd_hbm, icb_hbm, off_ref,
               oxx_ref, oxy_ref, oxz_ref, ovx_ref, ovy_ref, ovz_ref,
               *scratch):
        bufs2 = scratch[:_N_IN]             # two-slot input windows
        sems = scratch[_N_IN]               # (2, _N_IN) DMA semaphores
        if n_batch > 1:
            bb = pl.program_id(0)           # rollout index
            ri = pl.program_id(1)
            li = bb * n_blocks + ri         # linear grid step
            r0 = ri * br                    # window start in stored rows
        else:
            bb = None
            ri = pl.program_id(0)
            li = ri
            r0 = ri * br
        slot = jax.lax.rem(li, 2)

        hbms = (xx_hbm, xy_hbm, xz_hbm, vx_hbm, vy_hbm, vz_hbm,
                w_hbm, icd_hbm, icb_hbm)

        def _copy(s, slot_, bb_, r0_):
            # state inputs carry the rollout axis; w/icd/icb are shared
            hbm = hbms[s]
            if bb is not None and s < 6:
                src = hbm.at[bb_, pl.ds(r0_, h_win), :]
            else:
                src = hbm.at[pl.ds(r0_, h_win), :]
            return pltpu.make_async_copy(src, bufs2[s].at[slot_],
                                         sems.at[slot_, s])

        # Input prefetch (two-slot): this step's windows were started by
        # the previous grid step; the NEXT step's windows start before
        # compute so their DMA flies underneath it. +17% at batch 64;
        # at short grids the extra first-step bubble costs more than it
        # hides, so small runs keep the simple start-and-wait path.
        use_prefetch = total_steps > 8
        if use_prefetch:
            @pl.when(li == 0)
            def _start_first():
                for s in range(_N_IN):
                    _copy(s, slot, bb, r0).start()

            @pl.when(li + 1 < total_steps)
            def _prefetch_next():
                li_n = li + 1
                if n_batch > 1:
                    bb_n = li_n // n_blocks
                    r0_n = (li_n % n_blocks) * br
                else:
                    bb_n = None
                    r0_n = li_n * br
                for s in range(_N_IN):
                    _copy(s, 1 - slot, bb_n, r0_n).start()
        else:
            for s in range(_N_IN):
                _copy(s, slot, bb, r0).start()

        for s in range(_N_IN):
            _copy(s, slot, bb, r0).wait()

        bufs = [bufs2[s].at[slot] for s in range(_N_IN)]

        # absolute GLOBAL row of local row l: r0 + l - halo (+ shard
        # offset in the sharded mode — zero otherwise)
        i_idx = (jax.lax.broadcasted_iota(jnp.int32, (h_win, wp_pad), 0)
                 + (r0 - halo) + off_ref[0, 0])
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (h_win, wp_pad), 1)
        # helper(i,j) = (i%2 == j%2), SimulationModel.cpp:831-903 parity
        par = ((i_idx & 1) == (j_idx & 1)).astype(jnp.float32)

        w = bufs[6][:]
        dyn = (w > 0.0).astype(jnp.float32)
        xc = [bufs[0][:], bufs[1][:], bufs[2][:]]
        vc = [bufs[3][:], bufs[4][:], bufs[5][:]]
        icd = bufs[7][:]
        icb = bufs[8][:]

        # ---- hoisted position-independent planes. The kernel is
        # VPU-compute-bound (measured: batched aggregate saturates far
        # below HBM speed-of-light), so everything that does not depend
        # on positions — family masks, inverse-mass stencil gathers, the
        # distance denominators 1/(wa+wb+α), the bending w·S products —
        # is computed once per block pass instead of per substep. ----
        qar = 1.0 - par

        def _blend_w(blend):
            acc = None
            for wname, (di, dj) in blend:
                term = _shift(w, di, dj)
                if wname == "p":
                    term = term * par
                elif wname == "q":
                    term = term * qar
                acc = term if acc is None else acc + term
            return acc

        dist_h = {}
        for fam in ("h", "v", "d"):
            spec = _DIST[fam]
            m = _fam_mask(spec["mask"], i_idx, j_idx)
            wa = _blend_w(spec["a"])
            wb = _blend_w(spec["b"])
            k = wa + wb + alpha_d[fam]
            kvalid = jnp.abs(k) > 1e-6
            inv_k = jnp.where(kvalid,
                              1.0 / jnp.where(kvalid, k, 1.0), 0.0) * m
            dist_h[fam] = (wa, wb, inv_k)
        bend_h = {}
        for fam in ("bh", "bv", "bd"):
            spec = _BEND[fam]
            m = _fam_mask(spec["mask"], i_idx, j_idx)
            se, so = svec[fam]
            # scalar when the two parity classes agree, else a blended
            # plane so + par·(se − so)
            sv = [soj + par * (sej - soj) if sej != soj else sej
                  for sej, soj in zip(se, so)]
            wsv = [_blend_w(blend) * svj
                   for blend, svj in zip(spec["pts"], sv)]
            ws2 = (wsv[0] * sv[0] + wsv[1] * sv[1] + wsv[2] * sv[2]
                   + wsv[3] * sv[3])
            bend_h[fam] = (m, sv, wsv, ws2)

        # distinct gather offsets per phase, for the per-substep shift
        # caches (each shifted plane is computed once and reused across
        # families instead of per blend term)
        dist_offs = sorted({off for spec in _DIST.values()
                            for side in ("a", "b")
                            for _w, off in spec[side] if off != (0, 0)})
        bend_offs = sorted({off for spec in _BEND.values()
                            for pt in spec["pts"]
                            for _w, off in pt if off != (0, 0)})

        def _shifted(planes, offsets):
            """Shift cache with composed rolls: axis-1 (lane) shifts are
            computed once per distinct dj, and each (di, dj) offset adds
            only one axis-0 roll on top of the cached dj plane."""
            cache = {(0, 0): planes}
            byj = {0: planes}
            for off in offsets:
                dj = off[1]
                if dj not in byj:
                    byj[dj] = [_roll(p, -dj, 1) for p in planes]
            for off in offsets:
                di, dj = off
                if di == 0:
                    cache[off] = byj[dj]
                else:
                    cache[off] = [_roll(p, -di, 0) for p in byj[dj]]
            return cache

        def _blend_c(cache, blend, ci):
            acc = None
            for wname, off in blend:
                term = cache[off][ci]
                if wname == "p":
                    term = term * par
                elif wname == "q":
                    term = term * qar
                acc = term if acc is None else acc + term
            return acc

        # Scatter-back grouped by offset: correction terms from ALL
        # families of a phase accumulate into per-offset planes first,
        # then each offset is rolled exactly once (rolls are the
        # expensive cross-lane/sublane ops on the VPU; the ungrouped
        # form paid one roll per family term).
        def _scat(acc_off, blend, ci, base):
            for wname, off in blend:
                term = base
                if wname == "p":
                    term = term * par
                elif wname == "q":
                    term = term * qar
                cur = acc_off.setdefault(off, [None, None, None])
                cur[ci] = term if cur[ci] is None else cur[ci] + term

        def _flush(acc_off):
            """Apply the deferred scatter rolls, composed per axis: the
            axis-0 roll happens per offset, but offsets sharing dj are
            summed first so each distinct dj pays one axis-1 roll."""
            accs = []
            for ci in range(3):
                byj = {}
                for off, planes in acc_off.items():
                    if planes[ci] is None:
                        continue
                    term = planes[ci]
                    if off[0]:
                        term = _roll(term, off[0], 0)
                    dj = off[1]
                    byj[dj] = term if dj not in byj else byj[dj] + term
                acc = None
                for dj, term in byj.items():
                    if dj:
                        term = _roll(term, dj, 1)
                    acc = term if acc is None else acc + term
                accs.append(acc)
            return accs

        for _s in range(fused):
            # -- semi-implicit Euler (gravity only), static particles frozen
            old = list(xc)
            vc = [vci + (h_sub * gci) * dyn for vci, gci in zip(vc, (gx, gy, gz))]
            xc = [xci + h_sub * dyn * vci for xci, vci in zip(xc, vc)]

            lams = {f: jnp.zeros((h_win, wp_pad), jnp.float32)
                    for f in ("h", "v", "d", "bh", "bv", "bd")}

            for _i in range(max_iterations):
                # ---- distance families (XPBD.cpp:14-60) ----
                sh = _shifted(xc, dist_offs)
                acc_off = {}
                for fam in ("h", "v", "d"):
                    spec = _DIST[fam]
                    wa, wb, inv_k = dist_h[fam]
                    nx, ny, nz = (
                        _blend_c(sh, spec["a"], ci)
                        - _blend_c(sh, spec["b"], ci) for ci in range(3))
                    d = jnp.sqrt(nx * nx + ny * ny + nz * nz)
                    c = d - rest[fam]
                    dlam = jnp.where(d > 1e-6,
                                     -(c + alpha_d[fam] * lams[fam])
                                     * inv_k, 0.0)
                    lams[fam] = lams[fam] + dlam
                    s = dlam / jnp.maximum(d, 1e-6)
                    for ci, nc in enumerate((nx, ny, nz)):
                        pt = nc * s
                        _scat(acc_off, spec["a"], ci, wa * pt)
                        _scat(acc_off, spec["b"], ci, -wb * pt)
                accs = _flush(acc_off)
                xc = [xci + icd * acc for xci, acc in zip(xc, accs)]

                # ---- isometric-bending families (XPBD.cpp:153-213, rank-1
                # factored: t = Σⱼ Sⱼxⱼ, C = −½|t|², ∇ⱼ = −Sⱼt) ----
                sh = _shifted(xc, bend_offs)
                acc_off = {}
                for fam in ("bh", "bv", "bd"):
                    spec = _BEND[fam]
                    m, sv, wsv, ws2 = bend_h[fam]
                    t = [None, None, None]
                    for j4, blend in enumerate(spec["pts"]):
                        for ci in range(3):
                            term = sv[j4] * _blend_c(sh, blend, ci)
                            t[ci] = term if t[ci] is None else t[ci] + term
                    t2 = t[0] * t[0] + t[1] * t[1] + t[2] * t[2]
                    energy = -0.5 * t2
                    kk = ws2 * t2 + alpha_b[fam]
                    valid = jnp.abs(kk) > 1e-9
                    dlam = jnp.where(valid,
                                     -(energy + alpha_b[fam] * lams[fam])
                                     / jnp.where(valid, kk, 1.0), 0.0) * m
                    lams[fam] = lams[fam] + dlam
                    for ci in range(3):
                        dt_p = dlam * t[ci]
                        for j4 in range(4):
                            _scat(acc_off, spec["pts"][j4], ci,
                                  -wsv[j4] * dt_p)
                accs = _flush(acc_off)
                xc = [xci + icb * acc for xci, acc in zip(xc, accs)]

            # -- first-order velocity reconstruction (TimeIntegration.cpp:42-51)
            vc = [jnp.where(w > 0.0, (xci - oldi) * inv_h, vci)
                  for xci, oldi, vci in zip(xc, old, vc)]
            if damping:
                vc = [vci * (1.0 - damping) for vci in vc]

        for ref, plane in zip((oxx_ref, oxy_ref, oxz_ref,
                               ovx_ref, ovy_ref, ovz_ref), xc + vc):
            if n_batch > 1:
                ref[0] = plane[halo:halo + br, :]
            else:
                ref[:] = plane[halo:halo + br, :]

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    if n_batch > 1:
        grid = (n_batch, n_blocks)
        out_plane = jax.ShapeDtypeStruct((n_batch, hp_pad, wp_pad),
                                         jnp.float32)
        out_spec = pl.BlockSpec((1, br, wp_pad), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM)
    else:
        grid = (n_blocks,)
        out_plane = jax.ShapeDtypeStruct((hp_pad, wp_pad), jnp.float32)
        out_spec = pl.BlockSpec((br, wp_pad), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    interpret = jax.default_backend() != "tpu"
    substep_call = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(out_plane,) * 6,
        in_specs=[any_spec] * _N_IN
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(out_spec,) * 6,
        scratch_shapes=[pltpu.VMEM((2, h_win, wp_pad), jnp.float32)]
        * _N_IN
        + [pltpu.SemaphoreType.DMA((2, _N_IN))],
        interpret=interpret,
    )

    def _pad_margins(p):
        # content -> stored rows with halo margins (row axis is -2)
        pad = [(0, 0)] * (p.ndim - 2) + [(halo, halo), (0, 0)]
        return jnp.pad(p, pad)

    def _pad_plane(a):
        a = np.asarray(a, np.float32).reshape(h_grid, w_grid)
        out = np.zeros((hp_pad, wp_pad), np.float32)
        out[:h_grid, :w_grid] = a
        return jnp.asarray(out)

    pad_h = hp_pad - h_grid
    pad_w = wp_pad - w_grid

    if not external_params:
        w_plane = _pad_margins(_pad_plane(inv_mass))
        icd_plane = _pad_margins(_pad_plane(inv_cnt_dist))
        icb_plane = _pad_margins(_pad_plane(inv_cnt_bend))

    def _pad_plane_traced(a):
        a = a.reshape(h_grid, w_grid)
        return _pad_margins(jnp.pad(a, [(0, pad_h), (0, pad_w)]))

    def _make_chunk(n_sub_calls):
        """x, v -> planes -> one flat scan of ``n_sub_calls`` substep
        kernels -> x, v. One pad in, one unpad out; the scan carry stays
        in plane layout (wrapping the repack in an outer scan instead
        sends XLA layout assignment into a tailspin — 400s+ compiles)."""

        @jax.jit
        def chunk(x, v, *params):
            if external_params:
                wp, icdp, icbp = (_pad_plane_traced(a)
                                  for a in params[:3])
                off_arr = params[3].reshape(1, 1).astype(jnp.int32)
            else:
                wp, icdp, icbp = w_plane, icd_plane, icb_plane
                off_arr = jnp.zeros((1, 1), jnp.int32)
            lead = (n_batch,) if n_batch > 1 else ()
            xp = x.reshape(lead + (h_grid, w_grid, 3))
            vp = v.reshape(lead + (h_grid, w_grid, 3))
            zpad = [(0, 0)] * len(lead) + [(0, pad_h), (0, pad_w)]
            planes = [jnp.pad(p[..., ci], zpad)
                      for p in (xp, vp) for ci in range(3)]

            def body(carry, _):
                outs = substep_call(*[_pad_margins(p) for p in carry],
                                    wp, icdp, icbp, off_arr)
                return tuple(outs), None

            outs, _ = jax.lax.scan(body, tuple(planes), None,
                                   length=n_sub_calls)
            x_out = jnp.stack([o[..., :h_grid, :w_grid]
                               for o in outs[0:3]],
                              axis=-1).reshape(lead + (-1, 3))
            v_out = jnp.stack([o[..., :h_grid, :w_grid]
                               for o in outs[3:6]],
                              axis=-1).reshape(lead + (-1, 3))
            return x_out, v_out

        return chunk

    if substeps % fused:
        raise ValueError("substeps must be divisible by the fused count")
    return _make_chunk(n_steps * substeps // fused)

"""Fused Pallas TPU kernel for structured-grid XPBD FEM-tet solids —
the Pallas port of ``solver/grid_tet.py`` (PERF.md lever 4), i.e. the
BarDemo / BASELINE config-2 workload at bench scale.

Layout: the ``(W, H, D)`` vertex grid becomes ``(W, H·D)`` component
planes — rows are the bar's long axis, lanes flatten ``(j, k) → j·D+k``
(H·D = 1296 pads to 1408 lanes, 8.6%% waste vs 3.6× for lanes=D). Cell
corner ``(a, b, c)`` is then a row shift ``a`` plus a single lane shift
``b·D + c`` — wraps land in cells masked invalid (``j > H−2`` or
``k > D−2``), the same circular-roll trick as the cloth kernel.

The whole step runs in one kernel pass per row block: per substep
{integrate → 5 tet-family XPBD FEM solves (Jacobi, λ reset) → velocity
update}, with the per-substep influence radius along W exactly 1 row
(each family spans a ∈ {0,1}), so ``halo = ⌈(S·iters+1)/8⌉·8`` rows.

FEM algebra identical to ``GridTetBatch._solve_family`` (itself the
plane-unrolled form of ``XPBD::solve_FEMTetraConstraint``,
``XPBD.cpp:217-294``): 3×3 matrices are Python lists of lane planes.
Per-family rest data is two HOST-SIDE scalar sets (odd/even congruence
classes); rather than materializing 45 parity-blended rest planes
(VMEM) the kernel computes F and ∇ for both scalar sets and blends the
9 result planes with the cell parity — ~70 extra VPU ops/family for
zero VMEM growth.

The reference's SVD inversion path is NOT ported (``inversion_handling``
falls back to the XLA grid path); bar workloads never invert
(``grid_tet.py`` field docstring).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid_tet import _CORNERS, _TETS_EVEN, _TETS_ODD, GridTetBatch


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


_N_IN = 8  # xx xy xz vx vy vz w icnt


def make_pallas_tet_step(batch: GridTetBatch, inv_mass, *, dt: float,
                         substeps: int, max_iterations: int = 1,
                         gravity=(0.0, -9.81, 0.0),
                         block_rows: int = 8,
                         n_steps: int = 1):
    """Build ``step(x (N, 3), v (N, 3)) -> (x, v)`` advancing ``n_steps``
    full solver steps (``substeps`` fused substeps each) of a pure
    regular-tet-grid scene covering particles ``[0, W·H·D)``."""
    w_grid, h_grid, d_grid = batch.width, batch.height, batch.depth
    if batch.offset != 0:
        raise NotImplementedError("pallas tet kernel expects offset 0")
    if batch.inversion_handling:
        raise NotImplementedError(
            "pallas tet kernel does not implement the SVD inversion path; "
            "use the XLA grid path (inversion_handling=True)")

    lanes = h_grid * d_grid
    lp_pad = _round_up(lanes, 128)
    br = min(block_rows, _round_up(w_grid, 8))
    wp_pad = _round_up(w_grid, br)
    halo = _round_up(substeps * max_iterations + 1, 8)
    w_tot = wp_pad + 2 * halo
    w_win = br + 2 * halo
    n_blocks = wp_pad // br

    # host-side scalar rest data per family/parity
    irm_o = np.asarray(batch.inv_rest_odd, np.float64)    # (5, 3, 3)
    irm_e = np.asarray(batch.inv_rest_even, np.float64)
    vol_o = np.asarray(batch.rest_vol_odd, np.float64)    # (5,)
    vol_e = np.asarray(batch.rest_vol_even, np.float64)
    youngs = float(batch.youngs)
    poisson = float(batch.poisson)
    # the XLA grid path's solve is a no-op at zero stiffness
    # (GridTetBatch._solve_family masks on youngs > 0); mirror that
    # statically — alpha=0 would otherwise make the projection
    # infinitely stiff instead of disabled
    project_active = youngs > 0.0
    mu = 0.5 / (1.0 + poisson)
    lame = poisson / ((1.0 + poisson) * (1.0 - 2.0 * poisson))
    h_sub = dt / substeps
    inv_h = 1.0 / h_sub
    alpha = 1.0 / (youngs * h_sub * h_sub) if youngs != 0.0 else 0.0
    gx, gy, gz = (float(g) for g in gravity)

    # corner -> (row shift, lane shift)
    c_off = [(int(a), int(b) * d_grid + int(c)) for a, b, c in _CORNERS]

    def _roll(p, shift, axis):
        size = (w_win, lp_pad)[axis]
        return pltpu.roll(p, shift % size, axis)

    def kernel(xx_hbm, xy_hbm, xz_hbm, vx_hbm, vy_hbm, vz_hbm,
               w_hbm, ic_hbm,
               oxx_ref, oxy_ref, oxz_ref, ovx_ref, ovy_ref, ovz_ref,
               *scratch):
        bufs2 = scratch[:_N_IN]
        sems = scratch[_N_IN]
        ri = pl.program_id(0)
        r0 = ri * br
        slot = jax.lax.rem(ri, 2)
        hbms = (xx_hbm, xy_hbm, xz_hbm, vx_hbm, vy_hbm, vz_hbm,
                w_hbm, ic_hbm)

        def _copy(s, slot_, r0_):
            return pltpu.make_async_copy(
                hbms[s].at[pl.ds(r0_, w_win), :], bufs2[s].at[slot_],
                sems.at[slot_, s])

        use_prefetch = n_blocks > 2
        if use_prefetch:
            @pl.when(ri == 0)
            def _start_first():
                for s in range(_N_IN):
                    _copy(s, slot, r0).start()

            @pl.when(ri + 1 < n_blocks)
            def _prefetch_next():
                for s in range(_N_IN):
                    _copy(s, 1 - slot, (ri + 1) * br).start()
        else:
            for s in range(_N_IN):
                _copy(s, slot, r0).start()
        for s in range(_N_IN):
            _copy(s, slot, r0).wait()
        bufs = [bufs2[s].at[slot] for s in range(_N_IN)]

        # absolute content row of local row l: r0 + l - halo
        i_idx = (jax.lax.broadcasted_iota(jnp.int32, (w_win, lp_pad), 0)
                 + (r0 - halo))
        l_idx = jax.lax.broadcasted_iota(jnp.int32, (w_win, lp_pad), 1)
        jj = l_idx // d_grid
        kk = l_idx - jj * d_grid
        # valid constraint cells + odd-cell parity ((i+j+k)%2, grid_tet)
        cell_ok = ((i_idx >= 0) & (i_idx <= w_grid - 2)
                   & (jj <= h_grid - 2) & (kk <= d_grid - 2)
                   & (l_idx < lanes))
        mask = cell_ok.astype(jnp.float32)
        par = (((i_idx + jj + kk) & 1) == 1).astype(jnp.float32)

        w = bufs[6][:]
        dyn = (w > 0.0).astype(jnp.float32)
        icnt = bufs[7][:]
        xc = [bufs[0][:], bufs[1][:], bufs[2][:]]
        vc = [bufs[3][:], bufs[4][:], bufs[5][:]]

        # hoisted: inverse-mass gathers per corner (position-independent)
        def _gather(p, co):
            a, dl = co
            if dl:
                p = _roll(p, -dl, 1)
            if a:
                p = _roll(p, -a, 0)
            return p

        w_corner = [_gather(w, co) for co in c_off]

        for _s in range(substeps):
            old = list(xc)
            vc = [vci + (h_sub * g) * dyn
                  for vci, g in zip(vc, (gx, gy, gz))]
            xc = [xci + h_sub * dyn * vci for xci, vci in zip(xc, vc)]

            # λ resets per substep; with a single projection iteration it
            # is identically zero inside the solve, so the planes (and
            # the α·λ term) are elided entirely
            lams = ([None] * 5 if max_iterations == 1 else
                    [jnp.zeros((w_win, lp_pad), jnp.float32)
                     for _t in range(5)])
            for _i in range(max_iterations if project_active else 0):
                # corner gather cache (8 corners × 3 comps)
                byl = {0: xc}
                for a, dl in c_off:
                    if dl not in byl:
                        byl[dl] = [_roll(p, -dl, 1) for p in xc]
                x_corner = []
                for a, dl in c_off:
                    ps = byl[dl]
                    x_corner.append([_roll(p, -a, 0) for p in ps]
                                    if a else ps)

                acc = {}   # corner index -> [3 comp planes]

                def _scat(ci_corner, comp, term):
                    cur = acc.setdefault(ci_corner, [None, None, None])
                    cur[comp] = (term if cur[comp] is None
                                 else cur[comp] + term)

                for t in range(5):
                    co = _TETS_ODD[t]
                    ce = _TETS_EVEN[t]
                    # parity-blended stencil points / weights
                    pts = [[x_corner[ce[m]][a]
                            + par * (x_corner[co[m]][a]
                                     - x_corner[ce[m]][a])
                            for a in range(3)] for m in range(4)]
                    ws = [w_corner[ce[m]]
                          + par * (w_corner[co[m]] - w_corner[ce[m]])
                          for m in range(4)]
                    vol = float(vol_e[t]) + par * float(vol_o[t]
                                                        - vol_e[t])

                    ds = [[pts[m][a] - pts[3][a] for m in range(3)]
                          for a in range(3)]

                    # F for both scalar rest sets, blended per parity
                    def _f_of(irm):
                        return [[sum(ds[a][c] * float(irm[t, c, b])
                                     for c in range(3))
                                 for b in range(3)] for a in range(3)]
                    fe = _f_of(irm_e)
                    fo = _f_of(irm_o)
                    f = [[fe[a][b] + par * (fo[a][b] - fe[a][b])
                          for b in range(3)] for a in range(3)]

                    def _ftf(a, b):
                        return (f[0][a] * f[0][b] + f[1][a] * f[1][b]
                                + f[2][a] * f[2][b])
                    eps = [[0.5 * (_ftf(a, b) - (1.0 if a == b else 0.0))
                            for b in range(3)] for a in range(3)]
                    trace = eps[0][0] + eps[1][1] + eps[2][2]
                    two_mu = 2.0 * mu
                    s_in = [[two_mu * eps[a][b]
                             + (lame * trace if a == b else 0.0)
                             for b in range(3)] for a in range(3)]
                    sigma = [[sum(f[a][c] * s_in[c][b] for c in range(3))
                              for b in range(3)] for a in range(3)]
                    psi = mu * sum(eps[a][b] * eps[a][b]
                                   for a in range(3) for b in range(3)) \
                        + 0.5 * lame * trace * trace
                    u_prime = vol * psi

                    # H = V₀ σ D_mᵀ blended per parity; ∇₃ = −Σ
                    def _g_of(irm):
                        return [[sum(sigma[a][c] * float(irm[t, b, c])
                                     for c in range(3))
                                 for a in range(3)] for b in range(3)]
                    ge = _g_of(irm_e)
                    go = _g_of(irm_o)
                    grad = [[vol * (ge[m][a]
                                    + par * (go[m][a] - ge[m][a]))
                             for a in range(3)] for m in range(3)]
                    grad.append([-(grad[0][a] + grad[1][a] + grad[2][a])
                                 for a in range(3)])

                    c = jnp.sqrt(jnp.maximum(2.0 * u_prime, 0.0))
                    sum_norm = sum(
                        ws[m] * (grad[m][0] * grad[m][0]
                                 + grad[m][1] * grad[m][1]
                                 + grad[m][2] * grad[m][2])
                        for m in range(4))
                    sum_norm = sum_norm + c * c * alpha
                    valid = sum_norm >= 1e-6
                    num = (c * c if lams[t] is None
                           else c * (c + alpha * lams[t]))
                    dlam = jnp.where(
                        valid,
                        -num / jnp.where(valid, sum_norm, 1.0), 0.0) * mask
                    if lams[t] is not None:
                        lams[t] = lams[t] + dlam
                    for m in range(4):
                        base = dlam * ws[m]
                        for a in range(3):
                            term = base * grad[m][a]
                            # parity-route to the odd/even corner
                            _scat(co[m], a, par * term)
                            _scat(ce[m], a, (1.0 - par) * term)

                # flush: roll accumulated corner planes back (+a, +dl),
                # composed per axis (one lane roll per distinct dl)
                dx = [None, None, None]
                for a in range(3):
                    byl = {}
                    for ci_c, planes in acc.items():
                        if planes[a] is None:
                            continue
                        ar, dl = c_off[ci_c]
                        term = planes[a]
                        if ar:
                            term = _roll(term, ar, 0)
                        byl[dl] = (term if dl not in byl
                                   else byl[dl] + term)
                    tot = None
                    for dl, term in byl.items():
                        if dl:
                            term = _roll(term, dl, 1)
                        tot = term if tot is None else tot + term
                    dx[a] = tot
                xc = [xci + icnt * d for xci, d in zip(xc, dx)]

            vc = [jnp.where(w > 0.0, (xci - oldi) * inv_h, vci)
                  for xci, oldi, vci in zip(xc, old, vc)]

        for ref, plane in zip((oxx_ref, oxy_ref, oxz_ref,
                               ovx_ref, ovy_ref, ovz_ref), xc + vc):
            ref[:] = plane[halo:halo + br, :]

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_plane = jax.ShapeDtypeStruct((wp_pad, lp_pad), jnp.float32)
    out_spec = pl.BlockSpec((br, lp_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    interpret = jax.default_backend() != "tpu"
    step_call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=(out_plane,) * 6,
        in_specs=[any_spec] * _N_IN,
        out_specs=(out_spec,) * 6,
        scratch_shapes=[pltpu.VMEM((2, w_win, lp_pad), jnp.float32)]
        * _N_IN
        + [pltpu.SemaphoreType.DMA((2, _N_IN))],
        interpret=interpret,
    )

    def _pad_margins(p):
        return jnp.pad(p, [(halo, halo), (0, 0)])

    def _pad_plane(a):
        a = np.asarray(a, np.float32).reshape(w_grid, lanes)
        out = np.zeros((wp_pad, lp_pad), np.float32)
        out[:w_grid, :lanes] = a
        return jnp.asarray(out)

    w_plane = _pad_margins(_pad_plane(inv_mass))
    # per-VERTEX Jacobi denominators (grid_tet's inv_cnt)
    ic_plane = _pad_margins(_pad_plane(
        np.asarray(batch.inv_cnt).reshape(w_grid, lanes)))

    pad_w = wp_pad - w_grid
    pad_l = lp_pad - lanes

    @jax.jit
    def step(x, v):
        xp = x.reshape(w_grid, lanes, 3)
        vp = v.reshape(w_grid, lanes, 3)
        planes = [jnp.pad(p[..., ci], [(0, pad_w), (0, pad_l)])
                  for p in (xp, vp) for ci in range(3)]

        def body(carry, _):
            outs = step_call(*[_pad_margins(p) for p in carry],
                             w_plane, ic_plane)
            return tuple(outs), None

        outs, _ = jax.lax.scan(body, tuple(planes), None, length=n_steps)
        x_out = jnp.stack([o[:w_grid, :lanes] for o in outs[0:3]],
                          axis=-1).reshape(-1, 3)
        v_out = jnp.stack([o[:w_grid, :lanes] for o in outs[3:6]],
                          axis=-1).reshape(-1, 3)
        return x_out, v_out

    return step

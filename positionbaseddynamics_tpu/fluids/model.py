"""Position-Based Fluids: state, scene, and time stepper.

TPU-native analogue of the FluidDemo model + stepper
(``Demos/FluidDemo/FluidModel.{h,cpp}``,
``Demos/FluidDemo/TimeStepFluidModel.cpp:21-68``): CFL-clamped dt,
semi-implicit Euler, spatial-hash neighbor search, 5 iterations of the
PBF density constraint (``PositionBasedDynamics/PositionBasedFluids.cpp``),
first-order velocity update, XSPH viscosity. Boundary handling follows
Akinci 2012 boundary-psi weights (``FluidModel.cpp:110-149``).

All per-neighbor loops become masked reductions over the fixed
``(N, 27·cap)`` candidate axis from ``neighborhood.neighbor_candidates``
— one fused gather/segment pattern per SPH sum, which XLA maps onto
dense vector ops."""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from . import sph
from .neighborhood import neighbor_candidates

Array = jax.Array


def _register(cls):
    data = [f.name for f in dataclasses.fields(cls) if not f.metadata.get("static")]
    meta = [f.name for f in dataclasses.fields(cls) if f.metadata.get("static")]
    return jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=meta)


@_register
@dataclass(frozen=True)
class FluidState:
    """Fluid particle state (positions/velocities + step history, like
    ``ParticleData`` in the FluidDemo)."""

    x: Array       # (N, 3)
    v: Array       # (N, 3)
    old_x: Array   # (N, 3)
    last_x: Array  # (N, 3)
    time: Array    # scalar
    dt: Array      # scalar — CFL-adapted step size carried across steps
    # running max of fixed-capacity overflow counts (cell/active-cell
    # caps on the cell-dense path, per-cell candidate cap on the hash
    # path) — the LOUD failure signal for every capacity in the fluid
    # pipeline; assert it stays 0 in production rollouts
    overflow: Array = None

    @staticmethod
    def create(x, dt0: float = 0.005) -> "FluidState":
        x = jnp.asarray(x, jnp.float32)
        z = jnp.zeros_like(x)
        return FluidState(x=x, v=z, old_x=x, last_x=x,
                          time=jnp.zeros((), jnp.float32),
                          dt=jnp.float32(dt0),
                          overflow=jnp.zeros((), jnp.float32))


@_register
@dataclass(frozen=True)
class FluidScene:
    """Static fluid scene spec: particle masses, boundary particles with
    Akinci psi weights, and solver parameters (reference defaults:
    density0=1000, particleRadius=0.025, support = 4·r,
    ``FluidModel.cpp:10-11`` / ``FluidModel.h:47``)."""

    mass: Array            # (N,)
    boundary_x: Array      # (B, 3)
    boundary_psi: Array    # (B,)
    density0: float = field(metadata=dict(static=True))
    support_radius: float = field(metadata=dict(static=True))
    viscosity: float = field(metadata=dict(static=True))
    iterations: int = field(metadata=dict(static=True))
    cap_per_cell: int = field(metadata=dict(static=True))
    min_dt: float = field(metadata=dict(static=True))
    max_dt: float = field(metadata=dict(static=True))
    particle_radius: float = field(metadata=dict(static=True))
    gravity: tuple = field(metadata=dict(static=True))
    # hash-path candidate cap: boundary wall/corner cells hold up to
    # ~(h/diam)³ ≈ 27+ particles, far above fluid rest occupancy, so the
    # mixed fluid+boundary hash search needs a deeper per-cell cap than
    # the fluid-only cell tables (shallow caps silently drop boundary
    # neighbors and leak fluid through walls)
    hash_cap: int = field(default=12, metadata=dict(static=True))

    @property
    def n_fluid(self) -> int:
        return self.mass.shape[0]

    # optional cell-dense pipeline (fluids/cellgrid.py) — set when the
    # scene has static domain bounds; the hash-candidate path remains
    # for unbounded/small scenes and oracle-parity tests
    cellgrid: object = None

    @staticmethod
    def create(n_fluid, boundary_x, density0=1000.0, particle_radius=0.025,
               viscosity=0.02, iterations=5, cap_per_cell=12,
               min_dt=1e-4, max_dt=5e-3, gravity=(0.0, -9.81, 0.0),
               domain=None):
        """Masses per ``FluidModel::initMasses`` (0.8·diam³·ρ₀); boundary
        psi per ``FluidModel::initBoundaryPsi`` — ψᵢ = ρ₀·Vᵢ with
        Vᵢ = 1/ΣⱼW(xᵢ−xⱼ) over boundary neighbors (Akinci 2012)."""
        support = 4.0 * particle_radius
        diam = 2.0 * particle_radius
        mass = np.full((n_fluid,), 0.8 * diam**3 * density0, np.float32)
        boundary_x = np.asarray(boundary_x, np.float32).reshape(-1, 3)

        # boundary psi via one host-side neighbor pass (build time only)
        bx = jnp.asarray(boundary_x)
        if boundary_x.shape[0]:
            # the psi pass needs a deep per-cell cap: box wall/corner
            # cells hold up to ~(h/diam)³ boundary particles, far above
            # the fluid rest occupancy (reference maxParticlesPerCell=50)
            idx, valid = neighbor_candidates(bx, support,
                                             max(cap_per_cell, 48))
            r2 = sum((bx[:, c][idx] - bx[:, c][:, None]) ** 2
                     for c in range(3))
            wsum = jnp.sum(
                jnp.where(valid, sph.w_r(jnp.sqrt(r2), support), 0.0),
                axis=-1) + sph.w_zero(support)
            psi = density0 / wsum
        else:
            psi = jnp.zeros((0,), jnp.float32)

        grid = None
        if domain is not None:
            from .cellgrid import CellGridSpec
            lo, hi = domain
            # transient impact compression reaches ~3× rest occupancy
            # (measured 24-27 particles per support cell at the dam
            # front vs 8 at rest) — the cell cap must cover it or the
            # compressed particles lose their boundary response
            grid = CellGridSpec.create(
                lo, hi, support, cap=max(cap_per_cell, 28),
                boundary_x=boundary_x, boundary_psi=np.asarray(psi),
                n_fluid_hint=n_fluid)

        return FluidScene(
            mass=jnp.asarray(mass), boundary_x=bx,
            boundary_psi=jnp.asarray(psi, jnp.float32),
            density0=float(density0), support_radius=float(support),
            viscosity=float(viscosity), iterations=int(iterations),
            cap_per_cell=int(cap_per_cell), min_dt=float(min_dt),
            max_dt=float(max_dt), particle_radius=float(particle_radius),
            gravity=tuple(gravity), cellgrid=grid,
            hash_cap=(max(int(cap_per_cell), 32) if boundary_x.shape[0]
                      else int(cap_per_cell)),
        )


def _sph_sums(x_all, scene: FluidScene):
    """Neighbor candidates over the concatenated fluid+boundary array.
    Returns ``(idx, valid, is_fluid_j, weight_j)`` where ``weight_j`` is
    mass for fluid neighbors and ψ for boundary neighbors."""
    n = scene.n_fluid
    idx, valid = neighbor_candidates(
        x_all, scene.support_radius, scene.hash_cap)
    idx = idx[:n]
    valid = valid[:n]
    is_fluid_j = idx < n
    w_j = jnp.where(is_fluid_j, scene.mass[jnp.minimum(idx, n - 1)],
                    scene.boundary_psi[jnp.maximum(idx - n, 0)]
                    if scene.boundary_psi.shape[0] else 0.0)
    return idx, valid, is_fluid_j, w_j


def compute_density(x_all, idx, valid, w_j, scene: FluidScene) -> Array:
    """``computePBFDensity`` (``PositionBasedFluids.cpp:8-40``):
    ρᵢ = mᵢ·W(0) + Σⱼ wⱼ·W(xᵢ−xⱼ) (wⱼ = mass or boundary ψ)."""
    n = scene.n_fluid
    d = x_all[:n, None, :] - x_all[idx]
    wk = jnp.where(valid, sph.w(d, scene.support_radius), 0.0)
    return scene.mass * sph.w_zero(scene.support_radius) + jnp.sum(w_j * wk, -1)


def compute_lambda(x_all, idx, valid, w_j, density, scene: FluidScene) -> Array:
    """``computePBFLagrangeMultiplier`` (``PositionBasedFluids.cpp:43-97``):
    C = max(ρ/ρ₀ − 1, 0); λ = −C / (Σ‖∇C‖² + ε)."""
    n = scene.n_fluid
    eps = 1.0e-6
    c = jnp.maximum(density / scene.density0 - 1.0, 0.0)
    d = x_all[:n, None, :] - x_all[idx]
    grad_j = (-(w_j / scene.density0)[..., None]
              * sph.grad_w(d, scene.support_radius))
    grad_j = jnp.where(valid[..., None], grad_j, 0.0)
    sum_grad2 = jnp.sum(jnp.sum(grad_j * grad_j, -1), -1)
    grad_i = -jnp.sum(grad_j, -2)
    sum_grad2 = sum_grad2 + jnp.sum(grad_i * grad_i, -1)
    return jnp.where(c > 0.0, -c / (sum_grad2 + eps), 0.0)


def solve_density_constraint(x_all, idx, valid, is_fluid_j, w_j, lam,
                             scene: FluidScene) -> Array:
    """``solveDensityConstraint`` (``PositionBasedFluids.cpp:100-141``):
    Δxᵢ = −Σⱼ (λᵢ + λⱼ[fluid]) · ∇Cⱼ."""
    n = scene.n_fluid
    d = x_all[:n, None, :] - x_all[idx]
    grad_j = (-(w_j / scene.density0)[..., None]
              * sph.grad_w(d, scene.support_radius))
    lam_j = jnp.where(is_fluid_j, lam[jnp.minimum(idx, n - 1)], 0.0)
    coef = lam[:, None] + lam_j
    corr = -jnp.sum(jnp.where(valid[..., None], coef[..., None] * grad_j, 0.0),
                    axis=-2)
    return corr


def xsph_viscosity(x, v, idx, valid, is_fluid_j, density, scene: FluidScene
                   ) -> Array:
    """XSPH smoothing (``TimeStepFluidModel::computeXSPHViscosity``):
    vᵢ ← vᵢ − ν Σⱼ (mⱼ/ρⱼ)(vᵢ−vⱼ) W(xᵢ−xⱼ) over *fluid* neighbors."""
    n = scene.n_fluid
    jf = jnp.minimum(idx, n - 1)
    ok = valid & is_fluid_j
    r2 = sum((x[:, c][:, None] - x[:, c][jf]) ** 2 for c in range(3))
    wk = jnp.where(ok, sph.w_r(jnp.sqrt(r2), scene.support_radius), 0.0)
    coef = scene.mass[jf] / jnp.maximum(density[jf], 1e-6) * wk
    dv = jnp.stack(
        [jnp.sum(coef * (v[:, c][:, None] - v[:, c][jf]), -1)
         for c in range(3)], -1)
    return v - scene.viscosity * dv


def cfl_dt(v, a, dt, scene: FluidScene) -> Array:
    """CFL clamp (``TimeStepFluidModel::updateTimeStepSizeCFL``):
    h = 0.4·diam/√max(0.1, max‖v + a·h‖²), clamped to [min_dt, max_dt]."""
    vel2 = jnp.sum((v + a * dt) ** 2, -1)
    max_vel = jnp.maximum(jnp.max(vel2) if vel2.size else 0.1, 0.1)
    diam = 2.0 * scene.particle_radius
    h = 0.4 * diam / jnp.sqrt(max_vel)
    return jnp.clip(h, scene.min_dt, scene.max_dt)


def _pbf_iteration(x_all, idx, valid, is_fluid_j, w_j, scene: FluidScene):
    """One fused density-projection iteration: the math of
    :func:`compute_density` → :func:`compute_lambda` →
    :func:`solve_density_constraint` with the ``(N, K, 3)`` neighbor
    displacement and gradient arrays materialized ONCE and reused —
    the three-kernel form gathers ``x_all[idx]`` three times and at the
    100k-particle dam that peaks over HBM (24 GB requested)."""
    n = scene.n_fluid
    eps = 1.0e-6
    h = scene.support_radius
    # per-component gathers ((N, K) planes) — vector gathers flatten to
    # a 128-lane-padded (N·K, 3) layout in XLA, 42× the memory
    dc = [x_all[:n, c][:, None] - x_all[:, c][idx] for c in range(3)]
    r2 = dc[0] * dc[0] + dc[1] * dc[1] + dc[2] * dc[2]
    rl = jnp.sqrt(r2)
    wk = jnp.where(valid, sph.w_r(rl, h), 0.0)
    density = scene.mass * sph.w_zero(h) + jnp.sum(w_j * wk, -1)
    # grad_j = gc · (xi − xj) with scalar gc (N, K)
    gc = -(w_j / scene.density0) * sph.grad_w_coef(rl, h)
    gc = jnp.where(valid, gc, 0.0)
    c = jnp.maximum(density / scene.density0 - 1.0, 0.0)
    sum_grad2 = jnp.sum(gc * gc * r2, -1)
    grad_i = [-jnp.sum(gc * dc[k], -1) for k in range(3)]
    sum_grad2 = sum_grad2 + sum(g * g for g in grad_i)
    lam = jnp.where(c > 0.0, -c / (sum_grad2 + eps), 0.0)
    lam_j = jnp.where(is_fluid_j, lam[jnp.minimum(idx, n - 1)], 0.0)
    coef = (lam[:, None] + lam_j) * gc
    corr = jnp.stack([-jnp.sum(coef * dc[k], -1) for k in range(3)], -1)
    return corr, density


def use_classes(spec) -> bool:
    """The occupancy-partitioned path (``classgrid.py``) pays whenever
    the table cap meaningfully exceeds the narrow class width — i.e.
    the cap was sized for impact compression, not rest occupancy."""
    return spec is not None and spec.cap > 20


def _fluid_step_cells(state: FluidState, scene: FluidScene,
                      use_pallas=None, partition=None) -> FluidState:
    """Cell-dense PBF step (``fluids/cellgrid.py``): sort into per-cell
    tables once, run the density iterations and XSPH entirely in dense
    cell layout. Same per-step semantics as :func:`fluid_step`.

    ``use_pallas=True`` routes the density/λ/correction/XSPH passes
    through the fused Pallas kernels (``fluids/cellgrid_pallas.py``,
    interpret-mode parity-tested). EXPERIMENTAL and currently OFF by
    default: at the 100k dam the kernels measure 3.2 steps/s vs the XLA
    path's 4.4 — the dense (cap, 27·cap) pair layout is compute-bound
    at ~5% live-pair occupancy either way, and the per-iteration
    neighbor-row gathers (~140 ns/row in XLA's lowering) dominate both;
    VMEM fusion alone does not pay until the dead-pair work shrinks
    (occupancy-partitioned kernels — future work, docs/PERF.md r05)."""
    from .cellgrid import (build_fluid_tables, pbf_iterations, xsph_cell)

    if use_pallas is None:
        use_pallas = False

    spec = scene.cellgrid
    g = jnp.asarray(scene.gravity, jnp.float32)
    a = jnp.broadcast_to(g, state.x.shape)
    h = cfl_dt(state.v, a, state.dt, scene)

    last_x, old_x = state.old_x, state.x
    v = state.v + h * a
    x = state.x + h * v

    (slot, kept, xt, mt, active, nbr, nbr_ok,
     overflow) = build_fluid_tables(spec, x, scene.mass)

    nslots = spec.n_cells * spec.cap
    if use_pallas:
        from .cellgrid_pallas import pbf_step_pallas

        # XSPH smooths the velocity v = (x_new − old_x)/h; build the
        # velocity tables from the PRE-projection velocity estimate the
        # same way the XLA branch does after the fact — here we need
        # them up front, so run projections first without XSPH, then
        # reuse the same kernel machinery for XSPH below
        xt, density, _ = pbf_step_pallas(
            spec, xt, mt, active, nbr, nbr_ok, scene.iterations,
            scene.density0, scene.support_radius)
        x_new = jnp.where(
            kept[:, None],
            jnp.stack([p.reshape(-1)[slot] for p in xt], -1), x)
        v = (x_new - old_x) / h
        vslot = jnp.where(kept, slot, nslots)
        vt = tuple(
            jnp.zeros((nslots,), jnp.float32).at[vslot].set(
                v[:, c], mode="drop").reshape(spec.n_cells, spec.cap)
            for c in range(3))
        _, _, vt = pbf_step_pallas(
            spec, xt, mt, active, nbr, nbr_ok, 0,
            scene.density0, scene.support_radius, vt=vt,
            viscosity=scene.viscosity, density=density)
        v = jnp.where(
            kept[:, None],
            jnp.stack([p.reshape(-1)[slot] for p in vt], -1), v)
    elif partition if partition is not None else use_classes(spec):
        from .classgrid import (partition_active, pbf_iterations_classes,
                                xsph_classes)

        narrow, full, bnd, over_c = partition_active(spec, mt)
        overflow = overflow + over_c
        xt, density, ctxs = pbf_iterations_classes(
            spec, xt, mt, narrow, full, bnd, scene.iterations,
            scene.density0, scene.support_radius)
        x_new = jnp.where(
            kept[:, None],
            jnp.stack([p.reshape(-1)[slot] for p in xt], -1), x)
        v = (x_new - old_x) / h
        vslot = jnp.where(kept, slot, nslots)
        vt = tuple(
            jnp.zeros((nslots,), jnp.float32).at[vslot].set(
                v[:, c], mode="drop").reshape(spec.n_cells, spec.cap)
            for c in range(3))
        vt = xsph_classes(spec, xt, vt, mt, ctxs, density,
                          scene.viscosity, scene.support_radius)
        v = jnp.where(
            kept[:, None],
            jnp.stack([p.reshape(-1)[slot] for p in vt], -1), v)
    else:
        xt, density, pair_ok = pbf_iterations(
            spec, xt, mt, active, nbr, nbr_ok, scene.iterations,
            scene.density0, scene.support_radius)
        x_new = jnp.where(
            kept[:, None],
            jnp.stack([p.reshape(-1)[slot] for p in xt], -1), x)
        v = (x_new - old_x) / h

        vslot = jnp.where(kept, slot, nslots)
        vt = tuple(
            jnp.zeros((nslots,), jnp.float32).at[vslot].set(
                v[:, c], mode="drop").reshape(spec.n_cells, spec.cap)
            for c in range(3))
        vt = xsph_cell(spec, xt, vt, mt, active, nbr, nbr_ok, density,
                       scene.viscosity, scene.support_radius, pair_ok)
        v = jnp.where(
            kept[:, None],
            jnp.stack([p.reshape(-1)[slot] for p in vt], -1), v)

    ov = jnp.maximum(state.overflow
                     if state.overflow is not None else 0.0,
                     overflow.astype(jnp.float32))
    return FluidState(x=x_new, v=v, old_x=old_x, last_x=last_x,
                      time=state.time + h, dt=h, overflow=ov)


def fluid_step(state: FluidState, scene: FluidScene) -> FluidState:
    """One PBF step (``TimeStepFluidModel::step``,
    ``TimeStepFluidModel.cpp:21-68``). Pure function; jit/scan it."""
    if scene.cellgrid is not None:
        return _fluid_step_cells(state, scene)
    g = jnp.asarray(scene.gravity, jnp.float32)
    a = jnp.broadcast_to(g, state.x.shape)
    h = cfl_dt(state.v, a, state.dt, scene)

    last_x, old_x = state.old_x, state.x
    v = state.v + h * a
    x = state.x + h * v

    x_all = jnp.concatenate([x, scene.boundary_x], 0)
    idx, valid, is_fluid_j, w_j = _sph_sums(x_all, scene)
    from .neighborhood import cell_overflow
    ov_step = cell_overflow(x_all, scene.support_radius,
                            scene.hash_cap).astype(jnp.float32)

    def body(x_all, _):
        corr, density = _pbf_iteration(
            x_all, idx, valid, is_fluid_j, w_j, scene)
        x_new = x_all.at[:scene.n_fluid].add(corr)
        return x_new, density

    x_all, densities = jax.lax.scan(
        body, x_all, None, length=scene.iterations)
    x = x_all[:scene.n_fluid]
    density = densities[-1]

    v = (x - old_x) / h
    v = xsph_viscosity(x, v, idx, valid, is_fluid_j, density, scene)

    ov = jnp.maximum(state.overflow
                     if state.overflow is not None else 0.0, ov_step)
    return FluidState(x=x, v=v, old_x=old_x, last_x=last_x,
                      time=state.time + h, dt=h, overflow=ov)


def make_fluid_step_fn(scene: FluidScene):
    # scene passes as a pytree ARGUMENT (not a closure): closed-over
    # arrays embed as program constants, and a large scene's boundary
    # tables blow the remote-compile request past its size limit
    fn = jax.jit(fluid_step)
    return lambda state: fn(state, scene)


# ---------------------------------------------------------------------------
# Scene helpers (breaking-dam setup of Demos/FluidDemo/main.cpp:281-360)
# ---------------------------------------------------------------------------


def block_positions(lo, counts, diam) -> np.ndarray:
    """Axis-aligned particle block: ``counts=(nx,ny,nz)`` at spacing diam."""
    ax = [np.arange(c) * diam + l for c, l in zip(counts, lo)]
    g = np.stack(np.meshgrid(*ax, indexing="ij"), -1).reshape(-1, 3)
    return g.astype(np.float32)


def box_boundary(lo, hi, diam, layers: int = 1) -> np.ndarray:
    """Boundary particle shell for an axis-aligned container box (the
    FluidDemo builds walls of boundary particles, ``main.cpp:340-360``)."""
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    counts = np.maximum(((hi - lo) / diam).astype(int) + 1, 2)
    ax = [np.linspace(lo[i], hi[i], counts[i]) for i in range(3)]
    g = np.stack(np.meshgrid(*ax, indexing="ij"), -1).reshape(-1, 3)
    rel = (g - lo) / (hi - lo)
    eps = (layers * diam) / np.maximum(hi - lo, 1e-9)
    on_shell = ((rel <= eps) | (rel >= 1.0 - eps)).any(axis=1)
    return g[on_shell].astype(np.float32)

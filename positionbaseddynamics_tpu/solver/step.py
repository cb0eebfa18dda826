"""The time stepper — functional replacement for the reference's
``TimeStepController::step`` (``Simulation/TimeStepController.cpp:75-241``).

Semantics preserved per SURVEY §3.1: per sim step, substep loop of
{integrate (rigid bodies + particles + orientations) → position-constraint
projection → velocity reconstruction}, then — once per step, not per
substep — collision detection and velocity-constraint projection
(motor joints, contacts). Everything is one jitted pure function over the
``SimState`` pytree; substeps and solver iterations are ``lax.scan`` /
unrolled static loops; typed batches replace constraint-object dispatch.

Projection modes (cf. ``solver/constraints.py``): ``jacobi`` (averaged,
optionally over-relaxed — the TPU-fast path) and ``gauss_seidel`` (exact
colored Gauss-Seidel matching the reference's graph-colored solver,
``SimulationModel.cpp:1033-1094`` + ``TimeStepController.cpp:270-295``).
Joints default to colored Gauss-Seidel: joint counts are small and the
sequential-impulse behavior matters for articulated chains.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import integration, quaternion as quat
from .constraints import ConstraintSet, scatter_add
from .state import OrientationState, ParticleState, RigidState, SimState

Array = jax.Array


@dataclass(frozen=True)
class StepConfig:
    """Solver parameters mirroring ``TimeStepController`` defaults
    (``TimeStepController.cpp:23-73``: 5 substeps × 1 position iteration ×
    5 velocity iterations) and ``TimeManager`` dt=0.005
    (``TimeManager.cpp:10``); gravity default from ``Simulation.cpp:16``."""

    dt: float = 0.005
    substeps: int = 5
    max_iterations: int = 1
    max_iterations_v: int = 5
    velocity_update_method: int = 0  # 0: first order, 1: second order
    damping: float = 0.0  # per-substep v *= (1-damping), the ghost-rod
    # stepper's damping knob (PositionBasedElasticRodsTSC.cpp:63,73)
    gravity: tuple = (0.0, -9.81, 0.0)
    # "jacobi" is the production TPU mode (averaged batched projection).
    # "gauss_seidel" exactly reproduces the reference's color-sequential
    # solve for parity testing (tests/test_reference_parity.py) but does
    # num_colors redundant batched solves per pass — a parity ORACLE,
    # not a performance mode.
    solver_mode: str = "jacobi"      # "jacobi" | "gauss_seidel"
    jacobi_omega: float = 1.0        # SOR weight for averaged Jacobi
    joint_solver_mode: str = "gauss_seidel"
    contact_stiffness_rb: float = 1.0       # SimulationModel contactStiffnessRigidBody
    contact_stiffness_particle_rb: float = 100.0
    # "jacobi" solves all contact rows simultaneously per velocity pass
    # (the TPU mode); "gauss_seidel" sweeps rows sequentially in buffer
    # order, matching the reference's in-place per-contact loop
    # (TimeStepController.cpp:330-343) for trajectory parity.
    contact_solver_mode: str = "jacobi"


def _jacobi_counts(n: int, idx: Array) -> Array:
    """#constraints touching each item — the Jacobi averaging denominator."""
    ones = jnp.ones(idx.size, jnp.float32)
    return jnp.maximum(
        jnp.zeros((n,), jnp.float32).at[idx.reshape(-1)].add(ones), 1.0
    )


def _inv_counts(cset, key, n, idx):
    """Precomputed 1/count column when available (build-time constant,
    ``ConstraintSet.with_jacobi_counts``), else computed in-graph."""
    pre = cset.jacobi_inv_counts.get(key)
    if pre is not None and pre.shape[0] == n:
        return pre
    return (1.0 / _jacobi_counts(n, idx))[:, None]


def _color_subsets(batch):
    """Host-side per-color sub-batches (fields keyed on the constraint
    axis sliced; colors are build-time constants). Within one color no
    two constraints share a particle, so solving only the subset equals
    the reference's sequential in-place sweep of that color — without
    the ``num_colors`` redundant full-batch solves the masked variant
    paid. Cached on the batch object (cset is static per step fn)."""
    import dataclasses as _dc

    import numpy as np

    cached = getattr(batch, "_color_subsets_cache", None)
    if cached is not None:
        return cached
    color = np.asarray(batch.color)
    c = batch.idx.shape[0]
    subs = []
    for col in range(batch.num_colors):
        sel = np.nonzero(color == col)[0]
        repl = {}
        for f in _dc.fields(batch):
            v = getattr(batch, f.name)
            if (not f.metadata.get("static") and v is not None
                    and hasattr(v, "shape") and v.ndim >= 1
                    and v.shape[0] == c):
                # numpy slicing (device indexing inside a jit trace
                # would bind the result to that trace — leak)
                repl[f.name] = np.asarray(v)[sel]
        # numpy (not jnp): a device constant created inside one jit
        # trace leaks as a tracer into the next trace of the same cset
        subs.append((sel, _dc.replace(batch, **repl)))
    object.__setattr__(batch, "_color_subsets_cache", subs)
    return subs


_PLANNED_SCATTER_MIN_ROWS = 8192


def _planned_scatter(n, idx, corr, owner, slot):
    """Scatter corrections via the build-time sorted-prefix plan
    (``make_scatter_plan``) for large index sets, where XLA's native
    scatter-add costs ~15-20 ns/row, else ``.at[].add``. Plans cache on
    ``owner`` (a cset batch — closure-static under jit) keyed by
    ``slot``."""
    from .constraints import make_scatter_plan, scatter_add_planned

    if idx.size < _PLANNED_SCATTER_MIN_ROWS:
        return scatter_add(n, idx, corr)
    cache = getattr(owner, "_scatter_plan_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(owner, "_scatter_plan_cache", cache)
    plan = cache.get(slot)
    if plan is None or plan[0] != n:
        import numpy as np
        try:
            idx_np = np.asarray(idx)
        except Exception:          # tracer (cset passed as jit argument)
            return scatter_add(n, idx, corr)
        plan = (n, make_scatter_plan(n, idx_np))
        cache[slot] = plan
    return scatter_add_planned(plan[1], corr)


def _batch_scatter(n, batch, corr):
    return _planned_scatter(n, batch.idx, corr, batch, "idx")


def _project_particle_batch(x, inv_mass, batch, lam, dt, cfg, cset, name):
    """One projection pass of one particle-constraint family.

    Batches marked ``self_averaged`` (shape matching) already fold the
    per-vertex 1/#clusters division into their corrections — the
    reference's explicit numClusters divide (``PositionBasedDynamics.cpp``
    shape-matching solve) — so no Jacobi count division is applied."""
    n = x.shape[0]
    self_avg = getattr(batch, "self_averaged", False)
    if cfg.solver_mode == "gauss_seidel":
        for sel, sub in _color_subsets(batch):
            sub_lam = lam[sel] if lam.size else lam
            corr, new_lam = sub.solve(x, inv_mass, sub_lam, dt)
            if lam.size and new_lam.shape == sub_lam.shape:
                lam = lam.at[sel].set(new_lam)
            x = x + scatter_add(n, sub.idx, corr)
        return x, lam
    corr, lam = batch.solve(x, inv_mass, lam, dt)
    dx = _batch_scatter(n, batch, corr)
    if self_avg:
        x = x + cfg.jacobi_omega * dx
    else:
        x = x + cfg.jacobi_omega * _inv_counts(cset, name, n, batch.idx) * dx
    return x, lam


def _project_rod_batches(x, inv_mass, q, inv_mass_q, cset, cfg):
    """Stretch-shear (positions + quaternions) then bend-twist (quaternions),
    mirroring the rod constraint solves of ``Constraints.cpp`` with
    post-correction quaternion renormalization."""
    n = x.shape[0]
    m = q.shape[0]
    if cset.rod_lattices and cfg.solver_mode == "gauss_seidel":
        # the lattice fast path has Jacobi semantics only; silent-mode
        # substitution would break GS parity runs (ADVICE r4) — fail
        # loudly like the other structured paths used to
        raise ValueError(
            "rod-lattice fast path has no gauss_seidel mode; rebuild the "
            "scene with SceneBuilder.build(use_structured_grid=False) "
            "for color-sequential rod parity")
    for rl in cset.rod_lattices:
        # uniform-rod lattice fast path (solver/grid_rods.py) — plane
        # stencils, jacobi semantics identical to the batches below
        x, q = rl.project(x, inv_mass, q, inv_mass_q, cfg.jacobi_omega)
    ss = cset.stretch_shear
    if ss is not None:
        if cfg.solver_mode == "gauss_seidel":
            for color in range(ss.num_colors):
                corr_p, corr_q = ss.solve(x, inv_mass, q, inv_mass_q)
                msk = ss.color == color
                x = x + scatter_add(n, ss.idx_p, corr_p * msk[:, None, None])
                q = q + scatter_add(m, ss.idx_q[:, None], corr_q * msk[:, None, None])
                q = quat.normalize(q)
        else:
            corr_p, corr_q = ss.solve(x, inv_mass, q, inv_mass_q)
            cp = cfg.jacobi_omega * _inv_counts(cset, "stretch_shear", n, ss.idx_p)
            cq = cfg.jacobi_omega * _inv_counts(cset, "stretch_shear_q", m, ss.idx_q)
            x = x + cp * _planned_scatter(n, ss.idx_p, corr_p, ss, "p")
            q = quat.normalize(q + cq * _planned_scatter(
                m, ss.idx_q[:, None], corr_q, ss, "q"))
    bt = cset.bend_twist
    if bt is not None:
        if cfg.solver_mode == "gauss_seidel":
            for color in range(bt.num_colors):
                corr_q = bt.solve(q, inv_mass_q)
                msk = bt.color == color
                q = q + scatter_add(m, bt.idx_q, corr_q * msk[:, None, None])
                q = quat.normalize(q)
        else:
            corr_q = bt.solve(q, inv_mass_q)
            cq = cfg.jacobi_omega * _inv_counts(cset, "bend_twist_q", m, bt.idx_q)
            q = quat.normalize(q + cq * _planned_scatter(
                m, bt.idx_q, corr_q, bt, "q"))
    return x, q


def _masked_inv_inertia_w(rq, inertia0, inv_mass):
    """World-space inverse inertia ``R diag(1/I₀) Rᵀ`` zeroed for static
    bodies (the reference only adds K-blocks when ``invMass != 0``)."""
    r = quat.to_matrix(rq)
    inv_diag = jnp.where(inertia0 > 0.0, 1.0 / jnp.maximum(inertia0, 1e-30), 0.0)
    iw = jnp.einsum("...ij,...j,...kj->...ik", r, inv_diag, r)
    return iw * (inv_mass > 0.0)[..., None, None]


def _apply_joint_position(rx, rq, px, jb, corr_x, corr_q, mask=None):
    """Scatter joint corrections into rigid (and particle) arrays."""
    if mask is not None:
        corr_x = corr_x * mask[:, None, None]
        corr_q = corr_q * mask[:, None, None]
    nr = rx.shape[0]
    if jb.couples_particles:
        rx = rx.at[jb.bodies[:, 0]].add(corr_x[:, 0], mode="drop")
        rq = rq.at[jb.bodies[:, 0]].add(corr_q[:, 0], mode="drop")
        if px is not None:
            px = px.at[jb.bodies[:, 1]].add(corr_x[:, 1], mode="drop")
    else:
        rx = rx + scatter_add(nr, jb.bodies, corr_x)
        rq = rq + scatter_add(nr, jb.bodies, corr_q)
    rq = quat.normalize(rq)
    return rx, rq, px


def _project_joints(rx, rq, rigid, px, p_inv_mass, cset, lams, time, dt, cfg):
    """One pass of all joint batches (position level). The world inverse
    inertia is refreshed from the current rotation before every batch —
    the ``rotationUpdated`` semantics of the reference."""
    for k, jb in enumerate(cset.joints):
        key = f"joint{k}"
        if cfg.joint_solver_mode == "gauss_seidel":
            for color in range(jb.num_colors):
                iw = _masked_inv_inertia_w(rq, rigid.inertia0, rigid.inv_mass)
                corr_x, corr_q, new_lam = jb.solve_position(
                    rx, rq, rigid.inv_mass, iw, time, dt, lams[key],
                    px=px, pw=p_inv_mass)
                msk = (jb.color == color).astype(jnp.float32)
                lams[key] = jnp.where((jb.color == color)[:, None],
                                      new_lam, lams[key])
                rx, rq, px = _apply_joint_position(
                    rx, rq, px, jb, corr_x, corr_q, mask=msk)
        else:
            iw = _masked_inv_inertia_w(rq, rigid.inertia0, rigid.inv_mass)
            corr_x, corr_q, new_lam = jb.solve_position(
                rx, rq, rigid.inv_mass, iw, time, dt, lams[key],
                px=px, pw=p_inv_mass)
            lams[key] = new_lam
            rx, rq, px = _apply_joint_position(rx, rq, px, jb, corr_x, corr_q)
    return rx, rq, px


def project_positions(x, inv_mass, q, inv_mass_q, rigid, cset: ConstraintSet,
                      time, dt, cfg: StepConfig, solid_contacts=None):
    """Position-constraint projection — the batched analogue of
    ``TimeStepController::positionConstraintProjection``
    (``TimeStepController.cpp:251-295``). λ arrays start at zero
    (``Constraints.cpp:1240-1241`` reset-at-iter-0 semantics) and
    accumulate across the ``max_iterations`` passes.

    Returns ``(x, q, rigid_x, rigid_q, solid_lam)`` (rigid entries None
    if no rigid state; ``solid_lam`` is the last particle-tet contact
    λ, None without solid contacts)."""
    lams = cset.init_lambdas()
    solid_lam = None
    rx = rigid.x if rigid is not None else None
    rq = rigid.q if rigid is not None else None
    for k, jb in enumerate(cset.joints):
        lams[f"joint{k}"] = jb.init_lambda()
    for k, db in enumerate(cset.direct_rods):
        lams[f"direct_rod{k}"] = db.init_lambda()
    for _ in range(cfg.max_iterations):
        # lattice-colored color-sequential sweeps (project_gs) give GS
        # fidelity at structured-grid speed; jacobi is the production
        # mode
        gs = cfg.solver_mode == "gauss_seidel"
        for gi, gc in enumerate(cset.grid_cloths):
            if gs:
                x, lams[f"grid_cloth{gi}"] = gc.project_gs(
                    x, inv_mass, lams[f"grid_cloth{gi}"], dt)
            else:
                x, lams[f"grid_cloth{gi}"] = gc.project(
                    x, inv_mass, lams[f"grid_cloth{gi}"], dt,
                    cfg.jacobi_omega)
        for gi, gt in enumerate(cset.grid_tets):
            if gs:
                x, lams[f"grid_tet{gi}"] = gt.project_gs(
                    x, inv_mass, lams[f"grid_tet{gi}"], dt)
            else:
                x, lams[f"grid_tet{gi}"] = gt.project(
                    x, inv_mass, lams[f"grid_tet{gi}"], dt,
                    cfg.jacobi_omega)
        for name, batch in cset.particle_batches():
            x, lams[name] = _project_particle_batch(
                x, inv_mass, batch, lams[name], dt, cfg, cset, name
            )
        if q is not None:
            x, q = _project_rod_batches(x, inv_mass, q, inv_mass_q, cset, cfg)
        if rigid is not None and cset.joints:
            rx, rq, x = _project_joints(
                rx, rq, rigid, x, inv_mass, cset, lams, time, dt, cfg)
        if rigid is not None and cset.direct_rods:
            # exact per-rod tree/chain solve (DirectPositionBasedSolver
            # ForStiffRods, PositionBasedElasticRods.cpp:735-1226)
            from ..ops import rigidbody as _rb
            nr = rx.shape[0]
            for k, db in enumerate(cset.direct_rods):
                iw = _masked_inv_inertia_w(rq, rigid.inertia0,
                                           rigid.inv_mass)
                corr_x, ot, lams[f"direct_rod{k}"] = db.solve(
                    rx, rq, rigid.inv_mass, iw, lams[f"direct_rod{k}"], dt)
                flat_b = db.bodies.reshape(-1)
                rx = rx.at[flat_b].add(corr_x.reshape(-1, 3))
                dq = jax.vmap(_rb.rotation_correction)(
                    ot.reshape(-1, 3), rq[flat_b])
                rq = quat.normalize(rq.at[flat_b].add(dq))
        if rigid is not None and cset.rigid_generics:
            nr = rx.shape[0]
            for gb in cset.rigid_generics:
                iw = _masked_inv_inertia_w(rq, rigid.inertia0,
                                           rigid.inv_mass)
                corr_x, corr_q = gb.solve(rx, rq, rigid.inv_mass, iw)
                rx = rx + scatter_add(nr, gb.bodies, corr_x)
                rq = quat.normalize(rq + scatter_add(nr, gb.bodies, corr_q))
        if solid_contacts is not None:
            # particle-tet contacts solved after the groups each iteration
            # (TimeStepController.cpp:288-291); the last pass's λ feeds
            # the friction solve (the reference's persisted m_lambda)
            from ..collision.solid import solve_solid_contacts_position
            dx, solid_lam = solve_solid_contacts_position(
                solid_contacts, x, inv_mass)
            x = x + dx
    return x, q, rx, rq, solid_lam


def _substep(state: SimState, cset: ConstraintSet, h, cfg: StepConfig,
             solid_contacts=None):
    """One substep: integrate → project → velocity update
    (``TimeStepController.cpp:93-173``). Returns ``(state,
    solid_lam)``."""
    gravity = jnp.asarray(cfg.gravity, jnp.float32)

    p = state.particles
    last_x, old_x = p.old_x, p.x
    x, v = integration.semi_implicit_euler(
        h, p.inv_mass, p.x, p.v, jnp.broadcast_to(gravity, p.x.shape)
    )

    o = state.orientations
    if o is not None:
        last_q, old_q = o.old_q, o.q
        oq, oomega = integration.semi_implicit_euler_rotation_isotropic(
            h, o.inv_mass, o.q, o.omega
        )
    else:
        oq = None

    r = state.rigid
    if r is not None:
        r_last_x, r_old_x = r.old_x, r.x
        r_last_q, r_old_q = r.old_q, r.q
        accel = (jnp.broadcast_to(gravity, r.x.shape)
                 + r.ext_force * r.inv_mass[..., None])
        rx, rv = integration.semi_implicit_euler(h, r.inv_mass, r.x, r.v, accel)
        iw, inv_iw = r.inertia_world()
        inv_iw = inv_iw * (r.inv_mass > 0.0)[..., None, None]
        rq, romega = integration.semi_implicit_euler_rotation(
            h, r.inv_mass, iw, inv_iw, r.q, r.omega, r.ext_torque
        )
        r = dataclasses.replace(r, x=rx, q=rq, v=rv, omega=romega)

    x, oq, rx, rq, solid_lam = project_positions(
        x, p.inv_mass, oq, o.inv_mass if o is not None else None,
        r, cset, state.time, h, cfg, solid_contacts=solid_contacts
    )

    if cfg.velocity_update_method == 1:
        v = integration.velocity_update_second_order(
            h, p.inv_mass, x, old_x, last_x, v
        )
    else:
        v = integration.velocity_update_first_order(h, p.inv_mass, x, old_x, v)
    if cfg.damping:
        v = v * (1.0 - cfg.damping)

    particles = dataclasses.replace(
        p, x=x, v=v, old_x=old_x, last_x=last_x
    )
    orientations = o
    if o is not None:
        if cfg.velocity_update_method == 1:
            oomega = integration.angular_velocity_update_second_order(
                h, o.inv_mass, oq, old_q, last_q, oomega
            )
        else:
            oomega = integration.angular_velocity_update_first_order(
                h, o.inv_mass, oq, old_q, oomega
            )
        orientations = dataclasses.replace(
            o, q=oq, omega=oomega, old_q=old_q, last_q=last_q
        )
    rigid = r
    if r is not None:
        if cfg.velocity_update_method == 1:
            rv = integration.velocity_update_second_order(
                h, r.inv_mass, rx, r_old_x, r_last_x, r.v)
        else:
            rv = integration.velocity_update_first_order(
                h, r.inv_mass, rx, r_old_x, r.v)
        if cfg.velocity_update_method == 1:
            romega = integration.angular_velocity_update_second_order(
                h, r.inv_mass, rq, r_old_q, r_last_q, r.omega)
        else:
            romega = integration.angular_velocity_update_first_order(
                h, r.inv_mass, rq, r_old_q, r.omega)
        rigid = dataclasses.replace(
            r, x=rx, q=rq, v=rv, omega=romega,
            old_x=r_old_x, last_x=r_last_x, old_q=r_old_q, last_q=r_last_q,
        )
    return dataclasses.replace(
        state, particles=particles, orientations=orientations, rigid=rigid
    ), solid_lam


def velocity_constraint_projection(state: SimState, cset: ConstraintSet,
                                   cfg: StepConfig, pipeline=None,
                                   solid_contacts=None,
                                   solid_lam=None) -> SimState:
    """Velocity-level projection, once per step after the substep loop
    (``TimeStepController::velocityConstraintProjection``,
    ``TimeStepController.cpp:298-357``): collision detection, then
    ``max_iterations_v`` passes over the velocity-motor joints and the
    contact constraints (contact info initialized once at detection time,
    per-contact impulse sums carried across passes — the reference's
    ``m_sum_impulses`` semantics)."""
    from ..collision import contacts as contact_ops

    r = state.rigid
    vel_batches = [jb for jb in cset.joints if jb.has_velocity_solve]
    has_contacts = (pipeline is not None and pipeline.active
                    and r is not None)
    if solid_contacts is not None:
        # particle-tet friction (velocitySolve_ParticleTetContactConstraint)
        from ..collision.solid import solve_solid_contacts_velocity
        p = state.particles
        pv = p.v + solve_solid_contacts_velocity(
            solid_contacts, p.x, p.v, p.inv_mass, lam=solid_lam)
        state = dataclasses.replace(
            state, particles=dataclasses.replace(p, v=pv))
    if r is None or not (vel_batches or has_contacts):
        return state
    p = state.particles
    px, pv = p.x, p.v
    rv, romega = r.v, r.omega
    iw = _masked_inv_inertia_w(r.q, r.inertia0, r.inv_mass)
    nr = r.x.shape[0]

    rc = pc = None
    if has_contacts:
        rc = pipeline.detect_rigid(r)
        pc = pipeline.detect_particles(px, pv, p.inv_mass, r)
        if state.overflow is not None and (rc is not None or pc is not None):
            # loud capacity contract: broad-phase active-pair drops
            # accumulate into the state counter (assertable ==0)
            from ..collision.detection import contacts_overflow
            state = dataclasses.replace(
                state, overflow=jnp.maximum(
                    state.overflow, contacts_overflow(rc, pc)))
    rc_sum = jnp.zeros((rc.mask.shape[0],), jnp.float32) if rc is not None else None
    pc_sum = jnp.zeros((pc.mask.shape[0],), jnp.float32) if pc is not None else None

    for _ in range(cfg.max_iterations_v):
        for jb in vel_batches:
            if cfg.joint_solver_mode == "gauss_seidel":
                for color in range(jb.num_colors):
                    corr_v, corr_om = jb.solve_velocity(
                        r.x, r.q, rv, romega, r.inv_mass, iw, state.time)
                    msk = (jb.color == color).astype(jnp.float32)[:, None, None]
                    rv = rv + scatter_add(nr, jb.bodies, corr_v * msk)
                    romega = romega + scatter_add(nr, jb.bodies, corr_om * msk)
            else:
                corr_v, corr_om = jb.solve_velocity(
                    r.x, r.q, rv, romega, r.inv_mass, iw, state.time)
                rv = rv + scatter_add(nr, jb.bodies, corr_v)
                romega = romega + scatter_add(nr, jb.bodies, corr_om)
        sequential = cfg.contact_solver_mode == "gauss_seidel"
        if rc is not None:
            solve_rc = (contact_ops.solve_rigid_contacts_sequential
                        if sequential else contact_ops.solve_rigid_contacts)
            rv, romega, rc_sum = solve_rc(
                rc, r.x, rv, romega, r.inv_mass, iw, rc_sum,
                cfg.contact_stiffness_rb)
        if pc is not None:
            solve_pc = (contact_ops.solve_particle_rigid_contacts_sequential
                        if sequential
                        else contact_ops.solve_particle_rigid_contacts)
            pv, rv, romega, pc_sum = solve_pc(
                pc, px, pv, p.inv_mass, r.x, rv, romega, r.inv_mass, iw,
                pc_sum, cfg.contact_stiffness_particle_rb)
    state = dataclasses.replace(
        state, rigid=dataclasses.replace(r, v=rv, omega=romega))
    if pc is not None:
        state = dataclasses.replace(
            state, particles=dataclasses.replace(p, v=pv))
    return state


def step(state: SimState, cset: ConstraintSet, cfg: StepConfig,
         pipeline=None) -> SimState:
    """One full sim step = ``substeps`` substeps + per-step collision
    detection and velocity constraint projection, mirroring
    ``TimeStepController::step``. Pure function; jit via
    :func:`make_step_fn`."""
    h = cfg.dt / cfg.substeps

    solid_contacts = None
    if pipeline is not None and getattr(pipeline, "solid_pairs", ()):
        p = state.particles
        solid_contacts = pipeline.detect_solids(p.x, p.v, p.inv_mass)
        if (state.overflow is not None and solid_contacts is not None
                and solid_contacts.overflow is not None):
            # surface the solid-contact compaction drops (ADVICE r4):
            # max-accumulated like FluidState.overflow, assertable ==0
            state = dataclasses.replace(
                state, overflow=jnp.maximum(state.overflow,
                                            solid_contacts.overflow))

    lam0 = (jnp.zeros((solid_contacts.mask.shape[0],), jnp.float32)
            if solid_contacts is not None else None)

    def body(carry, _):
        s, _ = carry
        s, lam = _substep(s, cset, h, cfg, solid_contacts)
        return (s, lam), None

    (state, solid_lam), _ = jax.lax.scan(
        body, (state, lam0), None, length=cfg.substeps)
    state = velocity_constraint_projection(state, cset, cfg, pipeline,
                                           solid_contacts,
                                           solid_lam=solid_lam)
    return dataclasses.replace(state, time=state.time + cfg.dt)


def make_step_fn(cset: ConstraintSet, cfg: StepConfig, pipeline=None):
    """Jitted ``state → state`` closure over a fixed scene."""
    @jax.jit
    def fn(state: SimState) -> SimState:
        return step(state, cset, cfg, pipeline)
    return fn


def rollout(state: SimState, cset: ConstraintSet, cfg: StepConfig,
            n_steps: int, collect: bool = False, pipeline=None):
    """Scan ``n_steps`` sim steps. Returns final state, plus the stacked
    particle-position trajectory ``(n_steps, N, 3)`` when ``collect``."""

    def body(s, _):
        s = step(s, cset, cfg, pipeline)
        out = s.particles.x if collect else None
        return s, out

    return jax.lax.scan(body, state, None, length=n_steps)

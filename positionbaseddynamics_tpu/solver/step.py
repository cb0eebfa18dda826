"""The time stepper — functional replacement for the reference's
``TimeStepController::step`` (``Simulation/TimeStepController.cpp:75-241``).

Semantics preserved per SURVEY §3.1: per sim step, substep loop of
{integrate → position-constraint projection → velocity reconstruction},
then (once per step, not per substep) collision detection + velocity
constraint projection. Everything is one jitted pure function over the
``SimState`` pytree; substeps and solver iterations are ``lax.scan`` /
unrolled static loops; batches replace the constraint-object dispatch.

Projection modes (cf. ``solver/constraints.py``): ``jacobi`` (averaged,
optionally over-relaxed — the TPU-fast path) and ``gauss_seidel`` (exact
colored Gauss-Seidel matching the reference's graph-colored solver,
``SimulationModel.cpp:1033-1094`` + ``TimeStepController.cpp:270-295``).
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
from .state import OrientationState, ParticleState, SimState

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
    gravity: tuple = (0.0, -9.81, 0.0)
    solver_mode: str = "jacobi"      # "jacobi" | "gauss_seidel"
    jacobi_omega: float = 1.0        # SOR weight for averaged Jacobi


def _jacobi_counts(n: int, idx: Array) -> Array:
    """#constraints touching each item — the Jacobi averaging denominator."""
    ones = jnp.ones(idx.size, jnp.float32)
    return jnp.maximum(
        jnp.zeros((n,), jnp.float32).at[idx.reshape(-1)].add(ones), 1.0
    )


def _project_particle_batch(x, inv_mass, batch, lam, dt, cfg):
    """One projection pass of one particle-constraint family."""
    n = x.shape[0]
    if cfg.solver_mode == "gauss_seidel":
        for color in range(batch.num_colors):
            corr, new_lam = batch.solve(x, inv_mass, lam, dt)
            m = batch.color == color
            corr = corr * m[:, None, None]
            lam = jnp.where(m, new_lam, lam)
            x = x + scatter_add(n, batch.idx, corr)
        return x, lam
    corr, lam = batch.solve(x, inv_mass, lam, dt)
    dx = scatter_add(n, batch.idx, corr)
    x = x + (cfg.jacobi_omega / _jacobi_counts(n, batch.idx))[:, None] * dx
    return x, lam


def _project_rod_batches(x, inv_mass, q, inv_mass_q, cset, cfg):
    """Stretch-shear (positions + quaternions) then bend-twist (quaternions),
    mirroring the rod constraint solves of ``Constraints.cpp`` with
    post-correction quaternion renormalization."""
    n = x.shape[0]
    m = q.shape[0]
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
            cp = (cfg.jacobi_omega / _jacobi_counts(n, ss.idx_p))[:, None]
            cq = (cfg.jacobi_omega / _jacobi_counts(m, ss.idx_q))[:, None]
            x = x + cp * scatter_add(n, ss.idx_p, corr_p)
            q = quat.normalize(q + cq * scatter_add(m, ss.idx_q[:, None], corr_q))
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
            cq = (cfg.jacobi_omega / _jacobi_counts(m, bt.idx_q))[:, None]
            q = quat.normalize(q + cq * scatter_add(m, bt.idx_q, corr_q))
    return x, q


def project_positions(x, inv_mass, q, inv_mass_q, cset: ConstraintSet, dt, cfg: StepConfig):
    """Position-constraint projection — the batched analogue of
    ``TimeStepController::positionConstraintProjection``
    (``TimeStepController.cpp:251-295``). λ arrays start at zero
    (``Constraints.cpp:1240-1241`` reset-at-iter-0 semantics)."""
    lams = cset.init_lambdas()
    for _ in range(cfg.max_iterations):
        for name, batch in cset.particle_batches():
            x, lams[name] = _project_particle_batch(
                x, inv_mass, batch, lams[name], dt, cfg
            )
        if q is not None:
            x, q = _project_rod_batches(x, inv_mass, q, inv_mass_q, cset, cfg)
    return x, q


def _substep(state: SimState, cset: ConstraintSet, h, cfg: StepConfig) -> SimState:
    """One substep: integrate → project → velocity update
    (``TimeStepController.cpp:93-173``)."""
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

    x, oq = project_positions(
        x, p.inv_mass, oq, o.inv_mass if o is not None else None, cset, h, cfg
    )

    if cfg.velocity_update_method == 1:
        v = integration.velocity_update_second_order(
            h, p.inv_mass, x, old_x, last_x, v
        )
    else:
        v = integration.velocity_update_first_order(h, p.inv_mass, x, old_x, v)

    particles = dataclasses.replace(
        p, x=x, v=v, old_x=old_x, last_x=last_x
    )
    orientations = o
    if o is not None:
        oomega = integration.angular_velocity_update_first_order(
            h, o.inv_mass, oq, old_q, oomega
        )
        orientations = dataclasses.replace(
            o, q=oq, omega=oomega, old_q=old_q, last_q=last_q
        )
    return dataclasses.replace(
        state, particles=particles, orientations=orientations
    )


def step(state: SimState, cset: ConstraintSet, cfg: StepConfig) -> SimState:
    """One full sim step = ``substeps`` substeps (+ collision & velocity
    solve once per step — added with the collision subsystem), mirroring
    ``TimeStepController::step``. Pure function; jit with
    ``jax.jit(step, static_argnums=2)`` or via :func:`make_step_fn`."""
    h = cfg.dt / cfg.substeps

    def body(s, _):
        return _substep(s, cset, h, cfg), None

    state, _ = jax.lax.scan(body, state, None, length=cfg.substeps)
    return dataclasses.replace(state, time=state.time + cfg.dt)


def make_step_fn(cset: ConstraintSet, cfg: StepConfig):
    """Jitted ``state → state`` closure over a fixed scene."""
    @jax.jit
    def fn(state: SimState) -> SimState:
        return step(state, cset, cfg)
    return fn


def rollout(state: SimState, cset: ConstraintSet, cfg: StepConfig,
            n_steps: int, collect: bool = False):
    """Scan ``n_steps`` sim steps. Returns final state, plus the stacked
    particle-position trajectory ``(n_steps, N, 3)`` when ``collect``."""

    def body(s, _):
        s = step(s, cset, cfg)
        out = s.particles.x if collect else None
        return s, out

    return jax.lax.scan(body, state, None, length=n_steps)

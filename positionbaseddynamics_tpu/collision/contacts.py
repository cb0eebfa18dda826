"""Velocity-level contact solve with restitution, penalty, and Coulomb
friction — the batched form of
``velocitySolve_RigidBodyContactConstraint`` and
``velocitySolve_ParticleRigidBodyContactConstraint``
(``PositionBasedDynamics/PositionBasedRigidBodyDynamics.cpp:2290-2383,
2454-2560``).

Per contact row and iteration:

* impulse magnitude ``p = nKn⁻¹ (goal_uₙ − u_rel·n)``, clamped so the
  accumulated sum stays ≥ 0;
* penalty impulse ``−k · nKn⁻¹ · d`` for penetration depth ``d < 0``;
* friction: subtract ``clamp(μ pₙ, ±p_max) · t``.

The reference solves contacts sequentially (Gauss-Seidel within the
``maxIterationsV`` loop); here each pass solves all rows simultaneously
from the same velocities and scatter-adds the corrections (Jacobi) — the
standard TPU trade, compensated by the iteration loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .detection import ParticleRigidContacts, RigidContacts

Array = jax.Array


def _impulse(c, u_rel, sum_impulses, stiffness, row_w=None):
    """Shared impulse logic for both contact families. ``row_w`` is the
    Jacobi row weight (1/#active rows on the most-contended body):
    simultaneous rows in a contact patch each see the full approach
    velocity, so applying every row's full impulse MULTIPLIES the
    response by the patch size — spheres visibly gained energy across
    bounces until the weighting landed (the sequential reference sweep
    lets the first row absorb the approach). Returns ``(p, new_sum)``."""
    u_rel_n = jnp.sum(c.normal * u_rel, -1)
    corr = c.nkn_inv * (c.goal_u_n - u_rel_n)
    corr = jnp.maximum(corr, -sum_impulses)
    d = jnp.sum(c.normal * (c.cp0 - c.cp1), -1)
    corr = corr - jnp.where(d < 0.0, stiffness * c.nkn_inv * d, 0.0)
    if row_w is not None:
        corr = corr * row_w
    new_sum = sum_impulses + corr * c.mask
    p = corr[:, None] * c.normal
    pn = corr  # p·n
    ft = jnp.where(c.friction * pn > c.p_max, c.p_max,
                   jnp.where(c.friction * pn < -c.p_max, -c.p_max,
                             c.friction * pn))
    if row_w is not None:
        ft = ft * row_w
    p = p - ft[:, None] * c.tangent
    return p * c.mask[:, None], new_sum


def solve_rigid_contacts(c: RigidContacts, rx, rv, rom, inv_mass, inv_iw,
                         sum_impulses, stiffness):
    """One Jacobi pass over all rb–rb contact rows. Returns
    ``(rv, rom, sum_impulses)`` with corrections scattered in."""
    r0 = c.cp0 - rx[c.body0]
    r1 = c.cp1 - rx[c.body1]
    u_rel = (rv[c.body0] + jnp.cross(rom[c.body0], r0)
             - rv[c.body1] - jnp.cross(rom[c.body1], r1))
    nb = rv.shape[0]
    cnt = (jnp.zeros((nb,), jnp.float32).at[c.body0].add(c.mask)
           .at[c.body1].add(c.mask))
    # rows only contend through DYNAMIC bodies (a static floor absorbs
    # every row independently)
    cnt = jnp.where(inv_mass > 0.0, cnt, 1.0)
    row_w = 1.0 / jnp.maximum(
        jnp.maximum(cnt[c.body0], cnt[c.body1]), 1.0)
    p, sum_impulses = _impulse(c, u_rel, sum_impulses, stiffness,
                               row_w=row_w)

    w0 = inv_mass[c.body0]
    w1 = inv_mass[c.body1]
    dv0 = w0[:, None] * p
    dom0 = jnp.einsum("kij,kj->ki", inv_iw[c.body0], jnp.cross(r0, p))
    dv1 = -w1[:, None] * p
    dom1 = jnp.einsum("kij,kj->ki", inv_iw[c.body1], jnp.cross(r1, -p))

    rv = rv.at[c.body0].add(dv0).at[c.body1].add(dv1)
    rom = rom.at[c.body0].add(dom0).at[c.body1].add(dom1)
    return rv, rom, sum_impulses


def _impulse_row(normal, tangent, nkn_inv, p_max, goal_u_n, cp0, cp1,
                 mask, u_rel, sum_i, stiffness, friction):
    """Scalar-row form of :func:`_impulse` for the sequential solver."""
    u_rel_n = jnp.sum(normal * u_rel)
    corr = nkn_inv * (goal_u_n - u_rel_n)
    corr = jnp.maximum(corr, -sum_i)
    d = jnp.sum(normal * (cp0 - cp1))
    corr = corr - jnp.where(d < 0.0, stiffness * nkn_inv * d, 0.0)
    new_sum = sum_i + corr * mask
    p = corr * normal
    pn = corr
    ft = jnp.where(friction * pn > p_max, p_max,
                   jnp.where(friction * pn < -p_max, -p_max, friction * pn))
    p = p - ft * tangent
    return p * mask, new_sum


def solve_rigid_contacts_sequential(c: RigidContacts, rx, rv, rom, inv_mass,
                                    inv_iw, sum_impulses, stiffness):
    """Sequential (Gauss-Seidel) pass over the rb–rb contact rows in
    buffer order — exactly the reference's per-contact in-place sweep
    (``TimeStepController::velocityConstraintProjection``,
    ``TimeStepController.cpp:330-343``). A parity mode: one
    ``lax.scan`` step per row, so use for small contact counts only."""

    def body(carry, row):
        rv, rom, _ = carry
        (b0, b1, cp0, cp1, n, t, nkn_inv, p_max, goal, fric, mask,
         sum_i) = row
        r0 = cp0 - rx[b0]
        r1 = cp1 - rx[b1]
        u_rel = (rv[b0] + jnp.cross(rom[b0], r0)
                 - rv[b1] - jnp.cross(rom[b1], r1))
        p, new_sum = _impulse_row(n, t, nkn_inv, p_max, goal, cp0, cp1,
                                  mask, u_rel, sum_i, stiffness, fric)
        rv = rv.at[b0].add(inv_mass[b0] * p)
        rom = rom.at[b0].add(inv_iw[b0] @ jnp.cross(r0, p))
        rv = rv.at[b1].add(-inv_mass[b1] * p)
        rom = rom.at[b1].add(inv_iw[b1] @ jnp.cross(r1, -p))
        return (rv, rom, new_sum), new_sum

    rows = (c.body0, c.body1, c.cp0, c.cp1, c.normal, c.tangent, c.nkn_inv,
            c.p_max, c.goal_u_n, c.friction, c.mask, sum_impulses)
    (rv, rom, _), new_sums = jax.lax.scan(body, (rv, rom, 0.0), rows)
    return rv, rom, new_sums


def solve_particle_rigid_contacts_sequential(
        c: ParticleRigidContacts, px, pv, p_inv_mass, rx, rv, rom, inv_mass,
        inv_iw, sum_impulses, stiffness):
    """Sequential particle–rigid contact sweep (parity mode; see
    :func:`solve_rigid_contacts_sequential`)."""

    def body(carry, row):
        pv, rv, rom, _ = carry
        (pi, b1, cp0, cp1, n, t, nkn_inv, p_max, goal, fric, mask,
         sum_i) = row
        r1 = cp1 - rx[b1]
        u_rel = pv[pi] - (rv[b1] + jnp.cross(rom[b1], r1))
        p, new_sum = _impulse_row(n, t, nkn_inv, p_max, goal, cp0, cp1,
                                  mask, u_rel, sum_i, stiffness, fric)
        pv = pv.at[pi].add(p_inv_mass[pi] * p)
        rv = rv.at[b1].add(-inv_mass[b1] * p)
        rom = rom.at[b1].add(inv_iw[b1] @ jnp.cross(r1, -p))
        return (pv, rv, rom, new_sum), new_sum

    rows = (c.particle, c.body1, c.cp0, c.cp1, c.normal, c.tangent,
            c.nkn_inv, c.p_max, c.goal_u_n, c.friction, c.mask,
            sum_impulses)
    (pv, rv, rom, _), new_sums = jax.lax.scan(body, (pv, rv, rom, 0.0), rows)
    return pv, rv, rom, new_sums


def solve_particle_rigid_contacts(c: ParticleRigidContacts, px, pv,
                                  p_inv_mass, rx, rv, rom, inv_mass, inv_iw,
                                  sum_impulses, stiffness):
    """One Jacobi pass over all particle–rigid contact rows. Returns
    ``(pv, rv, rom, sum_impulses)``. ``cp0`` is refreshed to the current
    particle position so the penalty depth tracks the substep result."""
    r1 = c.cp1 - rx[c.body1]
    u_rel = pv[c.particle] - (rv[c.body1] + jnp.cross(rom[c.body1], r1))
    np_ = pv.shape[0]
    nb = rv.shape[0]
    cnt_p = jnp.zeros((np_,), jnp.float32).at[c.particle].add(c.mask)
    cnt_b = jnp.zeros((nb,), jnp.float32).at[c.body1].add(c.mask)
    cnt_b = jnp.where(inv_mass > 0.0, cnt_b, 1.0)
    cnt_p = jnp.where(p_inv_mass > 0.0, cnt_p, 1.0)
    row_w = 1.0 / jnp.maximum(
        jnp.maximum(cnt_p[c.particle], cnt_b[c.body1]), 1.0)
    p, sum_impulses = _impulse(c, u_rel, sum_impulses, stiffness,
                               row_w=row_w)

    w0 = p_inv_mass[c.particle]
    w1 = inv_mass[c.body1]
    pv = pv.at[c.particle].add(w0[:, None] * p)
    rv = rv.at[c.body1].add(-w1[:, None] * p)
    rom = rom.at[c.body1].add(
        jnp.einsum("kij,kj->ki", inv_iw[c.body1], jnp.cross(r1, -p)))
    return pv, rv, rom, sum_impulses

"""Rigid-body joint & contact kernels.

TPU-native re-derivation of
``PositionBasedDynamics/PositionBasedRigidBodyDynamics.{h,cpp}``. The
reference implements one bespoke ``init_X/update_X/solve_X`` triple per
joint type, each assembling a small ``K = J M⁻¹ Jᵀ`` system and solving it
with an LLT factorization (e.g. BallJoint ``PositionBasedRigidBodyDynamics
.cpp:212-262``, HingeJoint ``:565-690``, SliderJoint ``:1049-1150``).

Here every joint is expressed in ONE generic masked-row form so a single
batched 6×6 solve covers the whole joint zoo:

    each joint has up to 6 constraint rows; row i contributes, for body b,
    a linear direction ``L_b[i] ∈ R³`` and an angular direction
    ``A_b[i] ∈ R³`` (the Jacobian row is ``J_b = [L_b | A_b]``), so

        K   = Σ_b  w_b L_b L_bᵀ + A_b I_b⁻¹ A_bᵀ        (6×6, masked)
        Δλ  = K⁻¹ · (−(C + α λ))
        Δx_b = w_b L_bᵀ Δλ,     Δω̂_b = I_b⁻¹ A_bᵀ Δλ
        Δq_b = ½ (0, Δω̂_b) ⊗ q_b

    which reproduces the reference's per-joint formulas exactly:
    a positional row with direction d acting at connector c_b has
    ``L_b = ±d`` and ``A_b = ±(r_b × d)`` with ``r_b = c_b − x_b``
    (this is the row form of ``computeMatrixK``,
    ``PositionBasedRigidBodyDynamics.cpp:11-44``: K = wI − r̃ J⁻¹ r̃);
    a rotational row has ``L_b = 0`` and ``A_b = ±t`` with
    ``t = −Pr (Q(q0)ᵀ G(q1))`` (e.g. hinge ``:694-706``).

All functions are single-joint and meant to be ``jax.vmap``-ed by
``solver/joints.py``. Invalid/inactive rows are masked; degenerate systems
return zero corrections.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import quaternion as quat
from .mathutils import cross_product_matrix

Array = jax.Array

NUM_ROWS = 6


def quat_mat_q(q: Array) -> Array:
    """Left-multiplication matrix: ``Q(a) · vec4(b) = vec4(a ⊗ b)`` in
    [w,x,y,z] component order (``computeMatrixQ``,
    ``PositionBasedRigidBodyDynamics.cpp:111-157``)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = jnp.stack([
        w, -x, -y, -z,
        x, w, -z, y,
        y, z, w, -x,
        z, -y, x, w,
    ], axis=-1)
    return rows.reshape(q.shape[:-1] + (4, 4))


def quat_mat_qhat(q: Array) -> Array:
    """Right-multiplication matrix: ``Q̂(b) · vec4(a) = vec4(a ⊗ b)``
    (``computeMatrixQHat``, ``PositionBasedRigidBodyDynamics.cpp:135-156``)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = jnp.stack([
        w, -x, -y, -z,
        x, w, z, -y,
        y, -z, w, x,
        z, y, -x, w,
    ], axis=-1)
    return rows.reshape(q.shape[:-1] + (4, 4))


def quat_mat_g(q: Array) -> Array:
    """4×3 map ``G(q) · ω = vec4(½ (0, ω) ⊗ q)`` (``computeMatrixG``,
    ``PositionBasedRigidBodyDynamics.cpp:92-109``)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    half = jnp.asarray(0.5, q.dtype)
    rows = jnp.stack([
        -x, -y, -z,
        w, z, -y,
        -z, w, x,
        y, -x, w,
    ], axis=-1) * half
    return rows.reshape(q.shape[:-1] + (4, 3))


def rotation_correction(ot: Array, q: Array) -> Array:
    """Quaternion increment from an angular impulse term:
    ``Δq = ½ (0, ot) ⊗ q`` (the ``corr_q.coeffs() = 0.5*(otQ*q)`` pattern
    used by every reference joint solve)."""
    return 0.5 * quat.multiply(quat.from_vec(ot), q)


def pos_row(d: Array, r0: Array, r1: Array):
    """Positional constraint row with lever arms: direction ``d`` acting at
    connectors with arms ``r_b = c_b − x_b``. Returns ``(l0, a0, l1, a1)``.
    Row form of the two-``computeMatrixK`` pattern (ball joint
    ``PositionBasedRigidBodyDynamics.cpp:233-239``)."""
    return d, jnp.cross(r0, d), -d, -jnp.cross(r1, d)


def pos_row_com(d: Array):
    """Positional row acting at the centers of mass (no arms) — the slider /
    damper / motor-slider pattern ``J = (P 0)``
    (``PositionBasedRigidBodyDynamics.cpp:1100-1135``)."""
    z = jnp.zeros_like(d)
    return d, z, -d, z


def rot_row(t: Array):
    """Pure rotational row ``J = (0, ±t)``."""
    z = jnp.zeros_like(t)
    return z, t, z, -t


def rotational_rows(pr: Array, q0: Array, q1: Array):
    """Rotational constraint values and directions from a (precomputed)
    projection ``Pr (p,4)``:

    ``C = Pr · vec4(q̄0 ⊗ q1)``,  ``t = −Pr (Q(q0)ᵀ G(q1))  (p,3)``

    as in the hinge/slider solves (``PositionBasedRigidBodyDynamics.cpp:
    694-706, 1085-1097``). Returns ``(c (p,), t (p,3))``."""
    rel = quat.multiply(quat.conjugate(q0), q1)
    c = pr @ rel
    t = -pr @ (quat_mat_q(q0).T @ quat_mat_g(q1))
    return c, t


def solve_rows(
    c, l0, a0, l1, a1, w0, iw0, w1, iw1, alpha, lam_rows, active,
    k_a0=None, k_a1=None,
):
    """Generic masked-row joint solve (see module docstring).

    ``c (6,)`` constraint values, ``l*/a* (6,3)`` row directions,
    ``w* `` scalar inverse masses, ``iw* (3,3)`` world inverse inertias
    (pre-masked to zero for static bodies), ``alpha (6,)`` XPBD compliance
    per row, ``lam_rows (6,)`` accumulated multipliers, ``active (6,)``
    row mask. ``k_a0/k_a1`` optionally override the angular rows used for
    the K assembly only (the reference's velocity-motor-slider builds K
    from ``t`` but applies identity angular rows,
    ``PositionBasedRigidBodyDynamics.cpp:1380-1460``).

    Returns ``(dlam (6,), dx0, ot0, dx1, ot1)`` where ``ot_b`` is the
    angular term to feed :func:`rotation_correction` (position level) or
    the ω correction directly (velocity level)."""
    ka0 = a0 if k_a0 is None else k_a0
    ka1 = a1 if k_a1 is None else k_a1
    k = (
        w0 * (l0 @ l0.T) + ka0 @ iw0 @ ka0.T
        + w1 * (l1 @ l1.T) + ka1 @ iw1 @ ka1.T
    )
    k = k + jnp.diag(alpha)
    m = active.astype(c.dtype)
    mm = m[:, None] * m[None, :]
    k = k * mm + jnp.diag(1.0 - m) + 1e-9 * jnp.eye(NUM_ROWS, dtype=c.dtype)
    rhs = -(c + alpha * lam_rows) * m
    dlam = jnp.linalg.solve(k, rhs)
    # if both bodies are static the system is the ε-regularized identity;
    # the corrections below vanish anyway because w=0 and iw=0.
    dx0 = w0 * (l0.T @ dlam)
    ot0 = iw0 @ (a0.T @ dlam)
    dx1 = w1 * (l1.T @ dlam)
    ot1 = iw1 @ (a1.T @ dlam)
    return dlam, dx0, ot0, dx1, ot1


# ---------------------------------------------------------------------------
# Contacts (velocity level)
# ---------------------------------------------------------------------------


def compute_matrix_k(connector, inv_mass, x, inv_inertia_w):
    """``K = w·I − r̃ J⁻¹ r̃`` with ``r = connector − x``
    (``computeMatrixK``, ``PositionBasedRigidBodyDynamics.cpp:11-44``).
    ``inv_inertia_w`` must be pre-masked to zero for static bodies."""
    r = cross_product_matrix(connector - x)
    eye = jnp.eye(3, dtype=connector.dtype)
    return inv_mass * eye - r @ inv_inertia_w @ r


def init_rigid_contact(
    w0, x0, v0, iw0, omega0, w1, x1, v1, iw1, omega1,
    cp0, cp1, normal, restitution,
):
    """Precompute contact info, mirroring ``init_RigidBodyContactConstraint``
    (``PositionBasedRigidBodyDynamics.cpp:2219-2283``).

    Returns ``(tangent, nkn_inv, p_max, goal_u_rel_n)``."""
    r0 = cp0 - x0
    r1 = cp1 - x1
    u_rel = (v0 + jnp.cross(omega0, r0)) - (v1 + jnp.cross(omega1, r1))
    u_rel_n = jnp.dot(normal, u_rel)

    t = u_rel - u_rel_n * normal
    tl2 = jnp.dot(t, t)
    t = jnp.where(tl2 > 1e-6, t * jax.lax.rsqrt(jnp.maximum(tl2, 1e-12)), t)

    k = compute_matrix_k(cp0, w0, x0, iw0) + compute_matrix_k(cp1, w1, x1, iw1)
    nkn = jnp.dot(normal, k @ normal)
    nkn_inv = jnp.where(jnp.abs(nkn) > 1e-12, 1.0 / jnp.maximum(jnp.abs(nkn), 1e-12), 0.0)
    tkt = jnp.dot(t, k @ t)
    p_max = jnp.where(jnp.abs(tkt) > 1e-12, jnp.dot(u_rel, t) / jnp.where(jnp.abs(tkt) > 1e-12, tkt, 1.0), 0.0)

    goal = jnp.where(u_rel_n < 0.0, -restitution * u_rel_n, 0.0)
    return t, nkn_inv, p_max, goal


def velocity_solve_rigid_contact(
    w0, x0, v0, iw0, omega0, w1, x1, v1, iw1, omega1,
    cp0, cp1, normal, tangent, nkn_inv, p_max, goal_u_rel_n,
    stiffness, friction, sum_impulses,
):
    """One contact impulse pass, mirroring
    ``velocitySolve_RigidBodyContactConstraint``
    (``PositionBasedRigidBodyDynamics.cpp:2286-2382``): normal impulse
    toward the goal velocity, clamped so the accumulated impulse stays
    non-negative, plus a penalty term against penetration and a Coulomb
    friction clamp ``|p_t| ≤ μ p_n``.

    Returns ``(dv0, domega0, dv1, domega1, new_sum_impulses)``."""
    d = jnp.dot(normal, cp0 - cp1)  # penetration depth
    r0 = cp0 - x0
    r1 = cp1 - x1
    u_rel = (v0 + jnp.cross(omega0, r0)) - (v1 + jnp.cross(omega1, r1))
    u_rel_n = jnp.dot(u_rel, normal)

    mag = nkn_inv * (goal_u_rel_n - u_rel_n)
    mag = jnp.maximum(mag, -sum_impulses)
    mag = mag - jnp.where(d < 0.0, stiffness * nkn_inv * d, 0.0)

    p = mag * normal
    new_sum = sum_impulses + mag

    pn = jnp.dot(p, normal)
    p = p - jnp.clip(friction * pn, -p_max, p_max) * tangent

    dv0 = w0 * p
    domega0 = iw0 @ jnp.cross(r0, p)
    dv1 = -w1 * p
    domega1 = iw1 @ jnp.cross(r1, -p)
    return dv0, domega0, dv1, domega1, new_sum


def init_particle_rigid_contact(
    w0, x0, v0, w1, x1, v1, iw1, omega1, cp0, cp1, normal, restitution,
):
    """Particle–rigid-body variant of contact precompute
    (``init_ParticleRigidBodyContactConstraint``,
    ``PositionBasedRigidBodyDynamics.cpp:2385-2448``). Body 0 is the
    particle (point mass, no rotation)."""
    r1 = cp1 - x1
    u_rel = v0 - (v1 + jnp.cross(omega1, r1))
    u_rel_n = jnp.dot(normal, u_rel)

    t = u_rel - u_rel_n * normal
    tl2 = jnp.dot(t, t)
    t = jnp.where(tl2 > 1e-6, t * jax.lax.rsqrt(jnp.maximum(tl2, 1e-12)), t)

    k = compute_matrix_k(cp1, w1, x1, iw1) + w0 * jnp.eye(3, dtype=x0.dtype)
    nkn = jnp.dot(normal, k @ normal)
    nkn_inv = jnp.where(jnp.abs(nkn) > 1e-12, 1.0 / jnp.maximum(jnp.abs(nkn), 1e-12), 0.0)
    tkt = jnp.dot(t, k @ t)
    p_max = jnp.where(jnp.abs(tkt) > 1e-12, jnp.dot(u_rel, t) / jnp.where(jnp.abs(tkt) > 1e-12, tkt, 1.0), 0.0)

    goal = jnp.where(u_rel_n < 0.0, -restitution * u_rel_n, 0.0)
    return t, nkn_inv, p_max, goal


def velocity_solve_particle_rigid_contact(
    w0, v0, w1, x1, v1, iw1, omega1,
    cp0, cp1, normal, tangent, nkn_inv, p_max, goal_u_rel_n,
    stiffness, friction, sum_impulses,
):
    """Particle–rigid contact impulse
    (``velocitySolve_ParticleRigidBodyContactConstraint``,
    ``PositionBasedRigidBodyDynamics.cpp:2451-2539``).
    Returns ``(dv0, dv1, domega1, new_sum_impulses)``."""
    d = jnp.dot(normal, cp0 - cp1)
    r1 = cp1 - x1
    u_rel = v0 - (v1 + jnp.cross(omega1, r1))
    u_rel_n = jnp.dot(u_rel, normal)

    mag = nkn_inv * (goal_u_rel_n - u_rel_n)
    mag = jnp.maximum(mag, -sum_impulses)
    mag = mag - jnp.where(d < 0.0, stiffness * nkn_inv * d, 0.0)

    p = mag * normal
    new_sum = sum_impulses + mag

    pn = jnp.dot(p, normal)
    p = p - jnp.clip(friction * pn, -p_max, p_max) * tangent

    dv0 = w0 * p
    dv1 = -w1 * p
    domega1 = iw1 @ jnp.cross(r1, -p)
    return dv0, dv1, domega1, new_sum

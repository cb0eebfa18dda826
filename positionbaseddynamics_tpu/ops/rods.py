"""Cosserat rod constraint kernels (position + quaternion corrections).

TPU-native re-derivation of the ``PositionBasedCosseratRods`` section of
``PositionBasedDynamics/PositionBasedElasticRods.cpp`` (Kugelstadt &
Schömer 2016): stretch-shear couples two particles and one orientation
quaternion; bend-twist couples two neighboring orientation quaternions via
the discrete Darboux vector. Single-constraint functions for ``jax.vmap``.

Quaternion layout is ``[w, x, y, z]`` (see ``ops.quaternion``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import quaternion as quat
from .mathutils import EPS

Array = jax.Array


def solve_stretch_shear(p0, w0, p1, w1, q0, wq0, stretch_ks, rest_length):
    """Stretch-shear constraint ``C = (p1−p0)/L − d3(q0)``.

    Mirrors ``PositionBasedCosseratRods::solve_StretchShearConstraint``
    (``PositionBasedElasticRods.cpp:20-55``): the correction vector γ is
    scaled by the combined generalized inverse mass
    ``(w0+w1)/L + 4 wq0 L + ε``, per-axis stiffness is applied in the
    material frame (world frame when all three Ks are equal — the two
    branches agree because R diag(k)Rᵀ = k·I), and the quaternion correction
    is ``corrq = 2 wq0 L · (0,γ) ⊗ (q0 ⊗ ē3)``.

    Returns ``(corr0 (3,), corr1 (3,), corrq0 (4,))`` — corrq0 is an
    *additive* (non-normalized) quaternion update.
    """
    d3 = quat.third_director(q0)

    gamma = (p1 - p0) / rest_length - d3
    gamma = gamma / ((w1 + w0) / rest_length + wq0 * 4.0 * rest_length + EPS)

    # Apply per-axis stiffness in the material frame: γ ← R diag(ks) Rᵀ γ.
    r = quat.to_matrix(q0)
    gamma = r @ (stretch_ks * (r.T @ gamma))

    corr0 = w0 * gamma
    corr1 = -w1 * gamma

    # q0 ⊗ ē3 where e3 = (0,0,0,1): in [w,x,y,z] layout this is
    # [qz, −qy, qx, −qw] (cf. the cheap form at
    # ``PositionBasedElasticRods.cpp:50``).
    q_e3_bar = jnp.stack([q0[3], -q0[2], q0[1], -q0[0]])
    corrq0 = quat.multiply(quat.from_vec(gamma), q_e3_bar)
    corrq0 = corrq0 * (2.0 * wq0 * rest_length)
    return corr0, corr1, corrq0


def solve_bend_twist(q0, wq0, q1, wq1, bend_ks, rest_darboux):
    """Bend-twist constraint on the discrete Darboux vector ``Ω = q̄0 ⊗ q1``.

    Mirrors ``PositionBasedCosseratRods::solve_BendTwistConstraint``
    (``PositionBasedElasticRods.cpp:57-81``) including the quaternion
    double-cover sign fix (pick ``Ω − Ω₀`` or ``Ω + Ω₀``, whichever is
    smaller) and zeroing of the scalar part.

    ``rest_darboux`` is the rest Darboux quaternion ``[w,x,y,z]``.
    Returns ``(corrq0 (4,), corrq1 (4,))`` additive quaternion updates.
    """
    omega = quat.multiply(quat.conjugate(q0), q1)

    omega_minus = omega - rest_darboux  # ΔΩ with −Ω₀
    omega_plus = omega + rest_darboux   # ΔΩ with +Ω₀
    use_plus = jnp.sum(omega_minus * omega_minus) > jnp.sum(omega_plus * omega_plus)
    delta = jnp.where(use_plus, omega_plus, omega_minus)

    scale = bend_ks / (wq0 + wq1 + 1e-6)
    delta = delta.at[1:4].multiply(scale)
    delta = delta.at[0].set(0.0)  # Darboux vector has no scalar part

    corrq0 = wq0 * quat.multiply(q1, delta)
    corrq1 = -wq1 * quat.multiply(q0, delta)
    return corrq0, corrq1


def rest_darboux(q0: Array, q1: Array) -> Array:
    """Rest Darboux quaternion of two neighboring frames: ``q̄0 ⊗ q1``
    (stored at constraint init, cf. ``Simulation/Constraints.cpp``
    BendTwistConstraint init)."""
    return quat.multiply(quat.conjugate(q0), q1)

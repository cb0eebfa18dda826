"""Time-integration kernels (symplectic Euler + velocity reconstruction).

TPU-native re-derivation of ``PositionBasedDynamics/TimeIntegration.{h,cpp}``:
every function is vectorized over a leading particle/body axis and uses
``jnp.where`` masks instead of the reference's ``if (mass != 0)`` early-outs
(static items have ``inv_mass == 0`` and are left untouched, matching
``Simulation/ParticleData.h:90`` semantics).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import quaternion as quat

Array = jax.Array


def _active(inv_mass: Array) -> Array:
    """Dynamic-item mask with a trailing broadcast axis."""
    return (inv_mass > 0.0)[..., None]


def semi_implicit_euler(h, inv_mass: Array, x: Array, v: Array, a: Array):
    """Symplectic Euler: ``v += a h; x += v h`` for dynamic items.

    Mirrors ``TimeIntegration::semiImplicitEuler``
    (``PositionBasedDynamics/TimeIntegration.cpp:7-19``).
    Returns ``(x_new, v_new)``.
    """
    act = _active(inv_mass)
    v_new = jnp.where(act, v + a * h, v)
    x_new = jnp.where(act, x + v_new * h, x)
    return x_new, v_new


def semi_implicit_euler_rotation(
    h, inv_mass: Array, inertia_w: Array, inv_inertia_w: Array,
    q: Array, omega: Array, torque: Array,
):
    """Rigid rotation update with gyroscopic term, then quaternion integration.

    ``ω += h I⁻¹ (τ − ω×(Iω)); q ← normalize(q + h/2 (0,ω)⊗q)`` as in
    ``TimeIntegration::semiImplicitEulerRotation``
    (``PositionBasedDynamics/TimeIntegration.cpp:22-39``).

    ``inertia_w`` / ``inv_inertia_w`` are world-space ``(..., 3, 3)`` tensors.
    Returns ``(q_new, omega_new)``.
    """
    act = _active(inv_mass)
    gyro = torque - jnp.cross(omega, jnp.einsum("...ij,...j->...i", inertia_w, omega))
    omega_new = jnp.where(
        act, omega + h * jnp.einsum("...ij,...j->...i", inv_inertia_w, gyro), omega
    )
    q_new = jnp.where(act, quat.integrate_angular(q, omega_new, h), q)
    return q_new, omega_new


def semi_implicit_euler_rotation_isotropic(h, inv_mass: Array, q: Array, omega: Array):
    """Orientation-particle update with isotropic inertia ``I = m·Id``.

    With isotropic inertia the gyroscopic term vanishes (``ω×(m ω) = 0``) and
    zero torque leaves ω unchanged; only the quaternion advances. This is the
    orientation-field path of the substep loop
    (``Simulation/TimeStepController.cpp:123-129``).
    Returns ``(q_new, omega_new)``.
    """
    act = (inv_mass > 0.0)[..., None]
    q_new = jnp.where(act, quat.integrate_angular(q, omega, h), q)
    return q_new, omega


def velocity_update_first_order(h, inv_mass: Array, x: Array, old_x: Array, v: Array):
    """``v = (x − x_old)/h`` (``TimeIntegration.cpp:42-51``)."""
    return jnp.where(_active(inv_mass), (x - old_x) / h, v)


def velocity_update_second_order(
    h, inv_mass: Array, x: Array, old_x: Array, last_x: Array, v: Array
):
    """``v = (1.5x − 2x_old + 0.5x_last)/h`` (``TimeIntegration.cpp:69-78``)."""
    return jnp.where(_active(inv_mass), (1.5 * x - 2.0 * old_x + 0.5 * last_x) / h, v)


def angular_velocity_update_first_order(h, inv_mass: Array, q: Array, old_q: Array, omega: Array):
    """``ω = 2/h · vec(q ⊗ q̄_old)`` (``TimeIntegration.cpp:54-66``)."""
    rel = quat.multiply(q, quat.conjugate(old_q))
    return jnp.where(_active(inv_mass), quat.vec(rel) * (2.0 / h), omega)


def angular_velocity_update_second_order(h, inv_mass, q, old_q, last_q,
                                         omega):
    """Second-order angular velocity reconstruction
    (``TimeIntegration.cpp:82-96``). NOTE: the reference's implementation
    is knowingly still first order (its own "ToDo: is still first order"
    comment) — reproduced faithfully; ``last_q`` is accepted for
    signature parity and unused."""
    return angular_velocity_update_first_order(h, inv_mass, q, old_q, omega)

"""Quaternion algebra on ``(..., 4)`` arrays, layout ``[w, x, y, z]``.

TPU-native re-derivation of the Eigen quaternion operations used by the
reference (InteractiveComputerGraphics/PositionBasedDynamics). The reference
stores Eigen quaternions whose ``coeffs()`` are ``[x, y, z, w]``; we use the
scalar-first layout ``[w, x, y, z]`` throughout and document every mapping.

All functions are shape-polymorphic over leading batch dimensions and are
safe under ``jax.vmap`` / ``jax.jit``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

#: Identity quaternion [w, x, y, z].
IDENTITY = jnp.array([1.0, 0.0, 0.0, 0.0], dtype=jnp.float32)


def identity(shape=(), dtype=jnp.float32) -> Array:
    """Identity quaternion broadcast to ``shape + (4,)``."""
    q = jnp.zeros(tuple(shape) + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def multiply(a: Array, b: Array) -> Array:
    """Hamilton product ``a ⊗ b`` (same convention as Eigen ``q1 * q2``)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def conjugate(q: Array) -> Array:
    """Quaternion conjugate ``[w, -x, -y, -z]``."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def normalize(q: Array, eps: float = 1e-30) -> Array:
    """Normalize to unit length (reference renormalizes after integration,
    ``PositionBasedDynamics/TimeIntegration.cpp:37``)."""
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    return q * jax.lax.rsqrt(jnp.maximum(n2, eps))


def vec(q: Array) -> Array:
    """Imaginary part ``[x, y, z]`` (Eigen ``q.vec()``)."""
    return q[..., 1:4]


def from_vec(v: Array) -> Array:
    """Pure quaternion ``[0, vx, vy, vz]``."""
    return jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)


def rotate(q: Array, v: Array) -> Array:
    """Rotate vector(s) ``v`` by unit quaternion(s) ``q``: ``q v q*``.

    Uses the expanded form ``v + 2 qw (qv × v) + 2 qv × (qv × v)`` which is
    cheaper than two Hamilton products.
    """
    qw = q[..., :1]
    qv = q[..., 1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def rotate_inv(q: Array, v: Array) -> Array:
    """Rotate ``v`` by the inverse of unit quaternion ``q``."""
    return rotate(conjugate(q), v)


def to_matrix(q: Array) -> Array:
    """Rotation matrix ``(..., 3, 3)`` of a unit quaternion (row-major,
    ``R @ v == rotate(q, v)``)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def from_axis_angle(axis: Array, angle: Array) -> Array:
    """Unit quaternion from rotation axis (normalized) and angle (radians)."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def third_director(q: Array) -> Array:
    """Third director ``d3 = q * e3 * q̄`` of a Cosserat frame.

    Mirrors the closed form in the reference
    (``PositionBasedDynamics/PositionBasedElasticRods.cpp:29-32``):
    ``d3 = [2(qx qz + qw qy), 2(qy qz − qw qx), qw² − qx² − qy² + qz²]``.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            2.0 * (x * z + w * y),
            2.0 * (y * z - w * x),
            w * w - x * x - y * y + z * z,
        ],
        axis=-1,
    )


def integrate_angular(q: Array, omega: Array, h) -> Array:
    """Explicit quaternion integration ``q ← normalize(q + h/2 (0,ω) ⊗ q)``.

    Same update as ``TimeIntegration::semiImplicitEulerRotation``
    (``PositionBasedDynamics/TimeIntegration.cpp:33-37``).
    """
    dq = multiply(from_vec(omega), q)
    return normalize(q + 0.5 * h * dq)

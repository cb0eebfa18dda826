"""Small dense-math helpers shared by the constraint kernels.

TPU-native re-derivation of ``PositionBasedDynamics/MathFunctions.{h,cpp}``:
branch-free formulations of cotangent, signed SVD with inversion handling,
polar decomposition, and Müller-2016 rotation extraction. All functions are
single-item (3-vectors / 3×3 matrices) and meant to be ``vmap``-ed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

#: Generic degeneracy threshold used across the reference kernels
#: (``XPBD.cpp:8``, ``PositionBasedDynamics.cpp`` ``eps``).
EPS = 1e-6


def safe_inv(x, eps: float = 1e-30):
    """``1/x`` guarded against division by zero (returns a huge-but-finite
    value for |x| < eps; callers mask invalid lanes with ``jnp.where``)."""
    return jnp.where(jnp.abs(x) > eps, 1.0 / jnp.where(jnp.abs(x) > eps, x, 1.0), 0.0)


def cot_theta(v: Array, w: Array) -> Array:
    """Cotangent of the angle between ``v`` and ``w``:
    ``cot θ = (v·w)/‖v×w‖`` (``MathFunctions::cotTheta``,
    ``MathFunctions.cpp``). Guarded against parallel vectors."""
    cos_t = jnp.dot(v, w)
    sin_t = jnp.linalg.norm(jnp.cross(v, w))
    return cos_t * safe_inv(jnp.maximum(sin_t, 1e-12))


def svd_inversion_handling(a: Array):
    """Signed SVD: ``A = U diag(σ) Vᵀ`` with ``U, V ∈ SO(3)`` and the
    *smallest* singular value negated when ``det(A) < 0``.

    Matches the semantics of ``MathFunctions::svdWithInversionHandling``
    (``MathFunctions.cpp``: reflections in U/V are converted to rotations by
    flipping the column of the smallest singular value) using a branch-free
    formulation on top of ``jnp.linalg.svd`` (σ sorted descending, so the
    smallest is index 2). Returns ``(U, sigma, VT)``.
    """
    u, s, vt = jnp.linalg.svd(a, full_matrices=False)

    det_u = jnp.linalg.det(u)
    su = jnp.where(det_u < 0.0, -1.0, 1.0)
    u = u.at[:, 2].multiply(su)
    s = s.at[2].multiply(su)

    det_vt = jnp.linalg.det(vt)
    sv = jnp.where(det_vt < 0.0, -1.0, 1.0)
    vt = vt.at[2, :].multiply(sv)
    s = s.at[2].multiply(sv)
    return u, s, vt


def polar_decomposition(a: Array):
    """Stable polar decomposition ``A = R S`` with ``R ∈ SO(3)`` via signed
    SVD (behavioral equivalent of ``MathFunctions::polarDecompositionStable``).
    Returns ``(R, S)``.
    """
    u, s, vt = svd_inversion_handling(a)
    r = u @ vt
    s_mat = vt.T @ jnp.diag(s) @ vt
    return r, s_mat


def extract_rotation(a: Array, q0: Array, iterations: int = 10) -> Array:
    """Iterative rotation extraction from a 3×3 matrix (Müller et al. 2016),
    warm-started from quaternion ``q0`` — the method behind
    ``MathFunctions::extractRotation`` (``MathFunctions.h:52``), used by
    shape matching. Returns the updated unit quaternion.
    """
    from . import quaternion as quat

    def body(_, q):
        r = quat.to_matrix(q)
        # ω = (Σ rᵢ × aᵢ) / (|Σ rᵢ · aᵢ| + eps), columns as vectors
        num = (
            jnp.cross(r[:, 0], a[:, 0])
            + jnp.cross(r[:, 1], a[:, 1])
            + jnp.cross(r[:, 2], a[:, 2])
        )
        den = jnp.abs(
            jnp.dot(r[:, 0], a[:, 0])
            + jnp.dot(r[:, 1], a[:, 1])
            + jnp.dot(r[:, 2], a[:, 2])
        ) + 1e-9
        omega = num / den
        angle = jnp.linalg.norm(omega)
        axis = omega * safe_inv(jnp.maximum(angle, 1e-12))
        dq = quat.from_axis_angle(axis, angle)
        return quat.normalize(quat.multiply(dq, q))

    return jax.lax.fori_loop(0, iterations, body, q0)


def cross_product_matrix(v: Array) -> Array:
    """Skew-symmetric matrix ``[v]×`` with ``[v]× u = v × u``
    (``MathFunctions::crossProductMatrix``, ``MathFunctions.h:45``)."""
    zero = jnp.zeros_like(v[..., 0])
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))

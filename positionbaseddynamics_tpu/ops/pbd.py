"""Classic PBD constraint kernels (stiffness ∈ [0,1], no Lagrange multiplier).

TPU-native re-derivation of ``PositionBasedDynamics/PositionBasedDynamics.cpp``
solve bodies. Single-constraint functions designed for ``jax.vmap``; the
reference's boolean early-outs become ``jnp.where`` masks returning zero
corrections. Each kernel returns the stacked per-particle corrections.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .mathutils import EPS, safe_inv

Array = jax.Array


def solve_distance(p0, w0, p1, w1, rest_length, stiffness):
    """Classic distance constraint: move both ends toward rest length scaled
    by a [0,1] stiffness (``solve_DistanceConstraint``,
    ``PositionBasedDynamics.cpp:13-35``). Returns ``corr (2,3)``.
    """
    w_sum = w0 + w1
    n = p1 - p0
    d = jnp.linalg.norm(n)
    n = n * safe_inv(jnp.maximum(d, 1e-12))

    valid = w_sum > 0.0
    corr = jnp.where(valid, stiffness * (d - rest_length) * safe_inv(w_sum), 0.0) * n
    return jnp.stack([w0 * corr, -w1 * corr])


def solve_dihedral(p0, w0, p1, w1, p2, w2, p3, w3, rest_angle, stiffness):
    """Dihedral-angle bending over triangles (p0,p2,p3) and (p1,p3,p2) with
    shared edge (p2,p3), Bridson-style angle gradients
    (``solve_DihedralConstraint``, ``PositionBasedDynamics.cpp``).
    Returns ``corr (4,3)``.
    """
    e = p3 - p2
    elen = jnp.linalg.norm(e)
    inv_elen = safe_inv(jnp.maximum(elen, EPS))

    n1 = jnp.cross(p2 - p0, p3 - p0)
    n1 = n1 * safe_inv(jnp.maximum(jnp.dot(n1, n1), 1e-24))
    n2 = jnp.cross(p3 - p1, p2 - p1)
    n2 = n2 * safe_inv(jnp.maximum(jnp.dot(n2, n2), 1e-24))

    d0 = elen * n1
    d1 = elen * n2
    d2 = jnp.dot(p0 - p3, e) * inv_elen * n1 + jnp.dot(p1 - p3, e) * inv_elen * n2
    d3 = jnp.dot(p2 - p0, e) * inv_elen * n1 + jnp.dot(p2 - p1, e) * inv_elen * n2

    n1u = n1 * safe_inv(jnp.maximum(jnp.linalg.norm(n1), 1e-12))
    n2u = n2 * safe_inv(jnp.maximum(jnp.linalg.norm(n2), 1e-12))
    dot = jnp.clip(jnp.dot(n1u, n2u), -1.0, 1.0)
    phi = jnp.arccos(dot)

    denom = (
        w0 * jnp.dot(d0, d0) + w1 * jnp.dot(d1, d1)
        + w2 * jnp.dot(d2, d2) + w3 * jnp.dot(d3, d3)
    )
    valid = (elen >= EPS) & (denom != 0.0) & ((w0 > 0.0) | (w1 > 0.0))

    lam = jnp.where(valid, (phi - rest_angle) * safe_inv(denom) * stiffness, 0.0)
    lam = jnp.where(jnp.dot(jnp.cross(n1u, n2u), e) > 0.0, -lam, lam)

    return jnp.stack([-w0 * lam * d0, -w1 * lam * d1, -w2 * lam * d2, -w3 * lam * d3])


def solve_volume(p0, w0, p1, w1, p2, w2, p3, w3, rest_volume, stiffness):
    """Classic tet volume preservation (``solve_VolumeConstraint``,
    ``PositionBasedDynamics.cpp``). Returns ``corr (4,3)``."""
    volume = jnp.dot(jnp.cross(p1 - p0, p2 - p0), p3 - p0) / 6.0

    grad0 = jnp.cross(p1 - p2, p3 - p2)
    grad1 = jnp.cross(p2 - p0, p3 - p0)
    grad2 = jnp.cross(p0 - p1, p3 - p1)
    grad3 = jnp.cross(p1 - p0, p2 - p0)

    denom = (
        w0 * jnp.dot(grad0, grad0) + w1 * jnp.dot(grad1, grad1)
        + w2 * jnp.dot(grad2, grad2) + w3 * jnp.dot(grad3, grad3)
    )
    valid = (stiffness != 0.0) & (jnp.abs(denom) >= EPS)
    lam = jnp.where(valid, stiffness * (volume - rest_volume) * safe_inv(denom), 0.0)

    return jnp.stack([-lam * w0 * grad0, -lam * w1 * grad1, -lam * w2 * grad2, -lam * w3 * grad3])


def solve_isometric_bending(p0, w0, p1, w1, p2, w2, p3, w3, q_mat, stiffness):
    """Classic isometric bending (quadratic energy, no compliance):
    ``Δλ = −k·E / Σ w‖∇E‖²`` (``solve_IsometricBendingConstraint``,
    ``PositionBasedDynamics.cpp:~419``). Stencil order matches the XPBD
    variant: internal ``x = [p2, p3, p0, p1]``. Returns ``corr (4,3)``."""
    xs = jnp.stack([p2, p3, p0, p1])
    ws = jnp.stack([w2, w3, w0, w1])

    energy = 0.5 * jnp.einsum("jk,jd,kd->", q_mat, xs, xs)
    grad = q_mat @ xs

    sum_norm = jnp.sum(ws * jnp.sum(grad * grad, axis=-1))
    valid = jnp.abs(sum_norm) > EPS
    dlam = jnp.where(valid, -stiffness * energy * safe_inv(sum_norm), 0.0)

    corr_internal = dlam * ws[:, None] * grad
    return jnp.stack(
        [corr_internal[2], corr_internal[3], corr_internal[0], corr_internal[1]]
    )


def solve_shape_matching(x, x0, w, rest_cm, inv_rest_mat_unused, stiffness, q_prev):
    """Cluster shape matching via rotation extraction (Müller et al.):
    goal positions ``g = R (x0 − cm0) + cm`` applied with stiffness.

    Behavioral equivalent of ``solve_ShapeMatchingConstraint``
    (``PositionBasedDynamics.cpp:501+``) using quaternion warm-started
    rotation extraction. ``x, x0: (K,3)``, ``w: (K,)``.
    Returns ``(corr (K,3), q_new)``.
    """
    from .mathutils import extract_rotation
    from . import quaternion as quat

    # The reference uses true masses; reconstruct m = 1/w for dynamic
    # particles (static particles keep zero weight in the moment sums).
    mass = jnp.where(w > 0.0, 1.0 / jnp.maximum(w, 1e-12), 0.0)
    m_total = jnp.sum(mass)
    cm = jnp.sum(mass[:, None] * x, axis=0) * safe_inv(m_total)

    p = x - cm
    q0c = x0 - rest_cm
    a_pq = jnp.einsum("k,ki,kj->ij", mass, p, q0c)

    q_new = extract_rotation(a_pq, q_prev, iterations=10)
    r = quat.to_matrix(q_new)

    goal = cm[None, :] + q0c @ r.T
    corr = jnp.where((w > 0.0)[:, None], stiffness * (goal - x), 0.0)
    return corr, q_new

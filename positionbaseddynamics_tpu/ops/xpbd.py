"""XPBD (compliance-based) constraint kernels.

TPU-native re-derivation of ``PositionBasedDynamics/XPBD.{h,cpp}``: each
function solves ONE constraint and is meant to be ``jax.vmap``-ed over a
constraint batch by the solver layer. The common XPBD update is

    α = 1 / (k · dt²)            (compliance; α = 0 when k == 0)
    Δλ = −(C + α λ) / (Σᵢ wᵢ ‖∇ᵢC‖² + α)
    Δxᵢ = Δλ wᵢ ∇ᵢC

The reference's boolean early-outs (degenerate geometry, K < eps — e.g.
``XPBD.cpp:27-34,44-51``) become ``jnp.where`` masks: an invalid constraint
contributes zero correction and leaves λ unchanged.

Every kernel returns ``(corrs, new_lambda)`` where ``corrs`` stacks the
per-particle corrections along a new leading axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .mathutils import (EPS, mm3, mm3_nt, mm3_tn, safe_inv,
                        svd_inversion_handling)

Array = jax.Array


def compliance(stiffness, dt):
    """``α = 1/(k dt²)``, with ``k == 0`` meaning infinitely stiff (α = 0),
    matching ``XPBD.cpp:37-42``."""
    return jnp.where(stiffness != 0.0, safe_inv(stiffness * dt * dt), 0.0)


def solve_distance(p0, w0, p1, w1, rest_length, stiffness, dt, lam):
    """XPBD distance constraint ``C = ‖p0 − p1‖ − L₀``.

    Mirrors ``XPBD::solve_DistanceConstraint`` (``XPBD.cpp:14-60``).
    Returns ``(corr (2,3), new_lam)``.
    """
    n = p0 - p1
    d = jnp.linalg.norm(n)
    valid = d > 1e-6
    n = n * safe_inv(jnp.maximum(d, 1e-6))
    c = d - rest_length

    alpha = compliance(stiffness, dt)
    k = w0 + w1 + alpha
    valid &= jnp.abs(k) > 1e-6

    dlam = jnp.where(valid, -(c + alpha * lam) * safe_inv(k), 0.0)
    pt = n * dlam
    corr = jnp.stack([w0 * pt, -w1 * pt])
    return corr, lam + dlam


def solve_volume(p0, w0, p1, w1, p2, w2, p3, w3, rest_volume, stiffness, dt, lam):
    """XPBD tetrahedral volume constraint ``C = V − V₀`` with
    ``V = 1/6 (p1−p0)×(p2−p0)·(p3−p0)``.

    Mirrors ``XPBD::solve_VolumeConstraint`` (``XPBD.cpp:63-109``).
    Returns ``(corr (4,3), new_lam)``.
    """
    volume = jnp.dot(jnp.cross(p1 - p0, p2 - p0), p3 - p0) / 6.0

    grad0 = jnp.cross(p1 - p2, p3 - p2)
    grad1 = jnp.cross(p2 - p0, p3 - p0)
    grad2 = jnp.cross(p0 - p1, p3 - p1)
    grad3 = jnp.cross(p1 - p0, p2 - p0)

    k = (
        w0 * jnp.dot(grad0, grad0)
        + w1 * jnp.dot(grad1, grad1)
        + w2 * jnp.dot(grad2, grad2)
        + w3 * jnp.dot(grad3, grad3)
    )
    alpha = compliance(stiffness, dt)
    k = k + alpha
    valid = jnp.abs(k) >= EPS

    c = volume - rest_volume
    dlam = jnp.where(valid, -(c + alpha * lam) * safe_inv(k), 0.0)
    corr = dlam * jnp.stack([w0 * grad0, w1 * grad1, w2 * grad2, w3 * grad3])
    return corr, lam + dlam


def init_isometric_bending(p0, p1, p2, p3):
    """Precompute the 4×4 quadratic-bending matrix Q for the stencil
    ``(p0, p1)`` = flap vertices, ``(p2, p3)`` = shared edge.

    Mirrors ``XPBD::init_IsometricBendingConstraint`` (``XPBD.cpp:112-150``);
    the internal vertex order is ``x = [p2, p3, p0, p1]``.
    """
    from .mathutils import cot_theta

    x0, x1, x2, x3 = p2, p3, p0, p1
    e0 = x1 - x0
    e1 = x2 - x0
    e2 = x3 - x0
    e3 = x2 - x1
    e4 = x3 - x1

    c01 = cot_theta(e0, e1)
    c02 = cot_theta(e0, e2)
    c03 = cot_theta(-e0, e3)
    c04 = cot_theta(-e0, e4)

    a0 = 0.5 * jnp.linalg.norm(jnp.cross(e0, e1))
    a1 = 0.5 * jnp.linalg.norm(jnp.cross(e0, e2))

    coef = -3.0 / (2.0 * (a0 + a1))
    k = jnp.stack([c03 + c04, c01 + c02, -c01 - c03, -c02 - c04])
    return coef * jnp.outer(k, k)


def solve_isometric_bending(p0, w0, p1, w1, p2, w2, p3, w3, q_mat, stiffness, dt, lam):
    """XPBD isometric (quadratic) bending: energy ``½ xᵀQx`` over the
    stencil ``x = [p2, p3, p0, p1]``.

    Mirrors ``XPBD::solve_IsometricBendingConstraint`` (``XPBD.cpp:153-213``).
    Returns ``(corr (4,3) in (p0,p1,p2,p3) order, new_lam)``.
    """
    xs = jnp.stack([p2, p3, p0, p1])  # (4,3) internal order
    ws = jnp.stack([w2, w3, w0, w1])

    energy = 0.5 * jnp.einsum("jk,jd,kd->", q_mat, xs, xs)
    grad = q_mat @ xs  # (4,3): gradC[j] = Σ_k Q[j,k] x[k]

    sum_norm = jnp.sum(ws * jnp.sum(grad * grad, axis=-1))
    alpha = compliance(stiffness, dt)
    sum_norm = sum_norm + alpha

    valid = jnp.abs(sum_norm) > EPS
    dlam = jnp.where(valid, -(energy + alpha * lam) * safe_inv(sum_norm), 0.0)

    corr_internal = dlam * ws[:, None] * grad  # internal order [p2,p3,p0,p1]
    corr = jnp.stack(
        [corr_internal[2], corr_internal[3], corr_internal[0], corr_internal[1]]
    )
    return corr, lam + dlam


def _deformation_gradient(p0, p1, p2, p3, inv_rest_mat):
    """``F = D_s · D_m⁻¹`` with edge matrix columns ``pᵢ − p3``
    (``PositionBasedDynamics.cpp:958-980``)."""
    ds = jnp.stack([p0 - p3, p1 - p3, p2 - p3], axis=-1)  # (3,3) columns
    # unrolled product: a vmapped `@` lowers to batched tiny MXU matmuls
    return mm3(ds, inv_rest_mat)


def green_strain_energy(p0, p1, p2, p3, inv_rest_mat, rest_volume, mu, lam_coef):
    """St. Venant–Kirchhoff energy + first Piola stress.

    ``ε = ½(FᵀF − I)``, ``P = F(2με + λ tr(ε) I)``,
    ``Ψ = μ‖ε‖² + ½λ tr(ε)²``, ``E = V₀ Ψ``
    (``PositionBasedDynamics::computeGreenStrainAndPiolaStress``,
    ``PositionBasedDynamics.cpp:958-1008``).
    Returns ``(energy, sigma, F)``.
    """
    f = _deformation_gradient(p0, p1, p2, p3, inv_rest_mat)
    eps_m = 0.5 * (mm3_tn(f, f) - jnp.eye(3, dtype=f.dtype))
    trace = jnp.trace(eps_m)
    sigma = mm3(f, 2.0 * mu * eps_m
                + lam_coef * trace * jnp.eye(3, dtype=f.dtype))
    psi = mu * jnp.sum(eps_m * eps_m) + 0.5 * lam_coef * trace * trace
    return rest_volume * psi, sigma, f


def green_strain_energy_inversion(p0, p1, p2, p3, inv_rest_mat, rest_volume, mu, lam_coef):
    """Inversion-safe variant: SVD with reflection handling, singular values
    clamped at 0.577 (``computeGreenStrainAndPiolaStressInversion``,
    ``PositionBasedDynamics.cpp:1034-1106``).
    Returns ``(energy, sigma, F)``.
    """
    f = _deformation_gradient(p0, p1, p2, p3, inv_rest_mat)
    u, hat_f, vt = svd_inversion_handling(f)
    hat_f = jnp.maximum(hat_f, 0.577)

    eps_hat = 0.5 * (hat_f * hat_f - 1.0)
    trace = jnp.sum(eps_hat)
    sigma_vec = hat_f * (2.0 * mu * eps_hat + lam_coef * trace)

    # u @ diag(d) is just column scaling; keep products unrolled
    sigma = mm3(u * sigma_vec[None, :], vt)
    eps_m = mm3(u * eps_hat[None, :], vt)
    psi = mu * jnp.sum(eps_m * eps_m) + 0.5 * lam_coef * trace * trace
    return rest_volume * psi, sigma, f


def grad_c_green(rest_volume, inv_rest_mat, sigma):
    """Energy gradient w.r.t. the four tet vertices from the Piola stress:
    ``H = V₀ σ D_m⁻ᵀ``; columns of H are ∇₀..∇₂, ``∇₃ = −Σ∇ᵢ``
    (``PositionBasedDynamics::computeGradCGreen``,
    ``PositionBasedDynamics.cpp:1011-1031``). Returns ``(4, 3)``.
    """
    h = mm3_nt(sigma, inv_rest_mat) * rest_volume
    g012 = h.T  # row j = H[:, j] = gradient of vertex j
    g3 = -jnp.sum(g012, axis=0)
    return jnp.concatenate([g012, g3[None]], axis=0)


def solve_fem_tetra(
    p0, w0, p1, w1, p2, w2, p3, w3,
    rest_volume, inv_rest_mat, youngs_modulus, poisson_ratio,
    dt, lam, handle_inversion: bool = True,
):
    """XPBD FEM tetra constraint ``C = sqrt(2 U′)`` with ``U′ = U/E`` so the
    compliance is ``α = 1/(E dt²)``.

    Mirrors ``XPBD::solve_FEMTetraConstraint`` (``XPBD.cpp:217-294``)
    including the factor-C bookkeeping: ``∇C = ∇U′/C`` so
    ``K = Σ w‖∇U′‖² + C²α`` and ``Δλ = −C (C + α λ)/K``; corrections use
    ``∇U′`` scaled by ``Δλ/C·C = Δλ`` folded as in the reference.
    Returns ``(corr (4,3), new_lam)``.
    """
    mu = 0.5 / (1.0 + poisson_ratio)
    lame = poisson_ratio / ((1.0 + poisson_ratio) * (1.0 - 2.0 * poisson_ratio))

    volume = jnp.dot(jnp.cross(p1 - p0, p2 - p0), p3 - p0) / 6.0

    if handle_inversion:
        u_reg, sig_reg, _ = green_strain_energy(
            p0, p1, p2, p3, inv_rest_mat, rest_volume, mu, lame)
        u_inv, sig_inv, _ = green_strain_energy_inversion(
            p0, p1, p2, p3, inv_rest_mat, rest_volume, mu, lame)
        inverted = volume <= 0.0
        u_prime = jnp.where(inverted, u_inv, u_reg)
        sigma = jnp.where(inverted, sig_inv, sig_reg)
    else:
        u_prime, sigma, _ = green_strain_energy(
            p0, p1, p2, p3, inv_rest_mat, rest_volume, mu, lame)

    grad_u = grad_c_green(rest_volume, inv_rest_mat, sigma)  # (4,3)

    c = jnp.sqrt(jnp.maximum(2.0 * u_prime, 0.0))

    ws = jnp.stack([w0, w1, w2, w3])
    sum_norm = jnp.sum(ws * jnp.sum(grad_u * grad_u, axis=-1))

    alpha = safe_inv(youngs_modulus * dt * dt)
    sum_norm = sum_norm + c * c * alpha

    valid = (sum_norm >= EPS) & (youngs_modulus > 0.0)
    dlam = jnp.where(valid, -c * (c + alpha * lam) * safe_inv(sum_norm), 0.0)

    corr = dlam * ws[:, None] * grad_u
    return corr, lam + dlam

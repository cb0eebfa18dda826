"""Ghost-point elastic rod kernels (Umetani et al. 2014).

Port targets: ``PositionBasedElasticRods::solve_PerpendiculaBisectorConstraint``
(``PositionBasedDynamics/PositionBasedElasticRods.cpp:82``),
``solve_GhostPointEdgeDistanceConstraint`` (``:109``),
``solve_DarbouxVectorConstraint`` (``:138``) with
``computeMaterialFrame``/``computeDarbouxVector`` (``:225-257``).

TPU-first divergence: the reference hand-derives the 5-point Darboux
gradient (``computeMaterialFrameDerivative`` + ``computeDarbouxGradient``,
``:259-470``, ~200 lines of chain rule). Here the same exact Jacobian
comes from ``jax.jacfwd`` of the 10-line Darboux function — autodiff of
the constraint replaces the hand derivation (validated against finite
differences in ``tests/test_ghost_rods.py``).

All functions are single-constraint; batch with ``vmap``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array
EPS = 1e-6


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)


def material_frame(p0: Array, p1: Array, p2: Array) -> Array:
    """Edge material frame: columns (d1, d2, d3) with d3 along the edge,
    d2 ⟂ (edge, ghost) plane (``computeMaterialFrame``,
    ``PositionBasedElasticRods.cpp:225-239``)."""
    d3 = _normalize(p1 - p0)
    d2 = _normalize(jnp.cross(d3, p2 - p0))
    d1 = jnp.cross(d2, d3)
    return jnp.stack([d1, d2, d3], axis=1)


def darboux_vector(da: Array, db: Array, mid_edge_length) -> Array:
    """Discrete Darboux vector of two material frames
    (``computeDarbouxVector``, ``:242-257``): ``Ω_i ∝ d^a_j·d^b_k −
    d^a_k·d^b_j`` over the permutation (0,2,1),(1,0,2),(2,1,0), scaled by
    ``2 / (L (1 + Σ d^a_n·d^b_n))``."""
    factor = 1.0 + jnp.sum(da * db)
    factor = 2.0 / (mid_edge_length * factor)
    om = jnp.stack([
        da[:, 2] @ db[:, 1] - da[:, 1] @ db[:, 2],
        da[:, 0] @ db[:, 2] - da[:, 2] @ db[:, 0],
        da[:, 1] @ db[:, 0] - da[:, 0] @ db[:, 1],
    ])
    return factor * om


def element_darboux(p0, p1, p2, g0, g1, mid_edge_length) -> Array:
    """Darboux vector of one rod element (points p0-p1-p2, ghosts g0, g1)."""
    da = material_frame(p0, p1, g0)
    db = material_frame(p1, p2, g1)
    return darboux_vector(da, db, mid_edge_length)


def solve_perpendicular_bisector(p0, w0, p1, w1, p2, w2, stiffness):
    """Keep the ghost point on the edge's perpendicular bisector:
    ``C = (p2 − pm)·(p1 − p0)`` (``solve_PerpendiculaBisectorConstraint``,
    ``PositionBasedElasticRods.cpp:82-107``). Returns (corr0, corr1,
    corr2)."""
    pm = 0.5 * (p0 + p1)
    p0p2 = p0 - p2
    p2p1 = p2 - p1
    p1p0 = p1 - p0
    w_sum = (w0 * jnp.dot(p0p2, p0p2) + w1 * jnp.dot(p2p1, p2p1)
             + w2 * jnp.dot(p1p0, p1p0))
    c = jnp.dot(p2 - pm, p1p0)
    lam = jnp.where(w_sum > EPS, stiffness * c / jnp.maximum(w_sum, EPS),
                    0.0)
    return -w0 * lam * p0p2, -w1 * lam * p2p1, -w2 * lam * p1p0


def solve_ghost_edge_distance(p0, w0, p1, w1, p2, w2, stiffness, rest):
    """Keep the ghost at its rest distance from the edge midpoint
    (``solve_GhostPointEdgeDistanceConstraint``, ``:109-136``)."""
    pm = 0.5 * (p0 + p1)
    d = p2 - pm
    mag = jnp.linalg.norm(d)
    n = d / jnp.maximum(mag, 1e-12)
    w_sum = 0.25 * w0 + 0.25 * w1 + w2
    lam = jnp.where(w_sum > EPS,
                    stiffness * (mag - rest) / jnp.maximum(w_sum, EPS), 0.0)
    return 0.5 * w0 * lam * n, 0.5 * w1 * lam * n, -w2 * lam * n


def solve_darboux_vector(p0, w0, p1, w1, p2, w2, g0, wg0, g1, wg1,
                         bending_twisting_ks, mid_edge_length,
                         rest_darboux):
    """Bend/twist projection of one rod element
    (``solve_DarbouxVectorConstraint``, ``:138-225``): 3-vector constraint
    ``C = ks ∘ (Ω − Ω̄)`` solved with the 3×3 system ``Σ w_i G_i G_iᵀ``
    where ``G_i = ∂Ω/∂p_i`` comes from ``jax.jacfwd`` (replacing
    ``computeDarbouxGradient``). Returns the 5 position corrections."""
    grads = jax.jacfwd(element_darboux, argnums=(0, 1, 2, 3, 4))(
        p0, p1, p2, g0, g1, mid_edge_length)        # 5 × (3, 3)
    omega = element_darboux(p0, p1, p2, g0, g1, mid_edge_length)
    c = bending_twisting_ks * (omega - rest_darboux)
    ws = (w0, w1, w2, wg0, wg1)
    factor = sum(w * (g @ g.T) for w, g in zip(ws, grads))
    factor = factor + 1e-9 * jnp.eye(3, dtype=factor.dtype)
    y = jnp.linalg.solve(factor, c)
    return tuple(-w * (g.T @ y) for w, g in zip(ws, grads))

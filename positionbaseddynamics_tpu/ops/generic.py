"""Generic user-defined constraints — autodiff replaces finite
differences.

Reference: ``PositionBasedGenericConstraints.h:31-121`` (particle
variant) and ``:218-280`` (rigid-body variant) approximate missing
constraint gradients with central finite differences
(``approximateGradient``, ``:90,197``). The TPU-first version uses
``jax.jacfwd`` of the user's constraint function instead — exact
Jacobians, no epsilon tuning, and the whole projection stays inside one
jitted graph.

A constraint function takes the stacked particle positions ``(k, 3)``
(or ``(x (k, 3), q (k, 4))`` for rigid bodies) and returns a
``(dim,)`` constraint value; the projection solves the standard PBD
system ``Σᵢ wᵢ Jᵢ Jᵢᵀ y = C`` and applies ``Δxᵢ = −wᵢ Jᵢᵀ y``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import quaternion as quat

Array = jax.Array


def solve_generic_particle_constraint(fn, pts: Array, w: Array,
                                      stiffness=1.0) -> Array:
    """One particle constraint: ``pts (k, 3)``, ``w (k,)`` inverse
    masses. Returns corrections ``(k, 3)``
    (``solve_GenericConstraint<numParticles, dim>``)."""
    c = jnp.atleast_1d(fn(pts))
    jac = jax.jacfwd(fn)(pts)                     # (d, k, 3)
    jac = jac.reshape(c.shape[0], pts.shape[0], 3)
    factor = jnp.einsum("dki,k,eki->de", jac, w, jac)
    factor = factor + 1e-9 * jnp.eye(c.shape[0], dtype=factor.dtype)
    y = jnp.linalg.solve(factor, c)
    return -stiffness * w[:, None] * jnp.einsum("dki,d->ki", jac, y)


def solve_generic_rigid_constraint(fn, x: Array, q: Array, w: Array,
                                   inv_iw: Array, stiffness=1.0):
    """One rigid-body constraint: ``fn(x (k, 3), q (k, 4)) -> (d,)``.
    Rotation Jacobians are taken w.r.t. a world-frame angular
    displacement ``θ`` via ``δq = ½ (0, θ) ⊗ q`` (the quaternion G-matrix
    parametrization of the reference's rigid variant,
    ``PositionBasedGenericConstraints.h:218-280``). Returns
    ``(corr_x (k, 3), ot (k, 3))`` with ``ot`` the angular term for
    ``rotation_correction``."""
    k = x.shape[0]
    zeros = jnp.zeros((k, 3), x.dtype)

    def with_theta(xx, theta):
        dq = 0.5 * jax.vmap(quat.multiply)(
            jax.vmap(quat.from_vec)(theta), q)
        return jnp.atleast_1d(fn(xx, q + dq))

    c = jnp.atleast_1d(fn(x, q))
    jx = jax.jacfwd(with_theta, argnums=0)(x, zeros).reshape(
        c.shape[0], k, 3)
    jt = jax.jacfwd(with_theta, argnums=1)(x, zeros).reshape(
        c.shape[0], k, 3)
    factor = (jnp.einsum("dki,k,eki->de", jx, w, jx)
              + jnp.einsum("dki,kij,ekj->de", jt, inv_iw, jt))
    factor = factor + 1e-9 * jnp.eye(c.shape[0], dtype=factor.dtype)
    y = jnp.linalg.solve(factor, c)
    corr_x = -stiffness * w[:, None] * jnp.einsum("dki,d->ki", jx, y)
    ot = -stiffness * jnp.einsum("kij,dkj,d->ki", inv_iw, jt, y)
    return corr_x, ot

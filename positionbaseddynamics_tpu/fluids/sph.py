"""SPH cubic spline kernel — vectorized form of the reference's
``CubicKernel`` (``PositionBasedDynamics/SPHKernels.h:13-97``):

``W(q) = k·(6q³ − 6q² + 1)`` for ``q ≤ ½``, ``k·2(1−q)³`` for ``½ < q ≤ 1``
with ``k = 8/(π h³)``; the gradient uses ``l = 48/(π h³)``. Support
radius ``h`` is a static scene parameter rather than a global (the
reference sets it once via ``CubicKernel::setRadius``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array
_PI = 3.14159265358979323846


def w(rvec: Array, h) -> Array:
    """Kernel value for displacement vectors ``(..., 3)``."""
    k = 8.0 / (_PI * h**3)
    rl = jnp.linalg.norm(rvec, axis=-1)
    q = rl / h
    q = jnp.minimum(q, 1.0)  # NO_DISTANCE_TEST in reference; we clamp
    near = k * (6.0 * q**3 - 6.0 * q**2 + 1.0)
    far = k * 2.0 * (1.0 - q) ** 3
    return jnp.where(q <= 0.5, near, far)


def w_zero(h) -> Array:
    """``W(0)`` (``CubicKernel::W_zero``)."""
    return jnp.asarray(8.0 / (_PI * h**3), jnp.float32)


def grad_w(rvec: Array, h) -> Array:
    """Kernel gradient ``∇W(r)`` for displacement vectors ``(..., 3)``."""
    l = 48.0 / (_PI * h**3)
    rl = jnp.linalg.norm(rvec, axis=-1)
    q = jnp.minimum(rl / h, 1.0)
    gradq = rvec / jnp.maximum(rl * h, 1e-30)[..., None]
    near = (l * q * (3.0 * q - 2.0))[..., None] * gradq
    factor = 1.0 - q
    far = (l * (-factor * factor))[..., None] * gradq
    g = jnp.where((q <= 0.5)[..., None], near, far)
    return jnp.where((rl > 1.0e-6)[..., None], g, 0.0)


def w_r(rl: Array, h) -> Array:
    """Kernel value from distances ``rl`` — per-component-gather form
    (gathering ``(..., 3)`` displacement vectors makes XLA flatten to a
    ``(N·K, 3)`` layout padded to 128 lanes, a 42× memory blowup at
    100k-particle scale)."""
    k = 8.0 / (_PI * h**3)
    q = jnp.minimum(rl / h, 1.0)
    near = k * (6.0 * q**3 - 6.0 * q**2 + 1.0)
    far = k * 2.0 * (1.0 - q) ** 3
    return jnp.where(q <= 0.5, near, far)


def grad_w_coef(rl: Array, h) -> Array:
    """Scalar ``s(r)`` with ``∇W(rvec) = s(‖rvec‖)·rvec`` (see
    :func:`grad_w`); zero at the origin."""
    l = 48.0 / (_PI * h**3)
    q = jnp.minimum(rl / h, 1.0)
    coefq = jnp.where(q <= 0.5, l * q * (3.0 * q - 2.0),
                      -l * (1.0 - q) ** 2)
    s = coefq / jnp.maximum(rl * h, 1e-30)
    return jnp.where(rl > 1.0e-6, s, 0.0)

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

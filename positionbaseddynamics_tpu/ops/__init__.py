"""Stateless constraint/integration kernels (layer 1 of the framework).

TPU-native re-derivations of the math in ``/root/reference/PositionBasedDynamics/``:
single-constraint functions designed for ``jax.vmap`` over constraint batches.
"""

from . import integration, mathutils, pbd, quaternion, rods, xpbd

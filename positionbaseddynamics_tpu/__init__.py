"""positionbaseddynamics_tpu — a TPU-native (JAX/XLA/Pallas) XPBD framework.

Brand-new implementation of the capabilities of
InteractiveComputerGraphics/PositionBasedDynamics (cloth, FEM solids,
Cosserat rods, rigid bodies with joints/motors, position-based fluids,
SDF collision detection), re-designed for TPU hardware:

* stateless constraint kernels (``ops/``) vectorized over constraint
  batches instead of per-object virtual dispatch,
* a functional, jit-compiled time stepper (``solver/``) replacing the
  stateful ``TimeStepController``; graph-colored Gauss-Seidel is kept as
  an exact-parity mode next to the TPU-friendly batched Jacobi mode,
* scene builders and loaders (``models/``, ``utils/``),
* batched rollouts + device-mesh sharding (``parallel/``),
* SDF collision (``collision/``), PBF fluids (``fluids/``) and a
  sampling-MPC layer (``mpc/``) on top of the rollout harness.
"""

from . import collision, fluids, models, mpc, ops, parallel, scene, solver, utils

__version__ = "0.2.0"

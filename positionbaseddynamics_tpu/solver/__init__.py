"""Simulation engine (layer 2): state pytrees, constraint batches, stepper."""

from .state import ParticleState, OrientationState, RigidState, SimState
from .constraints import (
    ConstraintSet,
    DistanceBatch,
    IsometricBendingBatch,
    DihedralBatch,
    VolumeBatch,
    FEMTetraBatch,
    StretchShearBatch,
    BendTwistBatch,
)
from .step import StepConfig, step, rollout, make_step_fn

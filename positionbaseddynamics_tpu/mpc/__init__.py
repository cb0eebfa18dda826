"""Sampling-based MPC over batched XPBD rollouts — the north-star layer
(BASELINE.json: "XPBD trajectory-rollout + sampling-MPC engine";
SURVEY.md §7 step 10). The reference library has no control subsystem;
this is TPU-native by construction: ``vmap`` over K sampled control
sequences, ``lax.scan`` rollouts, DP sharding of the sample axis over the
device mesh (``parallel/sharding.py``)."""
from .controls import PinVelocityControl, RigidWrenchControl
from .costs import (as_running, combine, control_effort, particle_target,
                    rigid_sdf_obstacle, rigid_target, sdf_obstacle,
                    velocity_penalty)
from .planners import (CEMConfig, MPPIConfig, cem_update,
                       make_mpc_controller, make_sequence_cost, mppi_update,
                       plan_cem, plan_mppi)

__all__ = [
    "PinVelocityControl", "RigidWrenchControl",
    "as_running", "combine", "control_effort", "particle_target",
    "rigid_sdf_obstacle", "rigid_target", "sdf_obstacle", "velocity_penalty",
    "CEMConfig", "MPPIConfig", "cem_update", "make_mpc_controller",
    "make_sequence_cost", "mppi_update", "plan_cem", "plan_mppi",
]

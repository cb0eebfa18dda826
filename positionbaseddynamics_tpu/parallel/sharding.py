"""Rollout-batch sharding over a TPU device mesh.

The reference's only parallelism is single-process OpenMP
(``TimeStepController.cpp:95``, ``SimulationModel.cpp:1033``); the
TPU-native replacement (SURVEY.md §2.6) is:

* **DP over rollouts** (primary): the batch axis of a ``(B, N, 3)`` state
  pytree is sharded across chips with ``jax.sharding``; the per-scenario
  step function is ``vmap``-ed, so XLA runs B/n_devices independent
  rollouts per chip with zero collectives in the hot loop (ICI traffic
  only at reduction/readout time).
* intra-scene particle/constraint sharding (the "TP" analogue) for
  >100k-particle scenes — lands with the Pallas projection kernel.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver.constraints import ConstraintSet
from ..solver.state import SimState
from ..solver.step import StepConfig, step


ROLLOUT_AXIS = "rollout"


def make_mesh(devices: Optional[Sequence] = None,
              axis: str = ROLLOUT_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices; the single axis shards the
    rollout batch."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(state, mesh: Mesh, axis: str = ROLLOUT_AXIS):
    """Place a batched ``(B, ...)`` state pytree with the leading axis
    sharded across the mesh (replicating nothing — the state is the only
    per-rollout data; constraint topology stays replicated by closure)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), state)


def make_sharded_step_fn(cset: ConstraintSet, cfg: StepConfig, mesh: Mesh,
                         axis: str = ROLLOUT_AXIS, pipeline=None):
    """Jitted batched step ``(B, ...) state → state`` with the batch axis
    sharded over ``mesh``. Constraint arrays are closed over (replicated);
    XLA partitions the vmapped program with no hot-loop collectives.
    ``pipeline`` (optional CollisionPipeline) runs contact detection per
    rollout — the batched broad phase (collision/batched.py) is
    compaction-based, so it vmaps with static shapes."""
    sharding = NamedSharding(mesh, P(axis))
    vstep = jax.vmap(lambda s: step(s, cset, cfg, pipeline))

    @jax.jit
    def fn(state):
        state = jax.lax.with_sharding_constraint(state, sharding)
        return vstep(state)

    return fn


def replicate_scene(state: SimState, batch: int):
    """Broadcast a single-scene state to a ``(B, ...)`` rollout batch."""
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), state)

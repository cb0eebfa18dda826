"""Composable cost terms for sampling-based MPC.

The reference has no control layer — this subsystem is the project's
north star (BASELINE.json: "XPBD trajectory-rollout + sampling-MPC
engine"). Costs are plain functions evaluated *inside* the rollout scan
(running) or on the final state (terminal), so no ``(T, N, 3)``
trajectory is ever materialized in HBM — only a scalar accumulator rides
the scan carry. Every term returns a ``(state, u) -> scalar`` (running)
or ``state -> scalar`` (terminal) closure; combine with :func:`combine`.

Obstacle penalties reuse the collision layer's SDF shapes
(``collision/sdf.py``; shapes mirror
``Simulation/DistanceFieldCollisionDetection.h:32-104``).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp

from ..collision.sdf import SDFShape


def combine(*terms):
    """Sum of cost closures with identical signatures."""
    terms = [t for t in terms if t is not None]

    def total(*args):
        c = jnp.float32(0.0)
        for t in terms:
            c = c + t(*args)
        return c

    return total


# ---------------------------------------------------------------------------
# Terminal / running target costs
# ---------------------------------------------------------------------------


def particle_target(indices, target, weight: float = 1.0) -> Callable:
    """Mean squared distance of the selected particles to ``target``
    ``(3,)`` (or ``(len(indices), 3)``). Terminal signature ``state ->
    scalar``; wrap with :func:`as_running` to apply every step."""
    idx = jnp.asarray(indices, jnp.int32)
    tgt = jnp.asarray(target, jnp.float32)

    def cost(state):
        d = state.particles.x[idx] - tgt
        return weight * jnp.mean(jnp.sum(d * d, axis=-1))

    return cost


def rigid_target(body_index: int, target, weight: float = 1.0) -> Callable:
    """Squared distance of one rigid body's COM to ``target`` (3,)."""
    tgt = jnp.asarray(target, jnp.float32)

    def cost(state):
        d = state.rigid.x[body_index] - tgt
        return weight * jnp.sum(d * d)

    return cost


def velocity_penalty(weight: float = 1.0) -> Callable:
    """Mean squared particle velocity — damps wild plans (terminal)."""

    def cost(state):
        v = state.particles.v
        return weight * jnp.mean(jnp.sum(v * v, axis=-1))

    return cost


def as_running(terminal_cost: Callable) -> Callable:
    """Lift a ``state -> scalar`` terminal term to the running signature
    ``(state, u) -> scalar``."""

    def cost(state, u):
        return terminal_cost(state)

    return cost


# ---------------------------------------------------------------------------
# Obstacle penalties
# ---------------------------------------------------------------------------


def sdf_obstacle(shapes: Sequence[SDFShape], weight: float = 1.0,
                 margin: float = 0.0,
                 translations: Optional[Sequence] = None,
                 subset=None) -> Callable:
    """Quadratic penetration penalty ``Σ max(0, margin − φ(x))²`` over
    (a subset of) particles against static world-frame SDF obstacles.
    ``translations`` optionally places each shape (shapes evaluate in
    their local frame, ``collision/sdf.py``). Running signature."""
    if translations is None:
        translations = [jnp.zeros((3,), jnp.float32)] * len(shapes)
    translations = [jnp.asarray(t, jnp.float32) for t in translations]
    sub = None if subset is None else jnp.asarray(subset, jnp.int32)

    def cost(state, u):
        x = state.particles.x if sub is None else state.particles.x[sub]
        c = jnp.float32(0.0)
        for shape, t in zip(shapes, translations):
            pen = jnp.maximum(margin - shape.distance(x - t), 0.0)
            c = c + jnp.sum(pen * pen)
        return weight * c

    return cost


def rigid_sdf_obstacle(shapes: Sequence[SDFShape], body_index: int,
                       radius: float, weight: float = 1.0,
                       translations: Optional[Sequence] = None) -> Callable:
    """Penetration penalty of one rigid body's bounding sphere against
    static obstacles (cheap broad proxy for planning). Running."""
    if translations is None:
        translations = [jnp.zeros((3,), jnp.float32)] * len(shapes)
    translations = [jnp.asarray(t, jnp.float32) for t in translations]

    def cost(state, u):
        p = state.rigid.x[body_index]
        c = jnp.float32(0.0)
        for shape, t in zip(shapes, translations):
            pen = jnp.maximum(radius - shape.distance(p - t), 0.0)
            c = c + pen * pen
        return weight * c

    return cost


def control_effort(weight: float = 1.0) -> Callable:
    """``w · |u|²`` per step (running)."""

    def cost(state, u):
        return weight * jnp.sum(u * u)

    return cost

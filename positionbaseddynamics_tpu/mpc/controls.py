"""Control models: how a per-step control vector enters the simulation.

A control model is a small frozen object with ``u_dim`` and
``apply(state, u, dt) -> state``; planners treat controls as flat
``(T, u_dim)`` sequences. Two canonical actuators:

* :class:`PinVelocityControl` — kinematic velocity of pinned particles
  (``inv_mass == 0`` items are skipped by the integrator,
  ``ops/integration.py``, so their positions advance only here). This is
  the "drag the cloth corner" actuator.
* :class:`RigidWrenchControl` — external force + torque on rigid bodies,
  consumed by the substep integration through ``RigidState.ext_force`` /
  ``ext_torque`` (``solver/step.py`` accel term).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class PinVelocityControl:
    """u = stacked (3,) velocities of ``indices`` (pinned particles);
    applied as a kinematic position advance ``x += u dt``."""

    indices: tuple
    max_speed: float = jnp.inf

    @property
    def u_dim(self) -> int:
        return 3 * len(self.indices)

    def apply(self, state, u, dt):
        vel = u.reshape(len(self.indices), 3)
        if np.isfinite(self.max_speed):
            speed = jnp.linalg.norm(vel, axis=-1, keepdims=True)
            vel = vel * jnp.minimum(1.0, self.max_speed
                                    / jnp.maximum(speed, 1e-9))
        idx = jnp.asarray(self.indices, jnp.int32)
        p = state.particles
        x = p.x.at[idx].add(vel * dt)
        return dataclasses.replace(
            state, particles=dataclasses.replace(p, x=x))


@dataclass(frozen=True)
class RigidWrenchControl:
    """u = stacked (6,) [force, torque] per controlled rigid body."""

    body_indices: tuple
    max_force: float = jnp.inf

    @property
    def u_dim(self) -> int:
        return 6 * len(self.body_indices)

    def apply(self, state, u, dt):
        w = u.reshape(len(self.body_indices), 6)
        if np.isfinite(self.max_force):
            w = jnp.clip(w, -self.max_force, self.max_force)
        idx = jnp.asarray(self.body_indices, jnp.int32)
        r = state.rigid
        f = jnp.zeros_like(r.ext_force).at[idx].set(w[:, :3])
        t = jnp.zeros_like(r.ext_torque).at[idx].set(w[:, 3:])
        return dataclasses.replace(
            state, rigid=dataclasses.replace(r, ext_force=f, ext_torque=t))

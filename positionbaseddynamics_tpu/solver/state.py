"""Simulation state pytrees (structure-of-arrays, batched & shardable).

TPU-native replacement for the reference's stateful containers
(``Simulation/ParticleData.h:86-101`` particle SoA,
``Simulation/ParticleData.h:316-331`` orientation SoA,
``Simulation/RigidBody.h:16-77`` rigid-body state): one flat, functional
pytree that ``jax.vmap``/``jax.jit``/``shard_map`` and checkpointing
(orbax/npz) consume directly. ``inv_mass == 0`` marks a static (pinned)
item, matching ``ParticleData.h:90``.

All leaves carry an arbitrary leading batch shape: a single scene is
``(N, 3)``; a rollout batch is ``(B, N, 3)``.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import quaternion as quat

Array = jax.Array


def _register(cls):
    data = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=[])


@_register
@dataclass(frozen=True)
class ParticleState:
    """Particle field mirroring ``ParticleData`` (x, v, oldX, lastX, invMass;
    ``Simulation/ParticleData.h:86-101``). ``x0`` is kept for ``reset()``
    parity (``SimulationModel.cpp:270-304``)."""

    x: Array        # (..., N, 3) positions
    v: Array        # (..., N, 3) velocities
    old_x: Array    # (..., N, 3) position before current substep integration
    last_x: Array   # (..., N, 3) position before previous substep
    x0: Array       # (..., N, 3) initial positions (reset target)
    inv_mass: Array  # (..., N)

    @staticmethod
    def create(x, masses) -> "ParticleState":
        x = jnp.asarray(x, jnp.float32)
        masses = jnp.asarray(masses, jnp.float32)
        inv_mass = jnp.where(masses != 0.0, 1.0 / jnp.where(masses != 0.0, masses, 1.0), 0.0)
        # distinct buffers for every field (x repeated into old/last/x0
        # would alias one device buffer and break jit buffer DONATION
        # with "attempt to donate the same buffer twice")
        return ParticleState(x=x, v=jnp.zeros_like(x), old_x=x.copy(),
                             last_x=x.copy(), x0=x.copy(),
                             inv_mass=inv_mass)

    @property
    def n(self) -> int:
        return self.x.shape[-2]


@_register
@dataclass(frozen=True)
class OrientationState:
    """Quaternion field for Cosserat rods mirroring ``OrientationData``
    (``Simulation/ParticleData.h:316-331``). Layout ``[w, x, y, z]``."""

    q: Array        # (..., M, 4)
    omega: Array    # (..., M, 3) angular velocities
    old_q: Array    # (..., M, 4)
    last_q: Array   # (..., M, 4)
    q0: Array       # (..., M, 4)
    inv_mass: Array  # (..., M)

    @staticmethod
    def create(q, masses) -> "OrientationState":
        q = jnp.asarray(q, jnp.float32)
        masses = jnp.asarray(masses, jnp.float32)
        inv_mass = jnp.where(masses != 0.0, 1.0 / jnp.where(masses != 0.0, masses, 1.0), 0.0)
        omega = jnp.zeros(q.shape[:-1] + (3,), q.dtype)
        return OrientationState(q=q, omega=omega, old_q=q.copy(),
                                last_q=q.copy(), q0=q.copy(),
                                inv_mass=inv_mass)

    @property
    def n(self) -> int:
        return self.q.shape[-2]


@_register
@dataclass(frozen=True)
class RigidState:
    """Rigid-body state mirroring ``Simulation/RigidBody.h:16-77``:
    positions/rotations with history, velocities, inverse mass, and the
    *body-frame diagonal* inertia (world-space inertia is derived on the fly
    from the current rotation, cf. ``RigidBody::updateInverseInertiaW``)."""

    x: Array         # (..., R, 3)
    v: Array         # (..., R, 3)
    q: Array         # (..., R, 4) [w,x,y,z]
    omega: Array     # (..., R, 3)
    old_x: Array
    last_x: Array
    old_q: Array
    last_q: Array
    x0: Array
    q0: Array
    inv_mass: Array      # (..., R)
    inertia0: Array      # (..., R, 3) body-frame diagonal inertia tensor
    ext_force: Array     # (..., R, 3) external force (cleared semantics: gravity applied via a)
    ext_torque: Array    # (..., R, 3)

    @staticmethod
    def create(x, q, masses, inertia_diag) -> "RigidState":
        x = jnp.asarray(x, jnp.float32)
        q = jnp.asarray(q, jnp.float32)
        masses = jnp.asarray(masses, jnp.float32)
        inertia0 = jnp.asarray(inertia_diag, jnp.float32)
        inv_mass = jnp.where(masses != 0.0, 1.0 / jnp.where(masses != 0.0, masses, 1.0), 0.0)
        return RigidState(
            x=x, v=jnp.zeros_like(x), q=q, omega=jnp.zeros_like(x),
            old_x=x.copy(), last_x=x.copy(), old_q=q.copy(),
            last_q=q.copy(), x0=x.copy(), q0=q.copy(),
            inv_mass=inv_mass, inertia0=inertia0,
            ext_force=jnp.zeros_like(x), ext_torque=jnp.zeros_like(x),
        )

    @property
    def n(self) -> int:
        return self.x.shape[-2]

    def inertia_world(self):
        """World-space inertia and inverse inertia ``(..., R, 3, 3)``:
        ``I_w = R diag(I₀) Rᵀ`` (``RigidBody.h`` rotationUpdated path)."""
        r = quat.to_matrix(self.q)
        iw = jnp.einsum("...ij,...j,...kj->...ik", r, self.inertia0, r)
        inv_diag = jnp.where(self.inertia0 > 0.0, 1.0 / jnp.maximum(self.inertia0, 1e-30), 0.0)
        inv_iw = jnp.einsum("...ij,...j,...kj->...ik", r, inv_diag, r)
        return iw, inv_iw


@_register
@dataclass(frozen=True)
class SimState:
    """Full simulation state: one flat pytree (designed for checkpointing
    from day 1, cf. SURVEY §5 checkpoint/resume)."""

    particles: ParticleState
    orientations: Optional[OrientationState]
    rigid: Optional[RigidState]
    time: Array  # scalar
    # max-accumulated capacity-overflow counter (broad-phase active-pair
    # drops + solid-contact compaction drops, cf. FluidState.overflow);
    # 0 means every fixed-capacity buffer sufficed. None on states built
    # before the counter existed (the stepper then leaves it None so
    # pytree structure stays scan-stable).
    overflow: Optional[Array] = None

    @staticmethod
    def create(particles: ParticleState,
               orientations: Optional[OrientationState] = None,
               rigid: Optional[RigidState] = None) -> "SimState":
        return SimState(
            particles=particles, orientations=orientations, rigid=rigid,
            time=jnp.zeros((), jnp.float32),
            overflow=jnp.zeros((), jnp.float32),
        )

    def reset(self) -> "SimState":
        """Restore initial positions/rotations and zero velocities,
        mirroring ``SimulationModel::reset`` (``SimulationModel.cpp:270-304``)."""
        p = self.particles
        p = ParticleState(
            x=p.x0, v=jnp.zeros_like(p.v), old_x=p.x0, last_x=p.x0,
            x0=p.x0, inv_mass=p.inv_mass,
        )
        o = self.orientations
        if o is not None:
            o = OrientationState(
                q=o.q0, omega=jnp.zeros_like(o.omega), old_q=o.q0,
                last_q=o.q0, q0=o.q0, inv_mass=o.inv_mass,
            )
        r = self.rigid
        if r is not None:
            z = jnp.zeros_like(r.v)
            r = dataclasses.replace(
                r, x=r.x0, q=r.q0, v=z, omega=z, old_x=r.x0, last_x=r.x0,
                old_q=r.q0, last_q=r.q0, ext_force=z, ext_torque=z,
            )
        return SimState(particles=p, orientations=o, rigid=r,
                        time=jnp.zeros_like(self.time),
                        overflow=(None if self.overflow is None
                                  else jnp.zeros_like(self.overflow)))

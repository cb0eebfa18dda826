"""SDF collision detection + velocity-level contacts (TPU-native analogue
of ``Simulation/DistanceFieldCollisionDetection`` /
``CubicSDFCollisionDetection``; see module docstrings)."""

from .sdf import SDFShape, grid_trilinear, grid_cubic_lagrange
from .bake import bake_mesh_sdf, bake_mesh_sdf_cached
from .detection import (
    CollisionPipeline,
    ParticleGroupCollider,
    ParticleRigidContacts,
    RigidCollider,
    RigidContacts,
)
from .contacts import solve_particle_rigid_contacts, solve_rigid_contacts
from . import sampling

__all__ = [
    "SDFShape", "grid_trilinear", "grid_cubic_lagrange",
    "bake_mesh_sdf", "bake_mesh_sdf_cached",
    "CollisionPipeline", "RigidCollider", "ParticleGroupCollider",
    "RigidContacts", "ParticleRigidContacts",
    "solve_rigid_contacts", "solve_particle_rigid_contacts", "sampling",
]

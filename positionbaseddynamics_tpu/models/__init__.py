"""Scene/model builders (layer "SimulationModel" of the reference)."""

from .mesh import TriangleMesh, TetMesh, face_normals, vertex_normals
from .builders import (
    SceneBuilder,
    regular_triangle_grid,
    regular_tet_grid,
)

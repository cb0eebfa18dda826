"""Utilities — the ``Utils/`` layer equivalents.

* :mod:`.loaders` — OBJ/PLY/TetGen mesh ingestion
  (``Utils/OBJLoader.h``, ``PLYLoader.h``, ``TetGenLoader.cpp``)
* :mod:`.massprops` — polyhedral mass/COM/inertia integrals
  (``Utils/VolumeIntegration.cpp``)
* :mod:`.timing` — phase timers (``Utils/Timing.h``)
* :mod:`.log` — sink-based logging (``Utils/Logger.h``)
* :mod:`.checkpoint` — state save/load (SURVEY §5; no reference
  equivalent)
* :mod:`.npquat` — host-side quaternion helpers
"""
from . import npquat
from .checkpoint import load_state, save_state
from .loaders import load_mesh, load_obj, load_ply, load_tetgen
from .massprops import mass_properties, principal_frame
from .timing import PhaseTimers

__all__ = [
    "npquat", "load_state", "save_state", "load_mesh", "load_obj",
    "load_ply", "load_tetgen", "mass_properties", "principal_frame",
    "PhaseTimers",
]

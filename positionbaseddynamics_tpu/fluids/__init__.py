"""Position-Based Fluids (Macklin & Müller PBF) — TPU-native analogue of
the reference's ``PositionBasedFluids`` kernels + FluidDemo model/stepper
(``PositionBasedDynamics/PositionBasedFluids.{h,cpp}``,
``Demos/FluidDemo/``)."""

from . import sph
from .neighborhood import neighbor_candidates
from .model import (
    FluidScene,
    FluidState,
    block_positions,
    box_boundary,
    cfl_dt,
    compute_density,
    compute_lambda,
    fluid_step,
    make_fluid_step_fn,
    solve_density_constraint,
    xsph_viscosity,
)

__all__ = [
    "sph", "neighbor_candidates", "FluidState", "FluidScene", "fluid_step",
    "make_fluid_step_fn", "compute_density", "compute_lambda",
    "solve_density_constraint", "xsph_viscosity", "cfl_dt",
    "block_positions", "box_boundary",
]

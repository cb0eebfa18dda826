import jax
from positionbaseddynamics_tpu.fluids.model import (
    FluidScene, FluidState, block_positions, box_boundary, _fluid_step_cells)
radius = 0.025; diam = 0.05
fluid = block_positions((diam,)*3, (40, 25, 12), diam)
lo = (0.0, 0.0, 0.0)
hi = (42*diam*4.0, 27*diam*2.0, 14*diam)
bnd = box_boundary(lo, hi, diam)
scene = FluidScene.create(len(fluid), bnd, particle_radius=radius, domain=(lo, hi))
st = FluidState.create(fluid)
fo = jax.jit(lambda s: _fluid_step_cells(s, scene, partition=False))
for i in range(41):
    if i % 8 == 0:
        print(f"step {i}: old-path overflow={float(st.overflow)}")
    st = fo(st)
print("final", float(st.overflow))

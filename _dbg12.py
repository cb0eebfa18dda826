import jax, jax.numpy as jnp
from positionbaseddynamics_tpu.fluids.model import (
    FluidScene, FluidState, block_positions, box_boundary, make_fluid_step_fn)
from positionbaseddynamics_tpu.fluids.cellgrid import build_fluid_tables
from positionbaseddynamics_tpu.fluids import classgrid as cg
radius = 0.025; diam = 0.05
fluid = block_positions((diam,)*3, (40, 25, 12), diam)
lo = (0.0, 0.0, 0.0)
hi = (42*diam*4.0, 27*diam*2.0, 14*diam)
bnd = box_boundary(lo, hi, diam)
scene = FluidScene.create(len(fluid), bnd, particle_radius=radius, domain=(lo, hi))
spec = scene.cellgrid
print("caps", cg.class_capacities(spec), "max_active", spec.max_active,
      "near_frac", round(spec.boundary.near_frac, 3), "capn", cg.narrow_cap(spec))
state = FluidState.create(fluid)
fn = make_fluid_step_fn(scene)
@jax.jit
def stats(x):
    slot, kept, xt, mt, active, nbr, nbr_ok, ovf = build_fluid_tables(spec, x, scene.mass)
    occ = jnp.any(mt > 0, -1)
    m = cg._nbhd_max_occ(spec, mt)
    capn = cg.narrow_cap(spec)
    cnt = jnp.sum(mt > 0, -1)
    nb = spec.boundary.near
    return (jnp.sum(occ), jnp.sum(occ & (m > capn)),
            jnp.sum(occ & nb), jnp.sum(occ & nb & (cnt > capn)), ovf)
for i in range(41):
    if i % 8 == 0:
        o, f, b, bf, ovf = [int(v) for v in stats(state.x)]
        print(f"step {i}: occ={o} full={f} bnd={b} bndfull={bf} cellovf={ovf} stateovf={float(state.overflow)}")
    state = fn(state)

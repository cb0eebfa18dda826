#!/usr/bin/env python
"""FluidDemo: Position-Based Fluids breaking dam — density constraint
solve with Akinci boundary particles, XSPH viscosity and CFL-clamped
time steps (``Demos/FluidDemo``; ``TimeStepFluidModel.cpp:21-68``)."""
import time

import numpy as np

from _common import demo_args, p
from positionbaseddynamics_tpu.fluids import (
    FluidScene, FluidState, block_positions, box_boundary,
    make_fluid_step_fn)


def main():
    ap = demo_args(__doc__, steps=200)
    ap.add_argument("--dims", type=int, nargs=3, default=(8, 14, 8),
                    help="fluid block particle counts")
    args = ap.parse_args()

    import jax

    r = 0.025
    diam = 2 * r
    fluid = block_positions((diam, diam, diam), tuple(args.dims), diam)
    boundary = box_boundary((-diam, 0.0, -diam), (0.6, 0.7, 0.6), diam)
    p("fluid particles", len(fluid))
    p("boundary particles", len(boundary))

    # bounded domain engages the cell-dense engine (fluids/cellgrid.py)
    scene = FluidScene.create(len(fluid), boundary, particle_radius=r,
                              viscosity=0.02, cap_per_cell=16,
                              domain=((-diam, 0.0, -diam),
                                      (0.6, 0.7, 0.6)))
    state = FluidState.create(fluid)
    fn = make_fluid_step_fn(scene)
    state = jax.block_until_ready(fn(state))      # compile
    t0 = time.perf_counter()
    frames = []
    for i in range(args.steps):
        state = fn(state)
        if args.export_npz and i % 8 == 0:
            frames.append(np.asarray(state.x))
    jax.block_until_ready(state.x)
    dt = time.perf_counter() - t0
    print(f"{args.steps} steps in {dt:.2f}s -> {args.steps / dt:.1f} steps/s")

    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    p("fluid height after collapse", round(float(x[:, 1].max()), 3))
    p("spread x", f"{x[:, 0].min():.3f}..{x[:, 0].max():.3f}")
    if args.export_npz:
        np.savez(args.export_npz, particles=np.stack(frames))
        p("trajectory saved to", args.export_npz)


if __name__ == "__main__":
    main()

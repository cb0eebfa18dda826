#!/usr/bin/env python
"""PositionBasedElasticRodsDemo: ghost-point elastic rod (Umetani 2014)
with perpendicular-bisector, ghost-edge-distance and Darboux-vector
constraints (``Demos/PositionBasedElasticRodsDemo``; rod of points at
0.25 spacing, first two points + first ghost pinned)."""
import numpy as np

from _common import demo_args, simulate, p
from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig


def main():
    ap = demo_args(__doc__, steps=300)
    ap.add_argument("--points", type=int, default=10)
    args = ap.parse_args()

    n = args.points
    pts = np.stack([0.25 * np.arange(n), np.zeros(n), np.zeros(n)], 1)
    b = SceneBuilder()
    h = b.add_ghost_rod_model(pts)
    b.set_mass(h.offset, 0.0)
    b.set_mass(h.offset + 1, 0.0)
    b.set_mass(h.ghost_offset, 0.0)
    b.add_ghost_rod_constraints(h, stretching_stiffness=1.0,
                                bending_twisting=(0.5, 0.5, 0.5))
    state, cset = b.build()

    # the demo's custom stepper damps velocities
    final = simulate(state, cset, StepConfig(damping=0.001), args.steps,
                     export_npz=args.export_npz)
    x = np.asarray(final.particles.x)
    rod = x[h.offset:h.offset + h.n_points]
    p("tip y", round(float(rod[-1, 1]), 4))
    seg = np.linalg.norm(np.diff(rod, axis=0), axis=1)
    p("segment lengths", f"{seg.min():.3f}..{seg.max():.3f} (rest 0.25)")


if __name__ == "__main__":
    main()

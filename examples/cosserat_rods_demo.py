#!/usr/bin/env python
"""CosseratRodsDemo: a helix of rod segments with stretch-shear +
bend-twist constraints (``Demos/CosseratRodsDemo/main.cpp:225-273``,
helix of 50 segments)."""
import numpy as np

from _common import demo_args, simulate, p
from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig


def main():
    ap = demo_args(__doc__, steps=300)
    ap.add_argument("--segments", type=int, default=50)
    args = ap.parse_args()

    n = args.segments + 1
    t = np.linspace(0.0, 4.0 * np.pi, n)
    pts = np.stack([0.3 * np.cos(t), -0.1 * t, 0.3 * np.sin(t)], 1)

    b = SceneBuilder()
    lm = b.add_line_model(pts)
    b.set_mass(lm.offset, 0.0)                 # pin helix top
    b.set_quaternion_mass(lm.offset_q, 0.0)
    b.add_rod_constraints(lm, stretch_stiffness=(1.0, 1.0, 1.0),
                          bend_twist_stiffness=(0.5, 0.5, 0.5))
    state, cset = b.build()

    final = simulate(state, cset, StepConfig(damping=0.001), args.steps,
                     export_npz=args.export_npz)
    x = np.asarray(final.particles.x)
    seg = np.linalg.norm(np.diff(x, axis=0), axis=1)
    p("tip y", round(float(x[-1, 1]), 4))
    p("max segment stretch", round(float(seg.max() / seg.min()), 3))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""StretchBendingTwistingDemo: a stiff rod of rigid segments joined by
iterative 6D-XPBD stretch-bending-twisting joints
(``Demos/StiffRodsDemos/StretchBendingTwistingDemo.cpp``;
kernel ``PositionBasedElasticRods.cpp:1228-1363``)."""
import numpy as np

from _common import demo_args, simulate, p
from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig


def main():
    ap = demo_args(__doc__, steps=200)
    ap.add_argument("--segments", type=int, default=10)
    ap.add_argument("--youngs", type=float, default=1e6)
    args = ap.parse_args()

    radius, seg_len = 0.1, 0.5
    mass = 1000.0 * np.pi * radius**2 * seg_len
    ix = 0.5 * mass * radius**2
    iyz = mass * (3 * radius**2 + seg_len**2) / 12.0

    b = SceneBuilder()
    for i in range(args.segments):
        b.add_rigid_body(x=((i + 0.5) * seg_len, 0.0, 0.0),
                         mass=(0.0 if i == 0 else mass),
                         inertia=(ix, iyz, iyz))
    for i in range(args.segments - 1):
        b.add_stretch_bending_twisting_constraint(
            i, i + 1, pos=((i + 1) * seg_len, 0.0, 0.0),
            average_radius=radius, average_segment_length=seg_len,
            youngs_modulus=args.youngs, torsion_modulus=args.youngs)
    state, cset = b.build()

    final = simulate(state, cset, StepConfig(max_iterations=5), args.steps,
                     export_npz=args.export_npz)
    x = np.asarray(final.rigid.x)
    p("tip", np.round(x[-1], 3))


if __name__ == "__main__":
    main()

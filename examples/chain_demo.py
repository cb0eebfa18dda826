#!/usr/bin/env python
"""ChainDemo: a hanging chain of rigid bodies linked by ball joints
swinging under gravity (``Demos/RigidBodyDemos/ChainDemo.cpp``)."""
import numpy as np

from _common import demo_args, simulate, p
from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig


def main():
    ap = demo_args(__doc__, steps=300)
    ap.add_argument("--links", type=int, default=8)
    args = ap.parse_args()

    b = SceneBuilder()
    prev = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)   # static anchor
    for i in range(args.links):
        body = b.add_rigid_body((1.0 + i, 0.0, 0.0), mass=1.0,
                                inertia=(0.1, 0.2, 0.3))
        b.add_ball_joint(prev, body, (0.5 + i, 0.0, 0.0))
        prev = body
    state, cset = b.build()

    final = simulate(state, cset, StepConfig(max_iterations=5), args.steps,
                     export_npz=args.export_npz)
    x = np.asarray(final.rigid.x)
    gaps = np.linalg.norm(np.diff(x, axis=0), axis=1)
    p("link spacing", f"{gaps.min():.3f}..{gaps.max():.3f} (rest 1.0)")
    p("chain tip", np.round(x[-1], 3))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""GenericParticleConstraintsDemo: a cloth held together purely by
user-defined constraint FUNCTIONS — Jacobians by autodiff where the
reference uses finite differences
(``Demos/GenericConstraintsDemos/GenericParticleConstraintsDemo.cpp``;
``PositionBasedGenericConstraints.h:31-121``)."""
import numpy as np

import jax.numpy as jnp

from _common import demo_args, simulate, p
from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig


def main():
    ap = demo_args(__doc__)
    ap.add_argument("--n", type=int, default=12)
    args = ap.parse_args()

    b = SceneBuilder(use_structured_grid=False)
    tm = b.add_regular_triangle_model(args.n, args.n)
    b.set_mass(tm.offset, 0.0)
    b.set_mass(tm.offset + args.n - 1, 0.0)
    edges = tm.mesh.edges + tm.offset
    x0 = np.concatenate(b._x)
    rests = np.linalg.norm(x0[edges[:, 0]] - x0[edges[:, 1]],
                           axis=-1)[:, None]

    def distance_c(pts, params):
        return jnp.array([jnp.linalg.norm(pts[1] - pts[0]) - params[0]])

    b.add_generic_constraints(distance_c, edges, stiffness=1.0,
                              params=rests)
    state, cset = b.build()

    final = simulate(state, cset, StepConfig(), args.steps,
                     export_npz=args.export_npz)
    x = np.asarray(final.particles.x)
    p("free corner y", round(float(x[-1, 1]), 4))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""GenericRigidBodyConstraintsDemo: a rigid pendulum whose ball joint
is expressed only as a constraint FUNCTION of body states (quaternion
Jacobians by autodiff;
``Demos/GenericConstraintsDemos/GenericRigidBodyConstraintsDemo.cpp``;
``PositionBasedGenericConstraints.h:218``)."""
import numpy as np

import jax.numpy as jnp

from _common import demo_args, simulate, p
from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.ops import quaternion as quat
from positionbaseddynamics_tpu.solver import StepConfig


def main():
    args = demo_args(__doc__).parse_args()

    def ball_c(x, q):
        c0 = quat.rotate(q[0], jnp.array([1.0, 0.0, 0.0])) + x[0]
        c1 = quat.rotate(q[1], jnp.array([-1.0, 0.0, 0.0])) + x[1]
        return c0 - c1

    b = SceneBuilder()
    b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    b.add_rigid_body((2.0, 0.0, 0.0), mass=1.0, inertia=(0.4, 0.4, 0.4))
    b.add_generic_rigid_constraints(ball_c, [[0, 1]])
    state, cset = b.build()

    final = simulate(state, cset, StepConfig(), args.steps,
                     export_npz=args.export_npz)
    x = np.asarray(final.rigid.x)
    q = np.asarray(final.rigid.q)
    from positionbaseddynamics_tpu.utils import npquat
    c1 = npquat.rotate(q[1], np.array([-1.0, 0.0, 0.0])) + x[1]
    p("pendulum body", np.round(x[1], 3))
    p("connector drift from anchor", round(float(np.linalg.norm(c1 - [1, 0, 0])), 4))


if __name__ == "__main__":
    main()

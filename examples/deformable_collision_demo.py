#!/usr/bin/env python
"""DeformableCollisionDemo: a dynamic XPBD-FEM tet bar dropped onto a
static tet bar — solid–solid (particle–tet) contact
(``Demos/DistanceFieldDemos/DeformableCollisionDemo.cpp``;
``DistanceFieldCollisionDetection.cpp:361-470``)."""
import numpy as np

from _common import demo_args, simulate, p
from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig


def main():
    args = demo_args(__doc__, steps=150).parse_args()

    b = SceneBuilder()
    bottom = b.add_regular_tet_model(6, 2, 2, translation=(0.0, 0.0, 0.0),
                                     scale=(1.2, 0.25, 0.4))
    for i in range(bottom.mesh.n_vertices):
        b.set_mass(bottom.offset + i, 0.0)
    top = b.add_regular_tet_model(6, 2, 2,
                                  translation=(0.05, 0.45, 0.0),
                                  scale=(1.0, 0.25, 0.3))
    b.add_solid_constraints(top, method=3, stiffness=1e5)
    b.set_particle_collider(bottom, restitution=0.0, friction=0.2)
    b.set_particle_collider(top, restitution=0.0, friction=0.2)
    b.set_tet_collider(bottom, restitution=0.0, friction=0.2,
                       sdf_resolution=20, grid_resolution=16)
    b.set_tet_collider(top, restitution=0.0, friction=0.2,
                       sdf_resolution=20, grid_resolution=16)
    state, cset = b.build()
    pipe = b.build_collision_pipeline()

    final = simulate(state, cset, StepConfig(), args.steps, pipeline=pipe,
                     export_npz=args.export_npz)
    x = np.asarray(final.particles.x)
    top_x = x[top.offset:top.offset + top.mesh.n_vertices]
    p("top bar rests above the bottom bar at y",
      round(float(top_x[:, 1].min()), 3))


if __name__ == "__main__":
    main()

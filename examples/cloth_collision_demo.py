#!/usr/bin/env python
"""ClothCollisionDemo: cloth dropped onto a static collision sphere
(``Demos/DistanceFieldDemos/ClothCollisionDemo.cpp``) — particle-rigid
contacts against an analytic SDF."""
import numpy as np

from _common import demo_args, simulate, p
from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig


def main():
    ap = demo_args(__doc__, steps=250)
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    b = SceneBuilder()
    tm = b.add_regular_triangle_model(args.n, args.n,
                                      translation=(-1.0, 1.0, -1.0),
                                      scale=(2.0, 2.0))
    b.add_cloth_constraints(tm, method=4, distance_stiffness=1e5)
    b.add_bending_constraints(tm, method=3, stiffness=0.05)
    sph = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    b.add_collision_sphere(sph, 0.6, restitution=0.0, friction=0.2,
                           verts=np.zeros((1, 3), np.float32))
    b.set_particle_collider(tm, restitution=0.0, friction=0.2)
    state, cset = b.build()
    pipe = b.build_collision_pipeline(tolerance=0.02)

    final = simulate(state, cset, StepConfig(), args.steps, pipeline=pipe,
                     export_npz=args.export_npz)
    x = np.asarray(final.particles.x)
    p("min |x| (cloth outside the r=0.6 sphere)",
      round(float(np.linalg.norm(x, axis=-1).min()), 3))
    p("max height (draped over the top)", round(float(x[:, 1].max()), 3))


if __name__ == "__main__":
    main()

"""Dump a cloth scene (color-sorted constraints) for the C++ parity
oracle (``parity_runner.cpp``). Importable; also runnable standalone."""
from __future__ import annotations

import numpy as np


def build_cloth(n=10, distance_stiffness=1e5, bending_stiffness=0.05):
    from positionbaseddynamics_tpu.models import SceneBuilder

    b = SceneBuilder(use_structured_grid=False)
    tm = b.add_regular_triangle_model(n, n)
    b.set_mass(tm.offset, 0.0)
    b.set_mass(tm.offset + n - 1, 0.0)
    b.add_cloth_constraints(tm, method=4,
                            distance_stiffness=distance_stiffness)
    b.add_bending_constraints(tm, method=3, stiffness=bending_stiffness)
    return b.build()


def dump(path, state, cset, substeps=5, max_iterations=1, dt=0.005,
         steps=50):
    """Write the parity_runner input file. Constraints are emitted sorted
    by graph color so the oracle's sequential in-place sweep equals the
    engine's color-batched Gauss-Seidel order."""
    x = np.asarray(state.particles.x, np.float64)
    w = np.asarray(state.particles.inv_mass, np.float64)
    mass = np.where(w > 0, 1.0 / np.maximum(w, 1e-30), 0.0)
    lines = [f"{x.shape[0]}"]
    for i in range(x.shape[0]):
        lines.append(f"{x[i,0]:.9g} {x[i,1]:.9g} {x[i,2]:.9g} "
                     f"{mass[i]:.9g}")
    lines.append(f"{substeps} {max_iterations} {dt} {steps}")

    d = cset.distance
    assert d is not None and d.xpbd
    order = np.argsort(np.asarray(d.color), kind="stable")
    idx = np.asarray(d.idx)[order]
    rest = np.asarray(d.rest_length, np.float64)[order]
    stiff = np.asarray(d.stiffness, np.float64)[order]
    lines.append(f"{len(idx)}")
    for c in range(len(idx)):
        lines.append(f"{idx[c,0]} {idx[c,1]} {rest[c]:.9g} {stiff[c]:.9g}")

    bnd = cset.isometric_bending
    assert bnd is not None and bnd.xpbd
    order = np.argsort(np.asarray(bnd.color), kind="stable")
    idx = np.asarray(bnd.idx)[order]
    stiff = np.asarray(bnd.stiffness, np.float64)[order]
    lines.append(f"{len(idx)}")
    for c in range(len(idx)):
        lines.append(f"{idx[c,0]} {idx[c,1]} {idx[c,2]} {idx[c,3]} "
                     f"{stiff[c]:.9g}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return order

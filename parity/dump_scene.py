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


# ---------------------------------------------------------------------------
# Oracle #2 scenes (parity_runner2.cpp): FEM tets, Cosserat rods,
# rigid ball-joint chains.
# ---------------------------------------------------------------------------


def build_fem_tet_bar(w=6, h=3, d=3, stiffness=1e5, poisson=0.3):
    """BarDemo-class cantilever (BASELINE config 2): regular tet bar,
    pinned i=0 face, XPBD FEM (solid method 3)."""
    from positionbaseddynamics_tpu.models import SceneBuilder

    b = SceneBuilder(use_structured_grid=False)
    tm = b.add_regular_tet_model(w, h, d, scale=(2.0, 0.5, 0.5))
    for j in range(h):
        for k in range(d):
            b.set_mass(tm.offset + j * d + k, 0.0)
    b.add_solid_constraints(tm, method=3, stiffness=stiffness,
                            poisson_ratio=poisson)
    return b.build()


def dump_femtet(path, state, cset, substeps=5, max_iterations=1, dt=0.005,
                steps=50):
    x = np.asarray(state.particles.x, np.float64)
    w = np.asarray(state.particles.inv_mass, np.float64)
    mass = np.where(w > 0, 1.0 / np.maximum(w, 1e-30), 0.0)
    lines = ["femtet", f"{x.shape[0]}"]
    for i in range(x.shape[0]):
        lines.append(f"{x[i,0]:.9g} {x[i,1]:.9g} {x[i,2]:.9g} {mass[i]:.9g}")
    lines.append(f"{substeps} {max_iterations} {dt} {steps}")
    t = cset.fem_tetra
    assert t is not None and t.xpbd
    order = np.argsort(np.asarray(t.color), kind="stable")
    idx = np.asarray(t.idx)[order]
    youngs = np.asarray(t.youngs, np.float64)[order]
    poisson = np.asarray(t.poisson, np.float64)[order]
    lines.append(f"{len(idx)}")
    for c in range(len(idx)):
        lines.append(f"{idx[c,0]} {idx[c,1]} {idx[c,2]} {idx[c,3]} "
                     f"{youngs[c]:.9g} {poisson[c]:.9g}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def build_cosserat_rod(n=12, stretch_ks=(1.0, 1.0, 1.0),
                       bend_ks=(0.5, 0.5, 0.5)):
    """CosseratRodsDemo-class rod (BASELINE config 3): straight rod along
    x, first particle + first frame pinned, sagging under gravity."""
    from positionbaseddynamics_tpu.models import SceneBuilder

    b = SceneBuilder(use_structured_grid=False)
    pts = np.stack([np.linspace(0.0, 1.0, n), np.zeros(n), np.zeros(n)], 1)
    lm = b.add_line_model(pts)
    b.set_mass(lm.offset, 0.0)
    b.set_quaternion_mass(lm.offset_q, 0.0)
    b.add_rod_constraints(lm, stretch_stiffness=stretch_ks,
                          bend_twist_stiffness=bend_ks)
    return b.build()


def dump_rod(path, state, cset, substeps=5, max_iterations=1, dt=0.005,
             steps=50):
    x = np.asarray(state.particles.x, np.float64)
    w = np.asarray(state.particles.inv_mass, np.float64)
    mass = np.where(w > 0, 1.0 / np.maximum(w, 1e-30), 0.0)
    q = np.asarray(state.orientations.q, np.float64)
    wq = np.asarray(state.orientations.inv_mass, np.float64)
    mass_q = np.where(wq > 0, 1.0 / np.maximum(wq, 1e-30), 0.0)
    lines = ["rod", f"{x.shape[0]} {q.shape[0]}"]
    for i in range(x.shape[0]):
        lines.append(f"{x[i,0]:.9g} {x[i,1]:.9g} {x[i,2]:.9g} {mass[i]:.9g}")
    for i in range(q.shape[0]):
        lines.append(f"{q[i,0]:.9g} {q[i,1]:.9g} {q[i,2]:.9g} {q[i,3]:.9g} "
                     f"{mass_q[i]:.9g}")
    lines.append(f"{substeps} {max_iterations} {dt} {steps}")
    ss = cset.stretch_shear
    assert ss is not None
    order = np.argsort(np.asarray(ss.color), kind="stable")
    idx_p = np.asarray(ss.idx_p)[order]
    idx_q = np.asarray(ss.idx_q)[order]
    rest = np.asarray(ss.rest_length, np.float64)[order]
    ks = np.asarray(ss.stretch_ks, np.float64)[order]
    lines.append(f"{len(idx_p)}")
    for c in range(len(idx_p)):
        lines.append(f"{idx_p[c,0]} {idx_p[c,1]} {idx_q[c]} {rest[c]:.9g} "
                     f"{ks[c,0]:.9g} {ks[c,1]:.9g} {ks[c,2]:.9g}")
    bt = cset.bend_twist
    assert bt is not None
    order = np.argsort(np.asarray(bt.color), kind="stable")
    idx = np.asarray(bt.idx_q)[order]
    ks = np.asarray(bt.bend_ks, np.float64)[order]
    lines.append(f"{len(idx)}")
    for c in range(len(idx)):
        lines.append(f"{idx[c,0]} {idx[c,1]} "
                     f"{ks[c,0]:.9g} {ks[c,1]:.9g} {ks[c,2]:.9g}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def build_balljoint_chain(n=4):
    """JointDemo-class ball-joint chain: static anchor + n dynamic links
    hanging under gravity with asymmetric inertia."""
    from positionbaseddynamics_tpu.models import SceneBuilder

    b = SceneBuilder()
    prev = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    for i in range(n):
        body = b.add_rigid_body((1.0 + i, 0.0, 0.0), mass=1.0,
                                inertia=(0.1, 0.2, 0.3))
        b.add_ball_joint(prev, body, (0.5 + i, 0.0, 0.0))
        prev = body
    state, cset = b.build()
    return state, cset, b


def dump_balljoint(path, state, builder, substeps=5, max_iterations=1,
                   dt=0.005, steps=50):
    r = state.rigid
    x = np.asarray(r.x, np.float64)
    q = np.asarray(r.q, np.float64)
    w = np.asarray(r.inv_mass, np.float64)
    mass = np.where(w > 0, 1.0 / np.maximum(w, 1e-30), 0.0)
    inertia = np.asarray(r.inertia0, np.float64)
    lines = ["balljoint", f"{x.shape[0]}"]
    for i in range(x.shape[0]):
        lines.append(
            f"{x[i,0]:.9g} {x[i,1]:.9g} {x[i,2]:.9g} "
            f"{q[i,0]:.9g} {q[i,1]:.9g} {q[i,2]:.9g} {q[i,3]:.9g} "
            f"{mass[i]:.9g} {inertia[i,0]:.9g} {inertia[i,1]:.9g} "
            f"{inertia[i,2]:.9g}")
    lines.append(f"{substeps} {max_iterations} {dt} {steps}")
    joints = [j for j in builder._joints if j["kind"] == "ball"]
    lines.append(f"{len(joints)}")
    for j in joints:
        p = np.asarray(j["positions"], np.float64)
        lines.append(f"{j['bodies'][0]} {j['bodies'][1]} "
                     f"{p[0]:.9g} {p[1]:.9g} {p[2]:.9g}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")

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


# ---------------------------------------------------------------------------
# Contact oracle scenes (parity_runner2.cpp modes "rbcontact" /
# "clothcontact" — BASELINE configs 4-5 class).
# ---------------------------------------------------------------------------

_BOX_HALF = (0.25, 0.25, 0.25)
_FLOOR_HALF = (2.0, 0.5, 2.0)
_SPHERE_R = 0.4


def _box_corners(half):
    hx, hy, hz = half
    return np.array([[sx * hx, sy * hy, sz * hz]
                     for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                    np.float64)


def _axis_angle_q(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    return np.concatenate([[np.cos(angle / 2)],
                           np.sin(angle / 2) * axis])


def build_rbcontact_scene():
    """RigidBodyCollisionDemo-class scene: a tilted, spinning dynamic box
    dropped on a static box floor. Returns (state, cset, builder,
    pipeline); the collision pipeline carries the same vertex cloud the
    oracle gets."""
    from positionbaseddynamics_tpu.models import SceneBuilder

    b = SceneBuilder()
    floor = b.add_rigid_body((0.0, -0.5, 0.0), mass=0.0)
    q0 = _axis_angle_q((1.0, 0.5, 0.3), 0.3)
    m = 1.0
    hx, hy, hz = _BOX_HALF
    inertia = (m / 3.0 * (hy * hy + hz * hz),
               m / 3.0 * (hx * hx + hz * hz),
               m / 3.0 * (hx * hx + hy * hy))
    box = b.add_rigid_body((0.0, 0.6, 0.0), q=q0, mass=m, inertia=inertia,
                           velocity=(0.2, 0.0, -0.1), omega=(0.5, 1.0, 0.2))
    # floor: SDF target only (testMesh=0 -> empty point cloud)
    b.add_collision_box(floor, _FLOOR_HALF, verts=np.zeros((0, 3)),
                        restitution=0.6, friction=0.2)
    b.add_collision_box(box, _BOX_HALF, verts=_box_corners(_BOX_HALF),
                        restitution=0.3, friction=0.2)
    state, cset = b.build()
    pipeline = b.build_collision_pipeline(tolerance=0.01,
                                          max_collider_verts=None)
    return state, cset, b, pipeline


def dump_rbcontact(path, state, builder, substeps=5, max_iterations=1,
                   max_iterations_v=5, dt=0.005, steps=50, tolerance=0.01,
                   stiffness=1.0):
    r = state.rigid
    x = np.asarray(r.x, np.float64)
    q = np.asarray(r.q, np.float64)
    v = np.asarray(r.v, np.float64)
    om = np.asarray(r.omega, np.float64)
    w = np.asarray(r.inv_mass, np.float64)
    mass = np.where(w > 0, 1.0 / np.maximum(w, 1e-30), 0.0)
    inertia = np.asarray(r.inertia0, np.float64)
    colliders = {c["body"]: c for c in builder._rb_colliders}
    lines = ["rbcontact", f"{x.shape[0]}"]
    for i in range(x.shape[0]):
        c = colliders[i]
        kind = c["shape"].kind
        stype = {"box": 1, "sphere": 2}[kind]
        p = np.asarray(c["shape"].params, np.float64)
        p = np.concatenate([p, np.zeros(3)])[:3]
        verts = c["verts"] if c["verts"] is not None else np.zeros((0, 3))
        test_mesh = 1 if len(verts) else 0
        lines.append(
            f"{x[i,0]:.9g} {x[i,1]:.9g} {x[i,2]:.9g} "
            f"{q[i,0]:.9g} {q[i,1]:.9g} {q[i,2]:.9g} {q[i,3]:.9g} "
            f"{v[i,0]:.9g} {v[i,1]:.9g} {v[i,2]:.9g} "
            f"{om[i,0]:.9g} {om[i,1]:.9g} {om[i,2]:.9g} "
            f"{mass[i]:.9g} {inertia[i,0]:.9g} {inertia[i,1]:.9g} "
            f"{inertia[i,2]:.9g} {c['restitution']:.9g} "
            f"{c['friction']:.9g} {test_mesh} {stype} "
            f"{p[0]:.9g} {p[1]:.9g} {p[2]:.9g} {len(verts)}")
        for vv in np.asarray(verts, np.float64):
            lines.append(f"{vv[0]:.9g} {vv[1]:.9g} {vv[2]:.9g}")
    lines.append(f"{substeps} {max_iterations} {max_iterations_v} {dt} "
                 f"{steps} {tolerance} {stiffness}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def build_clothcontact_scene(n=8):
    """ClothCollisionDemo-class scene: a free horizontal XPBD-distance
    cloth dropped on a static sphere."""
    from positionbaseddynamics_tpu.models import SceneBuilder

    b = SceneBuilder(use_structured_grid=False)
    rot = np.array([[1.0, 0.0, 0.0],
                    [0.0, 0.0, 1.0],
                    [0.0, -1.0, 0.0]])  # grid plane -> horizontal
    tm = b.add_regular_triangle_model(
        n, n, translation=(-0.5, 0.7, 0.5), rotation=rot, scale=(1.0, 1.0))
    b.add_cloth_constraints(tm, method=4, distance_stiffness=1e5)
    sph = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    b.add_collision_sphere(sph, _SPHERE_R, verts=np.zeros((0, 3)),
                           restitution=0.6, friction=0.2)
    b.set_particle_collider(tm, restitution=0.3, friction=0.1)
    state, cset = b.build()
    pipeline = b.build_collision_pipeline(tolerance=0.01,
                                          max_collider_verts=None)
    return state, cset, b, pipeline


def dump_clothcontact(path, state, cset, builder, substeps=5,
                      max_iterations=1, max_iterations_v=5, dt=0.005,
                      steps=50, tolerance=0.01, stiffness=100.0):
    x = np.asarray(state.particles.x, np.float64)
    w = np.asarray(state.particles.inv_mass, np.float64)
    mass = np.where(w > 0, 1.0 / np.maximum(w, 1e-30), 0.0)
    lines = ["clothcontact", f"{x.shape[0]}"]
    for i in range(x.shape[0]):
        lines.append(f"{x[i,0]:.9g} {x[i,1]:.9g} {x[i,2]:.9g} "
                     f"{mass[i]:.9g}")
    d = cset.distance
    assert d is not None and d.xpbd
    order = np.argsort(np.asarray(d.color), kind="stable")
    idx = np.asarray(d.idx)[order]
    rest = np.asarray(d.rest_length, np.float64)[order]
    stiff = np.asarray(d.stiffness, np.float64)[order]
    lines.append(f"{len(idx)}")
    for c in range(len(idx)):
        lines.append(f"{idx[c,0]} {idx[c,1]} {rest[c]:.9g} {stiff[c]:.9g}")

    r = state.rigid
    rx = np.asarray(r.x, np.float64)
    rq = np.asarray(r.q, np.float64)
    rv = np.asarray(r.v, np.float64)
    rom = np.asarray(r.omega, np.float64)
    rw = np.asarray(r.inv_mass, np.float64)
    rmass = np.where(rw > 0, 1.0 / np.maximum(rw, 1e-30), 0.0)
    rin = np.asarray(r.inertia0, np.float64)
    colliders = {c["body"]: c for c in builder._rb_colliders}
    lines.append(f"{rx.shape[0]}")
    for i in range(rx.shape[0]):
        c = colliders[i]
        stype = {"box": 1, "sphere": 2}[c["shape"].kind]
        p = np.asarray(c["shape"].params, np.float64)
        p = np.concatenate([p, np.zeros(3)])[:3]
        lines.append(
            f"{rx[i,0]:.9g} {rx[i,1]:.9g} {rx[i,2]:.9g} "
            f"{rq[i,0]:.9g} {rq[i,1]:.9g} {rq[i,2]:.9g} {rq[i,3]:.9g} "
            f"{rv[i,0]:.9g} {rv[i,1]:.9g} {rv[i,2]:.9g} "
            f"{rom[i,0]:.9g} {rom[i,1]:.9g} {rom[i,2]:.9g} "
            f"{rmass[i]:.9g} {rin[i,0]:.9g} {rin[i,1]:.9g} {rin[i,2]:.9g} "
            f"{c['restitution']:.9g} {c['friction']:.9g} 0 {stype} "
            f"{p[0]:.9g} {p[1]:.9g} {p[2]:.9g} 0")
    pg = builder._pg_colliders[0]
    lines.append(f"{pg['restitution']:.9g} {pg['friction']:.9g}")
    lines.append(f"{substeps} {max_iterations} {max_iterations_v} {dt} "
                 f"{steps} {tolerance} {stiffness}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


# ---------------------------------------------------------------------------
# parity_runner3.cpp scenes: joint zoo + motors, SBT rod joints,
# strain-based dynamics, shape matching, particle-tet contact
# (VERDICT r4 item 3 — the previously unproven kernel families)
# ---------------------------------------------------------------------------

_JOINT_KIND_IDS = {
    "hinge": 0, "universal": 1, "slider": 2,
    "target_position_motor_slider": 3,
    "target_velocity_motor_slider": 4,
    "target_angle_motor_hinge": 5,
    "target_velocity_motor_hinge": 6,
}


def build_joint_scene(kind, target=0.0):
    """JointDemo-class pair: static anchor + dynamic link joined by one
    joint of ``kind`` (axes chosen off-principal so all K-matrix rows
    are exercised)."""
    from positionbaseddynamics_tpu.models import SceneBuilder

    b = SceneBuilder()
    anchor = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    body = b.add_rigid_body((1.0, 0.0, 0.25), mass=1.0,
                            inertia=(0.1, 0.2, 0.3))
    pos = (0.5, 0.0, 0.125)
    # tilted so gravity has a component along slider axes (a slider
    # aligned orthogonal to gravity never moves — trivial trajectory)
    ax0 = np.array([0.2, -0.6, 1.0])
    ax0 = ax0 / np.linalg.norm(ax0)
    ax1 = np.array([0.0, 1.0, 0.1])
    ax1 = ax1 / np.linalg.norm(ax1)
    if kind == "hinge":
        b.add_hinge_joint(anchor, body, pos, ax0)
    elif kind == "universal":
        b.add_universal_joint(anchor, body, pos, ax0, ax1)
    elif kind == "slider":
        b.add_slider_joint(anchor, body, ax0)
    elif kind == "target_position_motor_slider":
        b.add_target_position_motor_slider_joint(anchor, body, ax0,
                                                 target=target)
    elif kind == "target_velocity_motor_slider":
        b.add_target_velocity_motor_slider_joint(anchor, body, ax0,
                                                 target=target)
    elif kind == "target_angle_motor_hinge":
        b.add_target_angle_motor_hinge_joint(anchor, body, pos, ax0,
                                             target=target)
    elif kind == "target_velocity_motor_hinge":
        b.add_target_velocity_motor_hinge_joint(anchor, body, pos, ax0,
                                                target=target)
    else:
        raise ValueError(kind)
    state, cset = b.build()
    return state, cset, b


def dump_joints(path, state, builder, substeps=5, max_iterations=1,
                max_iterations_v=5, dt=0.005, steps=50):
    r = state.rigid
    x = np.asarray(r.x, np.float64)
    q = np.asarray(r.q, np.float64)
    w = np.asarray(r.inv_mass, np.float64)
    mass = np.where(w > 0, 1.0 / np.maximum(w, 1e-30), 0.0)
    inertia = np.asarray(r.inertia0, np.float64)
    lines = ["joints", f"{x.shape[0]}"]
    for i in range(x.shape[0]):
        lines.append(
            f"{x[i,0]:.9g} {x[i,1]:.9g} {x[i,2]:.9g} "
            f"{q[i,0]:.9g} {q[i,1]:.9g} {q[i,2]:.9g} {q[i,3]:.9g} "
            f"{mass[i]:.9g} {inertia[i,0]:.9g} {inertia[i,1]:.9g} "
            f"{inertia[i,2]:.9g}")
    lines.append(f"{substeps} {max_iterations} {max_iterations_v} "
                 f"{dt} {steps}")
    joints = [j for j in builder._joints if j["kind"] in _JOINT_KIND_IDS]
    lines.append(f"{len(joints)}")
    for j in joints:
        kid = _JOINT_KIND_IDS[j["kind"]]
        p = np.asarray(j.get("positions", np.zeros(3)), np.float64)
        a0 = np.asarray(j.get("directions", np.zeros(3)), np.float64)
        a1 = np.asarray(j.get("directions1", np.zeros(3)), np.float64)
        tg = float(j.get("target", 0.0))
        lines.append(
            f"{kid} {j['bodies'][0]} {j['bodies'][1]} "
            f"{p[0]:.9g} {p[1]:.9g} {p[2]:.9g} "
            f"{a0[0]:.9g} {a0[1]:.9g} {a0[2]:.9g} "
            f"{a1[0]:.9g} {a1[1]:.9g} {a1[2]:.9g} {tg:.9g}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def build_sbt_chain(n=5, youngs=1e6, torsion=5e5):
    """StretchBendingTwistingDemo-class rod: static anchor segment + n
    dynamic segments joined by SBT constraints."""
    from positionbaseddynamics_tpu.models import SceneBuilder

    b = SceneBuilder()
    seg_len = 0.25
    radius = 0.02
    mass = 1.0
    # rod-segment inertia (cylinder about x)
    ix = 0.5 * mass * radius * radius
    iyz = mass * (3 * radius * radius + seg_len * seg_len) / 12.0
    prev = b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0)
    for i in range(n):
        body = b.add_rigid_body(((i + 1) * seg_len, 0.0, 0.0),
                                mass=mass, inertia=(ix, iyz, iyz))
        b.add_stretch_bending_twisting_constraint(
            prev, body, ((i + 0.5) * seg_len, 0.0, 0.0), radius,
            seg_len, youngs, torsion)
        prev = body
    state, cset = b.build()
    return state, cset, b


def dump_sbtrod(path, state, builder, substeps=5, max_iterations=1,
                dt=0.005, steps=50):
    r = state.rigid
    x = np.asarray(r.x, np.float64)
    q = np.asarray(r.q, np.float64)
    w = np.asarray(r.inv_mass, np.float64)
    mass = np.where(w > 0, 1.0 / np.maximum(w, 1e-30), 0.0)
    inertia = np.asarray(r.inertia0, np.float64)
    lines = ["sbtrod", f"{x.shape[0]}"]
    for i in range(x.shape[0]):
        lines.append(
            f"{x[i,0]:.9g} {x[i,1]:.9g} {x[i,2]:.9g} "
            f"{q[i,0]:.9g} {q[i,1]:.9g} {q[i,2]:.9g} {q[i,3]:.9g} "
            f"{mass[i]:.9g} {inertia[i,0]:.9g} {inertia[i,1]:.9g} "
            f"{inertia[i,2]:.9g}")
    lines.append(f"{substeps} {max_iterations} {dt} {steps}")
    joints = [j for j in builder._joints
              if j["kind"] == "stretch_bending_twisting"]
    lines.append(f"{len(joints)}")
    for j in joints:
        p = np.asarray(j["positions"], np.float64)
        rad, ym, tm = (float(v) for v in j["directions"])
        ln = float(j["rest"])
        lines.append(f"{j['bodies'][0]} {j['bodies'][1]} "
                     f"{p[0]:.9g} {p[1]:.9g} {p[2]:.9g} "
                     f"{rad:.9g} {ln:.9g} {ym:.9g} {tm:.9g}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def build_strain_scene():
    """Strain-based dynamics: a pinned triangle strip + a small pinned
    tet bar (both families in one scene)."""
    from positionbaseddynamics_tpu.models import SceneBuilder
    from positionbaseddynamics_tpu.models.builders import regular_triangle_grid

    b = SceneBuilder(use_structured_grid=False)
    pts, faces = regular_triangle_grid(4, 3, (0.0, 0.0, 0.0), None,
                                       (1.0, 1.0))
    off = b.add_particles(pts, 1.0)
    b.set_mass(off, 0.0)
    b.set_mass(off + 3, 0.0)
    for (i, j, k) in faces:
        b.add_strain_triangle_constraint(off + i, off + j, off + k,
                                         xx_stiffness=1.0,
                                         yy_stiffness=1.0,
                                         xy_stiffness=0.8)
    tm = b.add_regular_tet_model(4, 2, 2, translation=(0.0, 0.0, 1.0))
    for j in range(2):
        for k in range(2):
            b.set_mass(tm.offset + j * 2 + k, 0.0)
    for (p0, p1, p2, p3) in np.asarray(tm.mesh.tets):
        b.add_strain_tet_constraint(
            tm.offset + p0, tm.offset + p1, tm.offset + p2,
            tm.offset + p3, stretch_stiffness=(1.0, 1.0, 1.0),
            shear_stiffness=(0.9, 0.9, 0.9))
    state, cset = b.build()
    return state, cset, b


def dump_strain(path, state, cset, substeps=5, max_iterations=1,
                dt=0.005, steps=50):
    """Constraints sorted by graph color so the oracle's sequential
    in-place sweep equals the engine's color-batched Gauss-Seidel."""
    x = np.asarray(state.particles.x, np.float64)
    w = np.asarray(state.particles.inv_mass, np.float64)
    mass = np.where(w > 0, 1.0 / np.maximum(w, 1e-30), 0.0)
    lines = ["strain", f"{x.shape[0]}"]
    for i in range(x.shape[0]):
        lines.append(f"{x[i,0]:.9g} {x[i,1]:.9g} {x[i,2]:.9g} "
                     f"{mass[i]:.9g}")
    lines.append(f"{substeps} {max_iterations} {dt} {steps}")
    tb = cset.strain_triangle
    if tb is None:
        lines.append("0")
    else:
        order = np.argsort(np.asarray(tb.color), kind="stable")
        idx = np.asarray(tb.idx)[order]
        sk = np.asarray(tb.stretch_k, np.float64)[order]
        shk = np.asarray(tb.shear_k, np.float64)[order]
        lines.append(f"{len(idx)}")
        for c in range(len(idx)):
            lines.append(f"{idx[c,0]} {idx[c,1]} {idx[c,2]} "
                         f"{sk[c,0]:.9g} {sk[c,1]:.9g} {shk[c,0]:.9g}")
    qb = cset.strain_tetra
    if qb is None:
        lines.append("0")
    else:
        order = np.argsort(np.asarray(qb.color), kind="stable")
        idx = np.asarray(qb.idx)[order]
        sk = np.asarray(qb.stretch_k, np.float64)[order]
        shk = np.asarray(qb.shear_k, np.float64)[order]
        lines.append(f"{len(idx)}")
        for c in range(len(idx)):
            lines.append(
                f"{idx[c,0]} {idx[c,1]} {idx[c,2]} {idx[c,3]} "
                f"{sk[c,0]:.9g} {sk[c,1]:.9g} {sk[c,2]:.9g} "
                f"{shk[c,0]:.9g} {shk[c,1]:.9g} {shk[c,2]:.9g}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def build_shapematch_scene():
    """Two overlapping shape-matching clusters over a particle slab (the
    shared vertices exercise the 1/numClusters division)."""
    from positionbaseddynamics_tpu.models import SceneBuilder

    b = SceneBuilder()
    pts = np.stack(np.meshgrid(np.arange(4) * 0.3, np.arange(2) * 0.3,
                               np.arange(2) * 0.3,
                               indexing="ij"), -1).reshape(-1, 3)
    off = b.add_particles(pts, 1.0)
    b.set_mass(off, 0.0)
    b.set_mass(off + 1, 0.0)
    n_half = 3 * 4    # first three x-layers / last three x-layers
    c0 = [off + i for i in range(n_half)]
    c1 = [off + i for i in range(4, 16)]
    b.add_shape_matching_constraint(c0, stiffness=0.7)
    b.add_shape_matching_constraint(c1, stiffness=0.7)
    state, cset = b.build()
    return state, cset, b, (c0, c1)


def dump_shapematch(path, state, clusters, stiffness=0.7, substeps=5,
                    max_iterations=1, dt=0.005, steps=50):
    x = np.asarray(state.particles.x, np.float64)
    w = np.asarray(state.particles.inv_mass, np.float64)
    mass = np.where(w > 0, 1.0 / np.maximum(w, 1e-30), 0.0)
    lines = ["shapematch", f"{x.shape[0]}"]
    for i in range(x.shape[0]):
        lines.append(f"{x[i,0]:.9g} {x[i,1]:.9g} {x[i,2]:.9g} "
                     f"{mass[i]:.9g}")
    lines.append(f"{substeps} {max_iterations} {dt} {steps}")
    lines.append(f"{len(clusters)}")
    for cl in clusters:
        lines.append(f"{len(cl)} {stiffness:.9g}")
        lines.append(" ".join(str(int(i)) for i in cl))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def build_ptet_scene():
    """One static-ish tet (its verts heavy/pinned mix) + a light
    particle starting inside it — the particle-tet contact family."""
    from positionbaseddynamics_tpu.models import SceneBuilder

    b = SceneBuilder(use_structured_grid=False)
    pts = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.1],
                    [0.1, 0.0, 1.0], [0.35, 1.0, 0.35]])
    tm = b.add_tet_model(pts, np.array([[0, 1, 2, 3]]), mass=2.0)
    b.set_tet_collider(tm, friction=0.15)
    # point-side particle slightly penetrating near the top vertex
    p_off = b.add_particles(np.array([[0.34, 0.55, 0.36]]), 0.5)
    b._pg_colliders.append(dict(offset=p_off, count=1,
                                restitution=0.0, friction=0.1))
    state, cset = b.build()
    pipe = b.build_collision_pipeline()
    return state, cset, pipe


def dump_ptetcontact(path, state, contacts, substeps=5, max_iterations=5,
                     max_iterations_v=5, dt=0.005, steps=1,
                     friction=0.25):
    """Dump the scene + the ENGINE-DETECTED contact row (ref-tet bary of
    the surface point, normal) so both sides solve identical inputs."""
    x = np.asarray(state.particles.x, np.float64)
    w = np.asarray(state.particles.inv_mass, np.float64)
    mass = np.where(w > 0, 1.0 / np.maximum(w, 1e-30), 0.0)
    lines = ["ptetcontact", f"{x.shape[0]}"]
    for i in range(x.shape[0]):
        lines.append(f"{x[i,0]:.9g} {x[i,1]:.9g} {x[i,2]:.9g} "
                     f"{mass[i]:.9g}")
    lines.append(f"{substeps} {max_iterations} {max_iterations_v} "
                 f"{dt} {steps} {friction:.9g}")
    m = np.asarray(contacts.mask) > 0.5
    assert m.sum() == 1, "designed scene must yield exactly one contact"
    r = int(np.nonzero(m)[0][0])
    pidx = int(np.asarray(contacts.particle)[r])
    tv = np.asarray(contacts.tet_verts)[r]
    bary = np.asarray(contacts.bary, np.float64)[r]
    n = np.asarray(contacts.normal, np.float64)[r]
    lines.append(f"{pidx} {tv[0]} {tv[1]} {tv[2]} {tv[3]} "
                 f"{n[0]:.9g} {n[1]:.9g} {n[2]:.9g} "
                 f"{bary[1]:.9g} {bary[2]:.9g} {bary[3]:.9g}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")

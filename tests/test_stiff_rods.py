"""Stretch-bending-twisting rod joints (Deul et al. 2018; reference
``PositionBasedElasticRods.cpp:1136-1363``)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.ops import quaternion as quat
from positionbaseddynamics_tpu.solver import StepConfig, rollout
from positionbaseddynamics_tpu.solver.joints import (darboux_jacobian1,
                                                     darboux_omega)


def _rand_quat(rng):
    q = rng.normal(size=4)
    return jnp.asarray(q / np.linalg.norm(q), jnp.float32)


def test_darboux_jacobian_matches_finite_differences():
    """World-frame angular Jacobians of the Darboux vector: J1 from
    basis application, J0 = -J1 — both checked against central FD of
    ω(q0, q1) under δq = ½(0,εe)⊗q perturbations."""
    rng = np.random.default_rng(0)
    L = 0.37
    for _ in range(5):
        q0, q1 = _rand_quat(rng), _rand_quat(rng)
        j1 = np.asarray(darboux_jacobian1(q0, q1, L))
        eps = 1e-3

        def omega_pert(q0p, q1p):
            return np.asarray(darboux_omega(
                jnp.asarray(q0p / np.linalg.norm(q0p)),
                jnp.asarray(q1p / np.linalg.norm(q1p)), L))

        for k in range(3):
            e = np.zeros(3)
            e[k] = eps
            dq = 0.5 * np.asarray(quat.multiply(
                quat.from_vec(jnp.asarray(e, jnp.float32)), q1))
            fd = (omega_pert(np.asarray(q0), np.asarray(q1) + dq)
                  - omega_pert(np.asarray(q0), np.asarray(q1) - dq)) / (
                      2 * eps)
            np.testing.assert_allclose(j1[:, k], fd, atol=2e-3)

            dq0 = 0.5 * np.asarray(quat.multiply(
                quat.from_vec(jnp.asarray(e, jnp.float32)), q0))
            fd0 = (omega_pert(np.asarray(q0) + dq0, np.asarray(q1))
                   - omega_pert(np.asarray(q0) - dq0, np.asarray(q1))) / (
                       2 * eps)
            np.testing.assert_allclose(-j1[:, k], fd0, atol=2e-3)


def _build_sbt_chain(n_seg=5, seg_len=0.5, radius=0.1, youngs=1e6,
                     torsion=1e6, density=1000.0):
    """Horizontal rod of ``n_seg`` rigid segments along +x, first static —
    the StretchBendingTwistingDemo setup
    (``Demos/StiffRodsDemos/StretchBendingTwistingDemo.cpp``)."""
    b = SceneBuilder()
    mass = density * np.pi * radius**2 * seg_len
    # solid cylinder about its length axis (x): Ix = m r²/2,
    # Iy = Iz = m (3r² + L²)/12
    ix = 0.5 * mass * radius**2
    iyz = mass * (3 * radius**2 + seg_len**2) / 12.0
    for i in range(n_seg):
        b.add_rigid_body(
            x=((i + 0.5) * seg_len, 0.0, 0.0),
            mass=(0.0 if i == 0 else mass), inertia=(ix, iyz, iyz))
    for i in range(n_seg - 1):
        b.add_stretch_bending_twisting_constraint(
            i, i + 1, pos=((i + 1) * seg_len, 0.0, 0.0),
            average_radius=radius, average_segment_length=seg_len,
            youngs_modulus=youngs, torsion_modulus=torsion)
    return b


def test_sbt_chain_stays_connected_and_droops():
    b = _build_sbt_chain(youngs=1e5, torsion=1e5)
    state, cset = b.build()
    cfg = StepConfig(dt=0.005, substeps=5)
    final, _ = jax.jit(lambda s: rollout(s, cset, cfg, 200))(state)
    x = np.asarray(final.rigid.x)
    q = np.asarray(final.rigid.q)
    assert np.isfinite(x).all() and np.isfinite(q).all()
    # static root did not move
    np.testing.assert_allclose(x[0], [0.25, 0.0, 0.0], atol=1e-6)
    # tip drooped under gravity but the rod resists (not free fall)
    t = 200 * 0.005
    free_fall = -0.5 * 9.81 * t * t
    assert free_fall * 0.9 < x[-1, 1] < -1e-3
    # zero-stretch: consecutive connector gaps stay closed
    for i in range(4):
        d3 = np.asarray(quat.to_matrix(jnp.asarray(q[i])))[:, 0]
        c0 = x[i] + 0.25 * d3
        d3n = np.asarray(quat.to_matrix(jnp.asarray(q[i + 1])))[:, 0]
        c1 = x[i + 1] - 0.25 * d3n
        assert np.linalg.norm(c0 - c1) < 0.02


def test_sbt_stiffness_ordering():
    """A stiffer rod droops less — compliance scales with 1/(E·I).
    Sanity anchor: the analytic cantilever tip deflection w L⁴/(8 E I)
    for this rod (r=0.1, L=2.5, ρ=1000) is ~1.9 m at E=1e7 and ~0.019 m
    at E=1e9."""
    tips = []
    for youngs in (1e5, 1e9):
        b = _build_sbt_chain(youngs=youngs, torsion=youngs)
        state, cset = b.build()
        cfg = StepConfig(dt=0.005, substeps=5)
        final, _ = jax.jit(lambda s: rollout(s, cset, cfg, 150))(state)
        tips.append(float(np.asarray(final.rigid.x)[-1, 1]))
    soft, stiff = tips
    assert stiff > soft + 0.05
    assert abs(stiff) < 0.15          # nearly straight at E = 1e9


def test_sbt_twist_resistance():
    """Spin the tip segment about the rod axis: the twist rows resist and
    propagate rotation instead of letting the tip spin freely."""
    b = _build_sbt_chain(n_seg=3, youngs=1e6, torsion=1e6)
    state, cset = b.build()
    import dataclasses
    om = np.zeros((3, 3), np.float32)
    om[2] = (20.0, 0.0, 0.0)         # spin tip about x (rod axis)
    state = dataclasses.replace(
        state, rigid=dataclasses.replace(
            state.rigid, omega=jnp.asarray(om)))
    cfg = StepConfig(dt=0.005, substeps=5, gravity=(0.0, 0.0, 0.0))
    final, _ = jax.jit(lambda s: rollout(s, cset, cfg, 100))(state)
    om_f = np.asarray(final.rigid.omega)
    assert np.isfinite(om_f).all()
    # tip angular speed dropped well below the initial 20 rad/s
    assert np.linalg.norm(om_f[2]) < 15.0


def _build_direct_chain(n_seg=5, seg_len=0.5, radius=0.1, youngs=1e6,
                        torsion=1e6, density=1000.0):
    b = SceneBuilder()
    mass = density * np.pi * radius**2 * seg_len
    ix = 0.5 * mass * radius**2
    iyz = mass * (3 * radius**2 + seg_len**2) / 12.0
    for i in range(n_seg):
        b.add_rigid_body(
            x=((i + 0.5) * seg_len, 0.0, 0.0),
            mass=(0.0 if i == 0 else mass), inertia=(ix, iyz, iyz))
    pos = np.stack([(np.arange(1, n_seg)) * seg_len,
                    np.zeros(n_seg - 1), np.zeros(n_seg - 1)], 1)
    b.add_direct_rod_chain(np.arange(n_seg), pos, radius, seg_len,
                           youngs, torsion)
    return b


def test_direct_rod_chain_matches_iterative_sbt():
    """VERDICT done-criterion: a 5-segment chain solved with the direct
    block-tridiagonal solver matches the iterative SBT joints within
    tolerance once the iterative solver is given enough iterations to
    converge."""
    youngs = 1e6
    cfg_it = StepConfig(dt=0.005, substeps=5, max_iterations=20)
    b_it = _build_sbt_chain(youngs=youngs, torsion=youngs)
    s_it, c_it = b_it.build()
    fin_it, _ = jax.jit(lambda s: rollout(s, c_it, cfg_it, 100))(s_it)

    cfg_d = StepConfig(dt=0.005, substeps=5, max_iterations=1)
    b_d = _build_direct_chain(youngs=youngs, torsion=youngs)
    s_d, c_d = b_d.build()
    fin_d, _ = jax.jit(lambda s: rollout(s, c_d, cfg_d, 100))(s_d)

    x_it = np.asarray(fin_it.rigid.x)
    x_d = np.asarray(fin_d.rigid.x)
    assert np.isfinite(x_d).all()
    np.testing.assert_allclose(x_d, x_it, atol=0.03)


def test_direct_rod_exact_in_one_iteration():
    """The direct solver closes all constraint gaps of the chain in a
    single iteration per substep (the point of the exact factorization):
    connector gaps stay ~zero even with max_iterations=1."""
    b = _build_direct_chain(youngs=1e6, torsion=1e6)
    state, cset = b.build()
    cfg = StepConfig(dt=0.005, substeps=5, max_iterations=1)
    fin, _ = jax.jit(lambda s: rollout(s, cset, cfg, 150))(state)
    x = np.asarray(fin.rigid.x)
    q = np.asarray(fin.rigid.q)
    assert np.isfinite(x).all()
    for i in range(4):
        d3 = np.asarray(quat.to_matrix(jnp.asarray(q[i])))[:, 0]
        c0 = x[i] + 0.25 * d3
        d3n = np.asarray(quat.to_matrix(jnp.asarray(q[i + 1])))[:, 0]
        c1 = x[i + 1] - 0.25 * d3n
        assert np.linalg.norm(c0 - c1) < 5e-3


def test_direct_rod_wilberforce_invariant():
    """Wilberforce-style coupling invariant: a vertical stiff-rod chain
    with a twist impulse conserves energy qualitatively — motion stays
    bounded and no NaN over a long rollout (the Wilberforce scene's
    regime, ``data/scenes/Wilberforce_scene.json``)."""
    import dataclasses as dc
    b = _build_direct_chain(n_seg=8, youngs=1e7, torsion=1e5)
    state, cset = b.build()
    om = np.zeros((8, 3), np.float32)
    om[-1] = (30.0, 0.0, 0.0)
    state = dc.replace(state, rigid=dc.replace(
        state.rigid, omega=jnp.asarray(om)))
    cfg = StepConfig(dt=0.005, substeps=5, gravity=(0.0, 0.0, 0.0))
    fin, _ = jax.jit(lambda s: rollout(s, cset, cfg, 300))(state)
    x = np.asarray(fin.rigid.x)
    om_f = np.asarray(fin.rigid.omega)
    assert np.isfinite(x).all() and np.isfinite(om_f).all()
    # bounded: segments stay near the rod axis, no blow-up
    assert np.abs(x[:, 1:]).max() < 1.0
    assert np.abs(om_f).max() < 100.0


# ---------------------------------------------------------------------------
# Branched trees (DirectRodTreeBatch — the reference's initTree/orderMatrix
# capability, PositionBasedElasticRods.cpp:735-1107)
# ---------------------------------------------------------------------------


def _y_tree_geometry(seg_len=0.5, radius=0.1, density=1000.0):
    """Y-shaped segment tree in the x-y plane: two trunk segments along
    +x (first static), branching at x=1 into two offset branch segments.
    Returns (bodies builder args, edges, joint positions)."""
    mass = density * np.pi * radius**2 * seg_len
    ix = 0.5 * mass * radius**2
    iyz = mass * (3 * radius**2 + seg_len**2) / 12.0
    inertia = (ix, iyz, iyz)
    centers = [
        (0.25, 0.0, 0.0),      # seg0 (static)
        (0.75, 0.0, 0.0),      # seg1
        (1.25, 0.08, 0.0),     # seg2 (upper branch)
        (1.25, -0.08, 0.0),    # seg3 (lower branch)
    ]
    masses = [0.0, mass, mass, mass]
    edges = [(0, 1), (1, 2), (1, 3)]
    positions = [(0.5, 0.0, 0.0), (1.0, 0.0, 0.0), (1.0, 0.0, 0.0)]
    return centers, masses, inertia, edges, positions


def _build_tree_direct(youngs=1e6, torsion=1e6, seg_len=0.5, radius=0.1):
    centers, masses, inertia, edges, positions = _y_tree_geometry(
        seg_len, radius)
    b = SceneBuilder()
    bodies = [b.add_rigid_body(x=c, mass=m, inertia=inertia)
              for c, m in zip(centers, masses)]
    b.add_direct_rod_tree(bodies, edges, positions, radius, seg_len,
                          youngs, torsion)
    return b


def _build_tree_iterative(youngs=1e6, torsion=1e6, seg_len=0.5, radius=0.1):
    centers, masses, inertia, edges, positions = _y_tree_geometry(
        seg_len, radius)
    b = SceneBuilder()
    bodies = [b.add_rigid_body(x=c, mass=m, inertia=inertia)
              for c, m in zip(centers, masses)]
    for (a, c2), pos in zip(edges, positions):
        b.add_stretch_bending_twisting_constraint(
            bodies[a], bodies[c2], pos=pos, average_radius=radius,
            average_segment_length=seg_len, youngs_modulus=youngs,
            torsion_modulus=torsion)
    return b


def test_direct_rod_tree_builds_and_is_exact():
    """A branched Y-tree solved by the dense direct solver closes every
    constraint in one iteration per substep and keeps the static trunk
    root fixed while the branches droop (not free fall)."""
    b = _build_tree_direct(youngs=1e5, torsion=1e5)
    state, cset = b.build()
    assert len(cset.direct_rods) == 1
    assert cset.direct_rods[0].edges.shape == (3, 2)
    cfg = StepConfig(dt=0.005, substeps=5, max_iterations=1)
    fin, _ = jax.jit(lambda s: rollout(s, cset, cfg, 150))(state)
    x = np.asarray(fin.rigid.x)
    assert np.isfinite(x).all()
    np.testing.assert_allclose(x[0], [0.25, 0.0, 0.0], atol=1e-6)
    t = 150 * 0.005
    free_fall = -0.5 * 9.81 * t * t
    # both branch tips drooped but the rod resists
    for tip in (2, 3):
        assert free_fall * 0.9 < x[tip, 1] < -1e-3


def test_direct_rod_tree_matches_iterative_sbt():
    """VERDICT done-criterion: the Y-branch tree solved directly matches
    the converged iterative SBT-joint solve of the same topology."""
    youngs = 1e6
    cfg_it = StepConfig(dt=0.005, substeps=5, max_iterations=20)
    s_it, c_it = _build_tree_iterative(youngs=youngs,
                                      torsion=youngs).build()
    fin_it, _ = jax.jit(lambda s: rollout(s, c_it, cfg_it, 100))(s_it)

    cfg_d = StepConfig(dt=0.005, substeps=5, max_iterations=1)
    s_d, c_d = _build_tree_direct(youngs=youngs, torsion=youngs).build()
    fin_d, _ = jax.jit(lambda s: rollout(s, c_d, cfg_d, 100))(s_d)

    x_it = np.asarray(fin_it.rigid.x)
    x_d = np.asarray(fin_d.rigid.x)
    assert np.isfinite(x_d).all()
    np.testing.assert_allclose(x_d, x_it, atol=0.03)


def _random_tree(n_seg=61, seed=3, seg_len=0.3, radius=0.05,
                 density=1000.0):
    """Random branched segment tree (parent = random earlier segment) —
    big enough to engage the scheduled tree elimination."""
    rng = np.random.default_rng(seed)
    mass = density * np.pi * radius**2 * seg_len
    ix = 0.5 * mass * radius**2
    iyz = mass * (3 * radius**2 + seg_len**2) / 12.0
    inertia = (ix, iyz, iyz)
    centers = [(0.0, 0.0, 0.0)]
    masses = [0.0]
    edges, positions = [], []
    for i in range(1, n_seg):
        parent = int(rng.integers(0, i))
        d = rng.standard_normal(3)
        d /= np.linalg.norm(d)
        joint = np.asarray(centers[parent]) + 0.5 * seg_len * d
        centers.append(tuple(joint + 0.5 * seg_len * d))
        masses.append(mass)
        edges.append((parent, i))
        positions.append(tuple(joint))
    return centers, masses, inertia, edges, positions


def test_direct_rod_tree_scheduled_matches_dense():
    """VERDICT r4 #9: tree-ordered elimination (static-schedule block
    LDLᵀ over the chordal constraint graph) reproduces the dense 6C×6C
    solve on a 60-constraint random branched tree."""
    import dataclasses as dc

    centers, masses, inertia, edges, positions = _random_tree()
    outs = {}
    for mode in ("dense", "tree"):
        b = SceneBuilder()
        bodies = [b.add_rigid_body(x=c, mass=m, inertia=inertia)
                  for c, m in zip(centers, masses)]
        b.add_direct_rod_tree(bodies, edges, positions, 0.05, 0.3,
                              1e6, 1e6)
        state, cset = b.build()
        db = cset.direct_rods[0]
        assert db.schedule is not None
        cset = dc.replace(
            cset, direct_rods=tuple([dc.replace(db, solver=mode)]))
        cfg = StepConfig(dt=0.005, substeps=5, max_iterations=1)
        fin, _ = jax.jit(lambda s, cs=cset: rollout(s, cs, cfg, 40))(
            state)
        outs[mode] = np.asarray(fin.rigid.x)
    assert np.isfinite(outs["tree"]).all()
    # the tree moved (sagging under gravity)
    assert np.abs(outs["tree"] - np.asarray(centers)).max() > 1e-3
    dev = np.abs(outs["tree"] - outs["dense"]).max()
    assert dev < 2e-4, f"scheduled vs dense tree deviation {dev:.2e}"

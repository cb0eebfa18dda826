"""Trajectory parity for the kernel families VERDICT r4 flagged as
unproven: the rigid joint zoo incl. all four motors, the iterative
StretchBendingTwisting rod joint, strain-based dynamics (tri + tet),
and shape matching — against the ACTUAL reference kernels compiled
unmodified from ``/root/reference`` (``parity/parity_runner3.cpp``).
BASELINE.md bar: ≤1e-4 deviation at equal substeps/iterations."""
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference"
BIN = "/tmp/pbd_parity_runner3"


def _build_oracle():
    srcs = [
        "parity/parity_runner3.cpp",
        f"{REF}/PositionBasedDynamics/PositionBasedDynamics.cpp",
        f"{REF}/PositionBasedDynamics/PositionBasedElasticRods.cpp",
        f"{REF}/PositionBasedDynamics/PositionBasedRigidBodyDynamics.cpp",
        f"{REF}/PositionBasedDynamics/TimeIntegration.cpp",
        f"{REF}/PositionBasedDynamics/MathFunctions.cpp",
    ]
    newest = max(os.path.getmtime(s) for s in srcs)
    if os.path.exists(BIN) and os.path.getmtime(BIN) > newest:
        return BIN
    subprocess.run(
        ["g++", "-std=c++17", "-O2", f"-I{REF}",
         f"-I{REF}/extern/eigen", "-o", BIN] + srcs,
        check=True, capture_output=True)
    return BIN


@pytest.fixture(scope="module")
def oracle3():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    return _build_oracle()


def _run(oracle3, scene_file, out_file):
    subprocess.run([oracle3, str(scene_file), str(out_file)], check=True)
    return np.loadtxt(out_file)


JOINT_KINDS = [
    ("hinge", 0.0),
    ("universal", 0.0),
    ("slider", 0.0),
    ("target_position_motor_slider", 0.3),
    ("target_velocity_motor_slider", 0.5),
    ("target_angle_motor_hinge", 0.6),
    ("target_velocity_motor_hinge", 1.5),
]


@pytest.mark.parametrize("kind,target", JOINT_KINDS,
                         ids=[k for k, _ in JOINT_KINDS])
def test_joint_matches_reference(oracle3, tmp_path, kind, target):
    from parity.dump_scene import build_joint_scene, dump_joints
    from positionbaseddynamics_tpu.solver import StepConfig, rollout

    steps = 50
    state, cset, b = build_joint_scene(kind, target=target)
    scene_file = tmp_path / "scene.txt"
    out_file = tmp_path / "out.txt"
    dump_joints(scene_file, state, b, substeps=5, max_iterations=1,
                max_iterations_v=5, dt=0.005, steps=steps)
    ref = _run(oracle3, scene_file, out_file)
    x_ref, q_ref = ref[:, :3], ref[:, 3:]

    cfg = StepConfig(dt=0.005, substeps=5, max_iterations=1,
                     max_iterations_v=5,
                     joint_solver_mode="gauss_seidel")
    final, _ = jax.jit(lambda s: rollout(s, cset, cfg, steps))(state)
    x_us = np.asarray(final.rigid.x, np.float64)
    q_us = np.asarray(final.rigid.q, np.float64)
    # the joint moved the body (non-trivial trajectory)
    assert np.abs(x_us - np.asarray(state.rigid.x)).max() > 1e-4 \
        or np.abs(q_us - np.asarray(state.rigid.q)).max() > 1e-4
    dev = np.abs(x_us - x_ref).max()
    assert dev <= 1e-4, f"{kind}: position deviation {dev:.2e}"
    qdev = np.minimum(np.abs(q_us - q_ref),
                      np.abs(q_us + q_ref)).max()
    assert qdev <= 1e-4, f"{kind}: quaternion deviation {qdev:.2e}"


def test_sbt_rod_matches_reference(oracle3, tmp_path):
    from parity.dump_scene import build_sbt_chain, dump_sbtrod
    from positionbaseddynamics_tpu.solver import StepConfig, rollout

    steps = 50
    state, cset, b = build_sbt_chain(n=5)
    scene_file = tmp_path / "scene.txt"
    out_file = tmp_path / "out.txt"
    dump_sbtrod(scene_file, state, b, substeps=5, max_iterations=1,
                dt=0.005, steps=steps)
    ref = _run(oracle3, scene_file, out_file)
    x_ref, q_ref = ref[:, :3], ref[:, 3:]

    cfg = StepConfig(dt=0.005, substeps=5, max_iterations=1,
                     joint_solver_mode="gauss_seidel")
    final, _ = jax.jit(lambda s: rollout(s, cset, cfg, steps))(state)
    x_us = np.asarray(final.rigid.x, np.float64)
    q_us = np.asarray(final.rigid.q, np.float64)
    assert np.abs(x_us - np.asarray(state.rigid.x)).max() > 1e-3
    dev = np.abs(x_us - x_ref).max()
    assert dev <= 1e-4, f"sbt position deviation {dev:.2e}"
    qdev = np.minimum(np.abs(q_us - q_ref), np.abs(q_us + q_ref)).max()
    assert qdev <= 1e-4, f"sbt quaternion deviation {qdev:.2e}"


def test_strain_matches_reference(oracle3, tmp_path):
    from parity.dump_scene import build_strain_scene, dump_strain
    from positionbaseddynamics_tpu.solver import StepConfig, rollout

    steps = 120
    state, cset, b = build_strain_scene()
    scene_file = tmp_path / "scene.txt"
    out_file = tmp_path / "out.txt"
    dump_strain(scene_file, state, cset, substeps=5, max_iterations=1,
                dt=0.005, steps=steps)
    x_ref = _run(oracle3, scene_file, out_file)

    cfg = StepConfig(dt=0.005, substeps=5, max_iterations=1,
                     solver_mode="gauss_seidel")
    final, _ = jax.jit(lambda s: rollout(s, cset, cfg, steps))(state)
    x_us = np.asarray(final.particles.x, np.float64)
    assert np.abs(x_us - np.asarray(state.particles.x)).max() > 1e-4
    dev = np.abs(x_us - x_ref).max()
    assert dev <= 1e-4, f"strain position deviation {dev:.2e}"


def test_shape_matching_matches_reference(oracle3, tmp_path):
    from parity.dump_scene import build_shapematch_scene, dump_shapematch
    from positionbaseddynamics_tpu.solver import StepConfig, rollout

    steps = 50
    state, cset, b, clusters = build_shapematch_scene()
    scene_file = tmp_path / "scene.txt"
    out_file = tmp_path / "out.txt"
    dump_shapematch(scene_file, state, clusters, stiffness=0.7,
                    substeps=5, max_iterations=1, dt=0.005, steps=steps)
    x_ref = _run(oracle3, scene_file, out_file)

    cfg = StepConfig(dt=0.005, substeps=5, max_iterations=1,
                     solver_mode="gauss_seidel")
    final, _ = jax.jit(lambda s: rollout(s, cset, cfg, steps))(state)
    x_us = np.asarray(final.particles.x, np.float64)
    assert np.abs(x_us - np.asarray(state.particles.x)).max() > 1e-3
    dev = np.abs(x_us - x_ref).max()
    assert dev <= 1e-4, f"shape-matching deviation {dev:.2e}"


def test_particle_tet_contact_matches_reference(oracle3, tmp_path):
    """solve_/velocitySolve_ParticleTetContactConstraint with identical
    detection inputs: frozen-m_x contact point, persisted λ friction."""
    from parity.dump_scene import build_ptet_scene, dump_ptetcontact
    from positionbaseddynamics_tpu.solver import StepConfig, rollout

    state, cset, pipe = build_ptet_scene()
    p = state.particles
    contacts = pipe.detect_solids(p.x, p.v, p.inv_mass)
    scene_file = tmp_path / "scene.txt"
    out_file = tmp_path / "out.txt"
    fric = float(np.asarray(contacts.friction)[
        np.asarray(contacts.mask) > 0.5][0])
    dump_ptetcontact(scene_file, state, contacts, substeps=5,
                     max_iterations=5, max_iterations_v=5, dt=0.005,
                     steps=1, friction=fric)
    ref = _run(oracle3, scene_file, out_file)
    n = np.asarray(state.particles.x).shape[0]
    x_ref, v_ref = ref[:n], ref[n:]

    cfg = StepConfig(dt=0.005, substeps=5, max_iterations=5,
                     max_iterations_v=5)
    final, _ = jax.jit(lambda s: rollout(s, cset, cfg, 1,
                                         pipeline=pipe))(state)
    x_us = np.asarray(final.particles.x, np.float64)
    v_us = np.asarray(final.particles.v, np.float64)
    # the contact pushed the particle (non-trivial)
    assert np.abs(x_us - np.asarray(state.particles.x)).max() > 1e-5
    dev = np.abs(x_us - x_ref).max()
    assert dev <= 1e-4, f"ptet contact position deviation {dev:.2e}"
    vdev = np.abs(v_us - v_ref).max()
    assert vdev <= 1e-3, f"ptet contact velocity deviation {vdev:.2e}"

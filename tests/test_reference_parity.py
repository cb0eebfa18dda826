"""Trajectory parity against the ACTUAL C++ reference kernels.

The oracle (``parity/parity_runner.cpp``) compiles the reference's
``XPBD.cpp`` / ``TimeIntegration.cpp`` / ``MathFunctions.cpp`` verbatim
from ``/root/reference`` (with its vendored Eigen) and steps the dumped
scene with the reference's own substep semantics. BASELINE.md bar:
≤1e-4 position deviation at equal substeps and iteration budget."""
import os
import subprocess

import numpy as np
import pytest

import jax

REF = "/root/reference"
BIN = "/tmp/pbd_parity_runner"


def _build_oracle():
    srcs = [
        "parity/parity_runner.cpp",
        f"{REF}/PositionBasedDynamics/XPBD.cpp",
        f"{REF}/PositionBasedDynamics/TimeIntegration.cpp",
        f"{REF}/PositionBasedDynamics/MathFunctions.cpp",
        f"{REF}/PositionBasedDynamics/PositionBasedDynamics.cpp",
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
def oracle():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    return _build_oracle()


def test_cloth_trajectory_matches_reference(oracle, tmp_path):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from parity.dump_scene import build_cloth, dump
    from positionbaseddynamics_tpu.solver import StepConfig, rollout

    steps = 50
    state, cset = build_cloth(n=10)
    scene_file = tmp_path / "scene.txt"
    out_file = tmp_path / "out.txt"
    dump(scene_file, state, cset, substeps=5, max_iterations=1,
         dt=0.005, steps=steps)
    subprocess.run([oracle, str(scene_file), str(out_file)], check=True)
    x_ref = np.loadtxt(out_file)

    cfg = StepConfig(dt=0.005, substeps=5, max_iterations=1,
                     solver_mode="gauss_seidel")
    final, _ = jax.jit(lambda s: rollout(s, cset, cfg, steps))(state)
    x_us = np.asarray(final.particles.x, np.float64)

    dev = np.abs(x_us - x_ref).max()
    assert dev <= 1e-4, f"max position deviation {dev:.2e} > 1e-4"


def test_parity_deviation_grows_from_exact_start(oracle, tmp_path):
    """Initial conditions are bitwise-comparable: at 0 steps the dump
    round-trips exactly."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from parity.dump_scene import build_cloth, dump

    state, cset = build_cloth(n=6)
    scene_file = tmp_path / "scene.txt"
    out_file = tmp_path / "out.txt"
    dump(scene_file, state, cset, steps=0)
    subprocess.run([oracle, str(scene_file), str(out_file)], check=True)
    x_ref = np.loadtxt(out_file)
    np.testing.assert_allclose(
        x_ref, np.asarray(state.particles.x, np.float64), atol=1e-7)

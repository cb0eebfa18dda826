"""Every headless demo in examples/ runs a short rollout successfully
(the demo-as-integration-test layer, SURVEY §4 — but automated)."""
import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")

DEMOS = [
    ("cloth_demo.py", ["--n", "12", "--steps", "30"]),
    ("cloth_demo.py", ["--n", "10", "--steps", "20", "--method", "2",
                       "--bending", "2"]),
    ("bar_demo.py", ["--dims", "8", "3", "3", "--steps", "30"]),
    ("bar_demo.py", ["--dims", "6", "3", "3", "--steps", "20",
                     "--method", "6"]),
    ("cosserat_rods_demo.py", ["--segments", "20", "--steps", "40"]),
    ("elastic_rods_demo.py", ["--points", "8", "--steps", "40"]),
    ("stiff_rods_demo.py", ["--segments", "6", "--steps", "30"]),
    ("stiff_rods_demo.py", ["--tree", "--steps", "30"]),
    ("sbt_demo.py", ["--segments", "6", "--steps", "30"]),
    ("chain_demo.py", ["--links", "4", "--steps", "40"]),
    ("joint_demo.py", ["--steps", "40"]),
    ("generic_particle_demo.py", ["--n", "8", "--steps", "25"]),
    ("generic_rigidbody_demo.py", ["--steps", "40"]),
    ("rigid_body_collision_demo.py", ["--bodies", "2", "--steps", "40"]),
    ("cloth_collision_demo.py", ["--n", "10", "--steps", "40"]),
    ("deformable_collision_demo.py", ["--steps", "30"]),
    ("coupling_demo.py", ["--n", "8", "--steps", "40"]),
    ("fluid_demo.py", ["--dims", "5", "8", "5", "--steps", "30"]),
]


@pytest.mark.parametrize("script,extra",
                         DEMOS, ids=[f"{s}-{i}" for i, (s, _)
                                     in enumerate(DEMOS)])
def test_demo_runs(script, extra):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, script] + extra, cwd=EXAMPLES,
        capture_output=True, text=True, timeout=420, env=env)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "finite: True" in r.stdout or "steps/s" in r.stdout

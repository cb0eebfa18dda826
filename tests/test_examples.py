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


def _elastic_rod_check(t):
    # Umetani ghost rod: first two points + first ghost pinned; the
    # free tail droops under gravity
    _pins_fixed_and_falls(t, [0, 1])


def _stiffrod_chain_check(t, seg_len=0.5, tol=0.12):
    # direct-solver chain: anchor segment static, consecutive segment
    # COM gaps stay ~seg_len (the solver is EXACT per iteration — no
    # visible stretch), and the free tip droops under gravity
    r = t["rigid"]
    assert np.abs(r[-1, 0] - r[0, 0]).max() < 1e-6
    gaps = np.linalg.norm(np.diff(r[-1], axis=0), axis=-1)
    assert np.abs(gaps - seg_len).max() < tol, gaps
    assert r[-1, -1, 1] < -0.005


def _stiffrod_tree_check(t):
    # Y-tree: root static; both branch tips fall; everything stays
    # within the tree's rest extent of the root
    r = t["rigid"]
    assert np.abs(r[-1, 0] - r[0, 0]).max() < 1e-6
    assert (r[-1, 2:, 1] < r[0, 2:, 1] - 0.002).all()
    assert np.linalg.norm(r[-1] - r[0, 0], axis=-1).max() < 2.0


def _joint_zoo_check(t):
    """JointDemo: 9 (static, dynamic) pairs at y = 0,2,...,16. The
    static bases never move; each joint enforces its own invariant
    (PositionBasedRigidBodyDynamics.cpp:232-914 semantics)."""
    r = t["rigid"]                                # (F, 18, 3)
    f = r.shape[0]
    assert np.abs(r[-1, 0::2] - r[0, 0::2]).max() < 1e-6
    tol = 0.05

    def anchor(i):
        return np.array([0.5, 2.0 * i, 0.0])

    # ball (pair 0), hinge (2), universal (3): COM stays on the 0.5
    # sphere around the (static-side) anchor through the WHOLE run
    for pair in (0, 2, 3):
        d = np.linalg.norm(r[:, 2 * pair + 1] - anchor(pair), axis=-1)
        assert np.abs(d - 0.5).max() < tol, (pair, d.min(), d.max())
    # ball-on-line (1): COM within 0.5+tol of the line y=2, z=0
    dl = np.linalg.norm(r[:, 3, 1:] - np.array([2.0, 0.0]), axis=-1)
    assert dl.max() < 0.5 + tol
    # slider (4, y=8, axis x): off-axis DOFs locked
    assert np.abs(r[:, 9, 1] - 8.0).max() < tol
    assert np.abs(r[:, 9, 2]).max() < tol
    # target-angle motor hinge (5, y=10): sequence swings to 1 rad at
    # t=1 s — the body must actually rotate about the anchor
    rel = r[:, 11] - anchor(5)
    ang = np.unwrap(np.arctan2(rel[:, 1], rel[:, 0]))
    assert np.abs(ang - ang[0]).max() > 0.3, ang
    # velocity motor hinge (6, y=12): 1.5 rad/s — monotonic rotation
    rel = r[:, 13] - anchor(6)
    ang = np.unwrap(np.arctan2(rel[:, 1], rel[:, 0]))
    assert abs(ang[-1] - ang[0]) > 0.8 * (f > 20), (ang[0], ang[-1])
    # position motor slider (7, y=14): reaches >=0.3 along the axis
    assert (r[:, 15, 0] - r[0, 15, 0]).max() > 0.3
    # velocity motor slider (8, y=16): 0.4 m/s along +x
    assert r[-1, 17, 0] - r[0, 17, 0] > 0.25


def _generic_particle_check(t):
    # the demo pins vertices 0 and n-1 of the first grid row (--n 8)
    _pins_fixed_and_falls(t, [0, 7])


def _generic_rigid_check(t):
    # autodiff ball-joint pendulum: base static, bob stays within the
    # 2.0 rest length of the anchor (+slack) and swings down
    r = t["rigid"]
    assert np.abs(r[:, 0]).max() < 1e-6
    assert np.linalg.norm(r[:, 1], axis=-1).max() < 2.1
    assert r[-1, 1, 1] < -0.05


def _deformable_collision_check(t):
    # dynamic FEM bar dropped on a pinned static bar (top face y=0.25):
    # static bar immobile; the dropped bar falls but does NOT tunnel
    # through the obstacle
    x = t["particles"]
    n_bottom = 6 * 2 * 2
    assert np.abs(x[-1, :n_bottom] - x[0, :n_bottom]).max() < 1e-6
    top = x[:, n_bottom:]
    assert top[-1, :, 1].min() < top[0, :, 1].min()      # it fell
    assert top[-1, :, 1].min() > 0.25 - 0.12             # no tunneling


def _fluid_demo_check(t):
    # breaking dam in a (-diam..0.6)^2 box: fluid stays inside the
    # container, collapses downward, spreads sideways
    x = t["particles"]
    assert x[-1, :, 1].min() > -0.15
    assert np.abs(x[-1, :, [0, 2]]).max() < 0.8
    assert x[-1, :, 1].mean() < x[0, :, 1].mean() - 1e-3
    spread = x[:, :, 0].max(-1) - x[:, :, 0].min(-1)
    assert spread[-1] > spread[0] + 0.01


DEMOS = [
    ("cloth_demo.py", ["--n", "12", "--steps", "30"], _cloth_check),
    ("cloth_demo.py", ["--n", "10", "--steps", "20", "--method", "2",
                       "--bending", "2"],
     lambda t: _pins_fixed_and_falls(t, [0, 9])),
    ("bar_demo.py", ["--dims", "8", "3", "3", "--steps", "30"],
     _bar_check),
    ("bar_demo.py", ["--dims", "6", "3", "3", "--steps", "20",
                     "--method", "6"], _bar_check),
    ("cosserat_rods_demo.py", ["--segments", "20", "--steps", "40"],
     _rod_check),
    ("elastic_rods_demo.py", ["--points", "8", "--steps", "40"],
     _elastic_rod_check),
    ("stiff_rods_demo.py", ["--segments", "6", "--steps", "30"],
     _stiffrod_chain_check),
    ("stiff_rods_demo.py", ["--tree", "--steps", "30"],
     _stiffrod_tree_check),
    ("sbt_demo.py", ["--segments", "6", "--steps", "30"],
     lambda t: _stiffrod_chain_check(t, tol=0.15)),
    ("chain_demo.py", ["--links", "4", "--steps", "40"], _chain_check),
    ("joint_demo.py", ["--steps", "300"], _joint_zoo_check),
    ("generic_particle_demo.py", ["--n", "8", "--steps", "25"],
     _generic_particle_check),
    ("generic_rigidbody_demo.py", ["--steps", "40"],
     _generic_rigid_check),
    ("rigid_body_collision_demo.py", ["--bodies", "2", "--steps", "260"],
     _rbcollision_check),
    ("cloth_collision_demo.py", ["--n", "10", "--steps", "40"],
     _clothcollision_check),
    ("deformable_collision_demo.py", ["--steps", "30"],
     _deformable_collision_check),
    ("coupling_demo.py", ["--n", "8", "--steps", "40"], _coupling_check),
    ("fluid_demo.py", ["--dims", "5", "8", "5", "--steps", "30"],
     _fluid_demo_check),
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

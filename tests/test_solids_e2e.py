"""End-to-end deformable-solid tests (BarDemo analogue: cantilever tet bar,
``Demos/BarDemo/main.cpp`` semantics)."""
import numpy as np
import jax
import pytest

from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig, rollout


def build_bar(method=3, stiffness=1e5, w=9, h=3, d=3):
    b = SceneBuilder()
    tm = b.add_regular_tet_model(w, h, d, scale=(2.0, 0.5, 0.5))
    # clamp the x=min face (first height*depth vertices), as BarDemo pins
    # one end of the cantilever.
    for i in range(h * d):
        b.set_mass(tm.offset + i, 0.0)
    b.add_solid_constraints(tm, method=method, stiffness=stiffness,
                            poisson_ratio=0.3, volume_stiffness=stiffness)
    return b.build()


def test_tet_grid_volumes_positive():
    from positionbaseddynamics_tpu.models.builders import regular_tet_grid
    pts, tets = regular_tet_grid(4, 4, 4)
    p = pts[tets]
    vol = np.einsum(
        "cd,cd->c",
        np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), p[:, 3] - p[:, 0],
    ) / 6.0
    assert (vol > 0).all()
    # 5 tets per cell fill the cell exactly
    np.testing.assert_allclose(vol.sum(), 1.0, rtol=1e-5)


@pytest.mark.parametrize("method", [1, 2, 3, 4, 5, 6])
def test_bar_sags_stably(method):
    """All six addSolidConstraints methods (SimulationModel.cpp:1242-1320):
    1=distance+volume, 2=classic FEM, 3=XPBD FEM, 4=strain tet,
    5=shape matching, 6=XPBD distance+volume."""
    stiffness = {1: 1.0, 2: 1e5, 3: 1e5, 4: 1.0, 5: 1.0, 6: 1e5}[method]
    state, cset = build_bar(method=method, stiffness=stiffness, w=5, h=2, d=2)
    cfg = StepConfig()
    final, _ = jax.jit(lambda s: rollout(s, cset, cfg, 100))(state)
    x = np.asarray(final.particles.x)
    x0 = np.asarray(state.particles.x)
    assert np.isfinite(x).all()
    # free end sagged below its initial height (methods 1/6 produce a nearly
    # rigid truss — every tet edge gets a distance constraint — so only the
    # FEM methods droop strongly; all must at least move down and stay stable)
    assert x[-1, 1] < x0[-1, 1] - 5e-4
    assert np.abs(x).max() < 10.0


def test_bar_fem_stiffer_sags_less():
    cfg = StepConfig()
    tips = []
    for E in (1e4, 1e7):
        state, cset = build_bar(method=3, stiffness=E, w=5, h=2, d=2)
        final, _ = jax.jit(lambda s: rollout(s, cset, cfg, 150))(state)
        tips.append(float(np.asarray(final.particles.x)[-1, 1]))
    assert tips[1] > tips[0]  # stiffer bar sags less

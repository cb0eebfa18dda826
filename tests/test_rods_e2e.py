"""End-to-end Cosserat rod tests (CosseratRodsDemo analogue)."""
import numpy as np
import jax
import pytest

from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.ops import quaternion as quat, rods
from positionbaseddynamics_tpu.solver import StepConfig, rollout
import jax.numpy as jnp


def build_rod(n=20, stretch=(1.0, 1.0, 1.0), bend=(0.5, 0.5, 0.5)):
    b = SceneBuilder()
    pts = np.stack([np.linspace(0, 1, n), np.zeros(n), np.zeros(n)], -1)
    lm = b.add_line_model(pts)
    b.set_mass(lm.offset, 0.0)
    b.set_quaternion_mass(lm.offset_q, 0.0)
    b.add_rod_constraints(lm, stretch_stiffness=stretch,
                          bend_twist_stiffness=bend)
    return b.build()


def test_line_model_frames_align_with_segments():
    b = SceneBuilder()
    pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0]], np.float32)
    lm = b.add_line_model(pts)
    state, _ = b.build()
    q = state.orientations.q
    d3 = np.asarray(quat.third_director(q))
    np.testing.assert_allclose(d3[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(d3[1], [0, 1, 0], atol=1e-6)


def test_stretch_shear_at_rest_zero():
    p0 = jnp.array([0.0, 0.0, 0.0])
    p1 = jnp.array([0.0, 0.0, 0.5])
    q0 = quat.identity(())  # d3 = +z, aligned with segment
    c0, c1, cq = rods.solve_stretch_shear(p0, 1.0, p1, 1.0, q0, 1.0,
                                          jnp.ones(3), 0.5)
    np.testing.assert_allclose(np.asarray(c0), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cq), 0.0, atol=1e-6)


def test_bend_twist_at_rest_zero():
    q0 = quat.identity(())
    q1 = quat.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.asarray(0.3))
    rest = rods.rest_darboux(q0, q1)
    cq0, cq1 = rods.solve_bend_twist(q0, 1.0, q1, 1.0, jnp.ones(3), rest)
    np.testing.assert_allclose(np.asarray(cq0), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cq1), 0.0, atol=1e-6)


def test_bend_twist_double_cover_sign():
    # −q represents the same rotation; the sign fix must make the
    # correction magnitude identical.
    q0 = quat.identity(())
    q1 = quat.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.asarray(0.3))
    rest = rods.rest_darboux(q0, q1)
    cq0a, _ = rods.solve_bend_twist(q0, 1.0, -q1, 1.0, jnp.ones(3), rest)
    np.testing.assert_allclose(np.asarray(cq0a), 0.0, atol=1e-5)


@pytest.mark.parametrize("mode", ["jacobi", "gauss_seidel"])
def test_cantilever_rod_droops_stably(mode):
    state, cset = build_rod()
    cfg = StepConfig(solver_mode=mode)
    final, _ = jax.jit(lambda s: rollout(s, cset, cfg, 150))(state)
    x = np.asarray(final.particles.x)
    q = np.asarray(final.orientations.q)
    assert np.isfinite(x).all() and np.isfinite(q).all()
    # clamped end fixed; free end drooped below axis
    np.testing.assert_allclose(x[0], [0, 0, 0], atol=1e-6)
    assert x[-1, 1] < 0.0
    # quaternions stay unit
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-4)
    # rod is nearly inextensible with k_stretch=1
    seg = np.linalg.norm(np.diff(x, axis=0), axis=-1)
    np.testing.assert_allclose(seg, seg[0] * np.ones_like(seg), rtol=0.1)


def test_stiffer_bending_droops_less():
    cfg = StepConfig()
    tips = []
    for ks in (0.05, 0.9):
        state, cset = build_rod(bend=(ks, ks, ks))
        final, _ = jax.jit(lambda s: rollout(s, cset, cfg, 150))(state)
        tips.append(float(np.asarray(final.particles.x)[-1, 1]))
    assert tips[1] > tips[0]

"""Intra-scene sharding: one cloth's particle/constraint axes split over
the 8-device CPU mesh (SURVEY.md §2.6 row 4) — sharded trajectory must
match the single-device stepper."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.parallel.intra import (
    make_intra_sharded_step_fn, pad_state_for_mesh)
from positionbaseddynamics_tpu.solver import StepConfig, make_step_fn


def _cloth(n=16):
    b = SceneBuilder(use_structured_grid=False)
    tm = b.add_regular_triangle_model(n, n)
    b.set_mass(tm.offset, 0.0)
    b.set_mass(tm.offset + n - 1, 0.0)
    b.add_cloth_constraints(tm, method=4, distance_stiffness=1e5)
    b.add_bending_constraints(tm, method=3, stiffness=0.05)
    return b.build()


@pytest.mark.parametrize("n", [16])
def test_sharded_matches_single_device(n):
    state, cset = _cloth(n)            # 256 particles = 8 * 32
    cfg = StepConfig(dt=0.005, substeps=5)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("scene",))

    fn_ref = make_step_fn(cset, cfg)
    fn_sh = make_intra_sharded_step_fn(state, cset, cfg, mesh,
                                       axis="scene")
    s_ref, s_sh = state, pad_state_for_mesh(state, mesh)
    for _ in range(20):
        s_ref = fn_ref(s_ref)
        s_sh = fn_sh(s_sh)
    x_ref = np.asarray(s_ref.particles.x)
    x_sh = np.asarray(s_sh.particles.x)[:x_ref.shape[0]]
    assert np.isfinite(x_sh).all()
    np.testing.assert_allclose(x_sh, x_ref, atol=1e-5)
    v_ref = np.asarray(s_ref.particles.v)
    v_sh = np.asarray(s_sh.particles.v)[:v_ref.shape[0]]
    np.testing.assert_allclose(v_sh, v_ref, atol=1e-3)


def test_sharded_step_is_actually_sharded():
    """The compiled program runs with the particle axis distributed: the
    output sharding of x spans all 8 devices."""
    state, cset = _cloth(16)
    cfg = StepConfig(dt=0.005, substeps=2)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("scene",))
    fn = make_intra_sharded_step_fn(state, cset, cfg, mesh, axis="scene")
    out = fn(pad_state_for_mesh(state, mesh))
    shards = out.particles.x.sharding
    assert len(shards.device_set) == 8

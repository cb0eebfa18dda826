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


# ---------------------------------------------------------------------------
# v2: row-block halo-exchange sharding for structured grid cloth
# (parallel/intra_grid.py)
# ---------------------------------------------------------------------------


def _build_grid_cloth(n=32):
    from positionbaseddynamics_tpu.models import SceneBuilder

    b = SceneBuilder()
    tm = b.add_regular_triangle_model(n, n, scale=(2.0, 2.0))
    b.set_mass(tm.offset, 0.0)
    b.set_mass(tm.offset + n - 1, 0.0)
    b.add_cloth_constraints(tm, method=4, distance_stiffness=1e5)
    b.add_bending_constraints(tm, method=3, stiffness=0.05)
    return b.build()


def test_grid_halo_sharding_matches_single_device():
    """8-way row-block sharded grid cloth == the single-device
    structured-grid stepper, to float tolerance, over 20 steps."""
    import jax
    from jax.sharding import Mesh
    from positionbaseddynamics_tpu.parallel.intra_grid import (
        make_grid_intra_step_fn)
    from positionbaseddynamics_tpu.solver import StepConfig, rollout

    state, cset = _build_grid_cloth(32)
    cfg = StepConfig(dt=0.005, substeps=5, max_iterations=1)
    gc = cset.grid_cloths[0]

    mesh = Mesh(np.array(jax.devices()[:8]), ("scene",))
    fn = make_grid_intra_step_fn(gc, state.particles.inv_mass, cfg, mesh)

    x, v = state.particles.x, state.particles.v
    for _ in range(20):
        x, v = fn(x, v)
    x_sh = np.asarray(x)

    fin, _ = jax.jit(lambda s: rollout(s, cset, cfg, 20))(state)
    x_ref = np.asarray(fin.particles.x)
    assert np.isfinite(x_sh).all()
    # it moved, and matches the single-device structured path
    assert np.abs(x_ref - np.asarray(state.particles.x)).max() > 1e-3
    np.testing.assert_allclose(x_sh, x_ref, atol=2e-5)


def test_grid_halo_sharding_ici_is_o_halo():
    """The compiled sharded step moves only 1-row boundary slices over
    the mesh: every collective-permute operand is (1, W, k) — never the
    O(N) full position array that v1's all_gather moved."""
    import jax
    from jax.sharding import Mesh
    from positionbaseddynamics_tpu.parallel.intra_grid import (
        make_grid_intra_step_fn)
    from positionbaseddynamics_tpu.solver import StepConfig

    state, cset = _build_grid_cloth(32)
    cfg = StepConfig(substeps=2)
    gc = cset.grid_cloths[0]
    mesh = Mesh(np.array(jax.devices()[:8]), ("scene",))
    fn = make_grid_intra_step_fn(gc, state.particles.inv_mass, cfg, mesh)

    txt = jax.jit(fn).lower(state.particles.x,
                            state.particles.v).compile().as_text()
    import re
    assert "all-gather" not in txt
    cps = re.findall(
        r"= f32\[(\d+),(\d+),(\d+)\][^ ]* collective-permute", txt)
    assert cps, "expected collective-permutes in the compiled step"
    for rows, w, k in cps:
        assert int(rows) == 1, f"halo transfer is {rows} rows, wanted 1"


def test_dp_x_intra_2d_mesh_matches_single_device():
    """Composed parallelism (SURVEY §2.6): a (dp=2, scene=4) 2-D mesh —
    rollout batch sharded over dp, grid rows over scene — must equal the
    single-device structured-grid stepper per rollout."""
    import numpy as np
    from jax.sharding import Mesh

    from positionbaseddynamics_tpu.parallel.intra_grid import (
        make_grid_intra_step_fn)
    from positionbaseddynamics_tpu.solver import StepConfig, rollout

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("dp", "scene"))
    n = 16                                  # 16 rows / 4 devices
    state, cset = _build_grid_cloth(n)
    gc = cset.grid_cloths[0]
    cfg = StepConfig(dt=0.005, substeps=2, max_iterations=1)
    fn = make_grid_intra_step_fn(gc, state.particles.inv_mass, cfg, mesh,
                                 axis="scene", dp_axis="dp")

    b = 4
    x0 = jnp.broadcast_to(state.particles.x, (b,) + state.particles.x.shape)
    # perturb each rollout differently
    x0 = x0 + 1e-3 * jnp.arange(b)[:, None, None]
    v0 = jnp.zeros_like(x0)
    xb, vb = x0, v0
    for _ in range(5):
        xb, vb = fn(xb, vb)

    import dataclasses
    for r in range(b):
        st = dataclasses.replace(
            state, particles=dataclasses.replace(
                state.particles, x=x0[r], v=v0[r]))
        fin, _ = jax.jit(lambda s: rollout(s, cset, cfg, 5))(st)
        np.testing.assert_allclose(np.asarray(xb[r]),
                                   np.asarray(fin.particles.x),
                                   atol=5e-6)


def test_pallas_sharded_matches_single_device():
    """The fused Pallas kernel under shard_map (row blocks + ppermute
    halo exchange, parallel/intra_pallas.py) == the single-device fused
    kernel (interpret mode on the virtual CPU mesh)."""
    from positionbaseddynamics_tpu.parallel.intra_pallas import (
        make_pallas_intra_step_fn)
    from positionbaseddynamics_tpu.solver.grid_cloth_pallas import (
        make_pallas_cloth_step)
    from positionbaseddynamics_tpu.solver import StepConfig

    n_dev = 4
    devices = np.asarray(jax.devices()[:n_dev])
    mesh = Mesh(devices, ("scene",))
    n = 48                                   # 12 rows/device >= halo 8
    state, cset = _build_grid_cloth(n)
    gc = cset.grid_cloths[0]
    cfg = StepConfig(dt=0.005, substeps=2, max_iterations=1)

    fn_sh = make_pallas_intra_step_fn(gc, state.particles.inv_mass, cfg,
                                      mesh, axis="scene")
    fn_1 = make_pallas_cloth_step(
        gc, state.particles.inv_mass, gc.inv_cnt_dist, gc.inv_cnt_bend,
        dt=cfg.dt, substeps=cfg.substeps,
        max_iterations=cfg.max_iterations, fuse_substeps=True)

    xs, vs = state.particles.x, state.particles.v
    x1, v1 = state.particles.x, state.particles.v
    for _ in range(5):
        xs, vs = fn_sh(xs, vs)
        x1, v1 = fn_1(x1, v1)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(v1), atol=1e-4)
    # trajectory is nontrivial
    assert np.abs(np.asarray(xs) - np.asarray(state.particles.x)).max() > 1e-3

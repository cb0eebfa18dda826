"""Observability: phase timers (Utils/Timing.h analogue) and loud
capacity-overflow counters (SURVEY §7 fixed-capacity requirement)."""
import numpy as np

import jax.numpy as jnp

from positionbaseddynamics_tpu.fluids.neighborhood import (cell_overflow,
                                                           neighbor_candidates)
from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig
from positionbaseddynamics_tpu.utils.timing import PhaseTimers


def test_phase_timers_report_three_phases():
    b = SceneBuilder()
    tm = b.add_regular_triangle_model(8, 8)
    b.set_mass(tm.offset, 0.0)
    b.add_cloth_constraints(tm, method=4)
    floor = b.add_rigid_body((0, -2.0, 0), mass=0.0)
    b.add_collision_box(floor, (5.0, 0.5, 5.0))
    b.set_particle_collider(tm)
    state, cset = b.build()
    pipe = b.build_collision_pipeline()
    timers = PhaseTimers(cset, StepConfig(), pipe)
    avgs = timers.measure(state, repeats=2)
    assert set(avgs) == {"simulation step",
                         "position constraints projection",
                         "collision detection"}
    assert all(v > 0.0 for v in avgs.values())
    rep = timers.report()
    assert "simulation step" in rep and "ms" in rep


def test_cell_overflow_counts_crowding():
    rng = np.random.default_rng(0)
    # 40 particles crammed into one cell of size 1.0
    x = jnp.asarray(0.4 * rng.random((40, 3)), jnp.float32)
    over = int(cell_overflow(x, radius=1.0, cap_per_cell=12))
    assert over == 40 - 12
    # spread out: no overflow
    x2 = jnp.asarray(np.arange(40)[:, None] * np.array([2.0, 0, 0]),
                     jnp.float32)
    assert int(cell_overflow(x2, radius=1.0, cap_per_cell=12)) == 0


def test_overflow_matches_candidate_truncation():
    """When cell_overflow is zero, neighbor_candidates loses nobody: the
    number of valid candidate slots equals the true neighbor count."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((64, 3)) * 4.0, jnp.float32)
    radius = 0.7
    assert int(cell_overflow(x, radius, cap_per_cell=16)) == 0
    idx, valid = neighbor_candidates(x, radius, cap_per_cell=16)
    got = np.asarray(valid).sum()
    xx = np.asarray(x)
    d = np.linalg.norm(xx[:, None] - xx[None], axis=-1)
    true = ((d < radius) & (d > 0)).sum()
    assert got == true


def test_logger_sinks():
    from positionbaseddynamics_tpu.utils import log
    buf = log.add_buffer_sink()
    log.log_info("hello %s", "world")
    log.log_warn("careful")
    assert any("hello world" in m for m in buf.messages)
    assert any("careful" in m for m in buf.messages)
    log.logger.removeHandler(buf)

"""Planned (sorted-prefix) scatter-add vs XLA native scatter-add."""
import numpy as np

import jax
import jax.numpy as jnp

from positionbaseddynamics_tpu.solver.constraints import (
    make_scatter_plan, scatter_add, scatter_add_planned)


def test_planned_scatter_matches_at_add():
    rng = np.random.default_rng(3)
    n, c, k = 5000, 40000, 4
    idx = rng.integers(0, n, (c, k)).astype(np.int32)
    corr = jnp.asarray(rng.normal(size=(c, k, 3)) * 1e-4, jnp.float32)
    plan = make_scatter_plan(n, idx)
    a = np.asarray(scatter_add(n, jnp.asarray(idx), corr))
    b = np.asarray(scatter_add_planned(plan, corr))
    # two-level tile-local prefixes keep rounding near machine eps of
    # the local sums
    np.testing.assert_allclose(b, a, atol=5e-7)


def test_planned_scatter_empty_segments():
    # vertices with zero contributions must come out exactly zero
    n = 100
    idx = np.array([[2, 3], [2, 5]], np.int32)
    corr = jnp.asarray(np.ones((2, 2, 3)), jnp.float32)
    plan = make_scatter_plan(n, idx)
    out = np.asarray(scatter_add_planned(plan, corr))
    assert out[2, 0] == 2.0 and out[3, 0] == 1.0 and out[5, 0] == 1.0
    assert np.abs(out[[0, 1, 4, 6, 99]]).max() == 0.0

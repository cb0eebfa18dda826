"""Solid–solid (particle–tet) contact: the
``collisionDetectionSolidSolid`` + ``ParticleTetContactConstraint``
pipeline (``DistanceFieldCollisionDetection.cpp:361-470``,
``PositionBasedDynamics.cpp:1172-1340``)."""
import numpy as np

import jax
import jax.numpy as jnp

from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig, make_step_fn


def _two_bars(gap=0.15):
    """A dynamic tet bar dropped onto a static tet bar."""
    b = SceneBuilder()
    bottom = b.add_regular_tet_model(6, 2, 2, translation=(0.0, 0.0, 0.0),
                                     scale=(1.2, 0.25, 0.4))
    for i in range(bottom.mesh.n_vertices):
        b.set_mass(bottom.offset + i, 0.0)
    # narrower + offset so penetrating vertices land strictly inside the
    # bottom bar (a vertex exactly on the target's surface plane has
    # zero surface distance and cannot orient a contact normal)
    top = b.add_regular_tet_model(6, 2, 2,
                                  translation=(0.05, 0.25 + gap, 0.0),
                                  scale=(1.0, 0.25, 0.3))
    b.add_solid_constraints(top, method=3, stiffness=1e5)
    b.set_particle_collider(bottom, restitution=0.0, friction=0.2)
    b.set_particle_collider(top, restitution=0.0, friction=0.2)
    b.set_tet_collider(bottom, restitution=0.0, friction=0.2,
                       sdf_resolution=20, grid_resolution=16)
    b.set_tet_collider(top, restitution=0.0, friction=0.2,
                       sdf_resolution=20, grid_resolution=16)
    state, cset = b.build()
    pipe = b.build_collision_pipeline()
    return state, cset, pipe, bottom, top


def test_solid_pairs_built():
    _, _, pipe, bottom, top = _two_bars()
    assert len(pipe.solid_pairs) == 2          # each model vs the other
    assert pipe.active


def test_ref_tet_grid_lookup():
    """The rest-space tet-lookup grid (findRefTetAt replacement) returns
    a tet actually containing interior query points."""
    state, _, pipe, _, _ = _two_bars()
    (pg, tc) = pipe.solid_pairs[0]
    x0 = np.asarray(state.particles.x)
    rng = np.random.default_rng(0)
    # random points inside the bottom bar's AABB core
    verts = x0[tc.offset:tc.offset + tc.count]
    lo, hi = verts.min(0), verts.max(0)
    pts = lo + (0.2 + 0.6 * rng.random((20, 3))) * (hi - lo)
    tets = np.asarray(tc.lookup_tet(jnp.asarray(pts, jnp.float32)))
    inv_a = np.asarray(tc.rest_inv_a)[tets]
    rx0 = np.asarray(tc.rest_x0)[tets]
    bary = np.einsum("pij,pj->pi", inv_a, pts - rx0)
    err = (np.maximum(0, -bary).sum(1)
           + np.maximum(0, bary.sum(1) - 1.0))
    assert (err < 0.2).all()                   # grid cell quantization


def test_stacked_bars_rest_without_interpenetration():
    state, cset, pipe, bottom, top = _two_bars()
    fn = make_step_fn(cset, StepConfig(dt=0.005, substeps=5), pipe)
    for _ in range(150):
        state = fn(state)
    x = np.asarray(state.particles.x)
    assert np.isfinite(x).all()
    top_x = x[top.offset:top.offset + top.mesh.n_vertices]
    bot_x = x[bottom.offset:bottom.offset + bottom.mesh.n_vertices]
    # statics fixed
    np.testing.assert_allclose(
        bot_x, np.asarray(
            jnp.asarray(np.asarray(state.particles.x0)
                        [bottom.offset:bottom.offset
                         + bottom.mesh.n_vertices])), atol=1e-6)
    # the top bar fell onto the bottom bar and rests on it: its lowest
    # vertices sit near the bottom bar's top surface (y = 0.125), not
    # inside it
    bot_top_y = bot_x[:, 1].max()
    assert top_x[:, 1].min() > bot_top_y - 0.08
    assert top_x[:, 1].min() < bot_top_y + 0.1
    # settled
    v = np.asarray(state.particles.v)
    tv = v[top.offset:top.offset + top.mesh.n_vertices]
    assert np.abs(tv).max() < 1.0


def test_solid_contact_overflow_counter_zero_on_armadillo():
    """The compaction capacity (1024) must cover the armadillo scene's
    actual contacts — the loud counter the buffer promises."""
    import os

    import jax
    import pytest

    scene_path = ("/root/reference/data/scenes/"
                  "ArmadilloCollisionScene.json")
    if not os.path.exists(scene_path):
        pytest.skip("reference scenes unavailable")
    from positionbaseddynamics_tpu.scene import load_scene
    from positionbaseddynamics_tpu.solver import make_step_fn

    s = load_scene(scene_path, cache_dir="/tmp/pbd_tpu_test_sdf_cache",
                   max_sdf_resolution=14)
    fn = make_step_fn(s.cset, s.config, s.pipeline)
    st = s.state
    for _ in range(20):
        st = fn(st)
    jax.block_until_ready(st.particles.x)
    p = st.particles
    c = s.pipeline.detect_solids(p.x, p.v, p.inv_mass)
    assert float(c.overflow) == 0.0
    assert float(jnp.sum(c.mask)) >= 0.0


def test_gated_containing_tet_matches_dense():
    """The tet-block sphere gate + face-block closest-point gate must
    reproduce the dense path's contacts (same containing tets found,
    same contact geometry) on a target large enough to engage gating."""
    import dataclasses as dc

    import jax
    import numpy as np

    from positionbaseddynamics_tpu.models import SceneBuilder

    b = SceneBuilder(use_structured_grid=False)
    # large static target bar (>256 tets engages the gate)
    tgt = b.add_regular_tet_model(14, 8, 8, translation=(0.0, 0.0, 0.0),
                                  scale=(1.4, 0.8, 0.8))
    b.add_solid_constraints(tgt, method=6, stiffness=1e5)
    b.set_tet_collider(tgt)
    b.set_particle_collider(tgt)
    # small penetrating bar above
    top = b.add_regular_tet_model(4, 3, 3, translation=(0.3, 0.7, 0.2),
                                  scale=(0.4, 0.3, 0.3))
    b.add_solid_constraints(top, method=6, stiffness=1e5)
    b.set_tet_collider(top)
    b.set_particle_collider(top)
    state, cset = b.build()
    pipe = b.build_collision_pipeline()
    assert any(tc.tets.shape[0] > 256 for _, tc in pipe.solid_pairs)
    # production thresholds keep armadillo-scale pairs dense (measured
    # faster on TPU); force gating here to prove its correctness
    import positionbaseddynamics_tpu.collision.solid as solid_mod
    monkey_prev = (solid_mod._GATE_MIN_PAIRS,
                   solid_mod._SURF_GATE_MIN_PAIRS)
    solid_mod._GATE_MIN_PAIRS = 0
    solid_mod._SURF_GATE_MIN_PAIRS = 0

    p = state.particles
    # push the top bar down into the target so contacts exist; the
    # jitter breaks grid-aligned ties (equidistant projections are
    # legitimately ambiguous between the paths)
    rng = np.random.default_rng(7)
    x = np.asarray(p.x).copy()
    sl = slice(top.offset, top.offset + top.mesh.n_vertices)
    x[sl, 1] -= 0.353
    x[sl] += rng.uniform(-0.004, 0.004, x[sl].shape)
    x = jnp.asarray(x)

    c_gated = pipe.detect_solids(x, p.v, p.inv_mass)
    # force the dense path by dropping the blocks
    dense_pairs = tuple(
        (pg, dc.replace(tc, tet_blocks=None, surf_blocks=None))
        for pg, tc in pipe.solid_pairs)
    from positionbaseddynamics_tpu.collision.solid import (
        detect_solid_contacts)
    c_dense = detect_solid_contacts(dense_pairs, x, p.v, p.inv_mass)

    assert float(c_gated.overflow) == 0.0
    m_g = np.asarray(c_gated.mask) > 0.5
    m_d = np.asarray(c_dense.mask) > 0.5
    assert m_g.sum() == m_d.sum() and m_g.sum() > 0

    def rows(c, m):
        # physical contact geometry: particle, normal, world contact
        # point (bary-weighted ref-tet verts). Equidistant-face ties can
        # pick different ref tets between the paths; the contact point
        # and response are identical.
        xn = np.asarray(x)
        cp1 = np.einsum("pk,pki->pi",
                        np.asarray(c.bary), xn[np.asarray(c.tet_verts)])
        r = np.concatenate([
            np.asarray(c.particle)[m, None],
            np.round(np.asarray(c.normal)[m], 4),
            np.round(cp1[m], 4),
        ], axis=1)
        return r[np.lexsort(r.T[::-1])]

    np.testing.assert_allclose(rows(c_gated, m_g), rows(c_dense, m_d),
                               atol=2e-3)
    (solid_mod._GATE_MIN_PAIRS,
     solid_mod._SURF_GATE_MIN_PAIRS) = monkey_prev

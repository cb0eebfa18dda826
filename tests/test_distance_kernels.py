"""Point-edge / point-triangle / edge-edge distance kernels
(``PositionBasedDynamics.cpp:239-478``) — the cloth self-collision
capability set."""
import numpy as np

import jax.numpy as jnp

from positionbaseddynamics_tpu.ops import pbd


def test_edge_point_endpoint_region():
    """Reference parametrization: t = d·(p−p1)/|d|², so a point above the
    segment midpoint clamps to the p0 endpoint region (reproduced
    verbatim for parity)."""
    p = jnp.array([0.0, 2.0, 0.0])
    p0 = jnp.array([-1.0, 0.0, 0.0])
    p1 = jnp.array([1.0, 0.0, 0.0])
    corr = np.asarray(pbd.solve_edge_point_distance(
        p, 1.0, p0, 1.0, p1, 1.0, 1.0, 1.0, 1.0))
    # closest (reference convention) = p0; dist √5, C = √5−1, s_den = 2
    n = np.array([1.0, 2.0, 0.0]) / np.sqrt(5)
    s = (np.sqrt(5) - 1.0) / 2.0
    np.testing.assert_allclose(corr[0], -s * n, atol=1e-5)
    np.testing.assert_allclose(corr[1], s * n, atol=1e-5)
    np.testing.assert_allclose(corr[2], 0.0, atol=1e-6)


def test_edge_point_interior_projection():
    """A point whose reference-parametrized projection is interior."""
    p = jnp.array([1.5, 1.0, 0.0])     # beyond p1 → d·(p−p1) > 0
    p0 = jnp.array([-1.0, 0.0, 0.0])
    p1 = jnp.array([1.0, 0.0, 0.0])
    corr = np.asarray(pbd.solve_edge_point_distance(
        p, 1.0, p0, 1.0, p1, 1.0, 0.5, 1.0, 1.0))
    assert np.isfinite(corr).all()
    # the point is pulled toward the edge (C > 0): negative work along n
    assert corr[0] @ (np.asarray(p) - np.array([0.5, 0, 0])) < 0


def test_triangle_point_face_region():
    p = jnp.array([0.0, 2.0, 0.25])
    p0 = jnp.array([-1.0, 0.0, 0.0])
    p1 = jnp.array([1.0, 0.0, 0.0])
    p2 = jnp.array([0.0, 0.0, 1.0])
    corr = np.asarray(pbd.solve_triangle_point_distance(
        p, 1.0, p0, 1.0, p1, 1.0, p2, 1.0, 1.0, 1.0, 1.0))
    # closest point is the in-plane projection (0, 0, 0.25); C = 1
    b = np.array([0.375, 0.375, 0.25])
    s = 1.0 / (1.0 + (b * b).sum())
    np.testing.assert_allclose(corr[0], -s * np.array([0, 1.0, 0]),
                               atol=1e-5)
    np.testing.assert_allclose(corr[1:].sum(0), s * np.array([0, 1.0, 0]),
                               atol=1e-5)


def test_triangle_point_vertex_region():
    p = jnp.array([-2.0, 1.0, -1.0])
    p0 = jnp.array([-1.0, 0.0, 0.0])
    p1 = jnp.array([1.0, 0.0, 0.0])
    p2 = jnp.array([0.0, 0.0, 1.0])
    corr = np.asarray(pbd.solve_triangle_point_distance(
        p, 1.0, p0, 1.0, p1, 1.0, p2, 1.0, 0.5, 1.0, 1.0))
    assert np.isfinite(corr).all()
    # only p and p0 move (closest feature is vertex p0)
    np.testing.assert_allclose(corr[2], 0.0, atol=1e-6)
    np.testing.assert_allclose(corr[3], 0.0, atol=1e-6)
    assert np.linalg.norm(corr[1]) > 1e-4


def test_edge_edge_crossing():
    p0 = jnp.array([-1.0, 0.0, 0.0])
    p1 = jnp.array([1.0, 0.0, 0.0])
    p2 = jnp.array([0.0, 1.0, -1.0])
    p3 = jnp.array([0.0, 1.0, 1.0])
    corr = np.asarray(pbd.solve_edge_edge_distance(
        p0, 1.0, p1, 1.0, p2, 1.0, p3, 1.0, 0.5, 1.0, 1.0))
    # closest pair (0,0,0)-(0,1,0): C = 0.5, equal weights
    np.testing.assert_allclose(corr[0], [0, 0.25, 0], atol=1e-5)
    np.testing.assert_allclose(corr[2], [0, -0.25, 0], atol=1e-5)


def test_edge_edge_parallel_overlap():
    p0 = jnp.array([-1.0, 0.0, 0.0])
    p1 = jnp.array([1.0, 0.0, 0.0])
    p2 = jnp.array([0.0, 1.0, 0.0])
    p3 = jnp.array([2.0, 1.0, 0.0])
    corr = np.asarray(pbd.solve_edge_edge_distance(
        p0, 1.0, p1, 1.0, p2, 1.0, p3, 1.0, 0.5, 1.0, 1.0))
    assert np.isfinite(corr).all()
    # distance 1 > rest 0.5: edges attracted along ±y
    assert corr[0][1] + corr[1][1] > 0.0
    assert corr[2][1] + corr[3][1] < 0.0


def test_compression_vs_stretch_stiffness():
    p = jnp.array([0.0, 0.2, 0.0])
    p0 = jnp.array([-1.0, 0.0, 0.0])
    p1 = jnp.array([1.0, 0.0, 0.0])
    p2 = jnp.array([0.0, 0.0, 1.0])
    # dist < rest → compression branch
    c_comp = np.asarray(pbd.solve_triangle_point_distance(
        p, 1.0, p0, 1.0, p1, 1.0, p2, 1.0, 1.0, 0.5, 1.0))
    c_full = np.asarray(pbd.solve_triangle_point_distance(
        p, 1.0, p0, 1.0, p1, 1.0, p2, 1.0, 1.0, 1.0, 1.0))
    np.testing.assert_allclose(c_comp, 0.5 * c_full, atol=1e-6)

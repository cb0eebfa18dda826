"""SDF bake (collision/bake.py): narrow-band + eikonal pipeline vs the
exact KD-pruned distance, sign correctness, and cache behavior."""
import numpy as np

from positionbaseddynamics_tpu.collision import bake


def _icosphere(r=0.5, n=12):
    """UV-sphere triangle mesh (closed, outward-oriented)."""
    th = np.linspace(0, np.pi, n)
    ph = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    verts = [(0, 0, r)]
    for t in th[1:-1]:
        for p in ph:
            verts.append((r * np.sin(t) * np.cos(p),
                          r * np.sin(t) * np.sin(p), r * np.cos(t)))
    verts.append((0, 0, -r))
    v = np.asarray(verts)
    faces = []
    m = len(ph)
    for j in range(m):
        faces.append((0, 1 + j, 1 + (j + 1) % m))
    rows = n - 2
    for i in range(rows - 1):
        for j in range(m):
            a0 = 1 + i * m + j
            a1 = 1 + i * m + (j + 1) % m
            b0 = 1 + (i + 1) * m + j
            b1 = 1 + (i + 1) * m + (j + 1) % m
            faces.append((a0, b0, a1))
            faces.append((a1, b0, b1))
    last = len(v) - 1
    base = 1 + (rows - 1) * m
    for j in range(m):
        faces.append((last, base + (j + 1) % m, base + j))
    return v, np.asarray(faces, np.int64)


def test_banded_bake_matches_exact_in_band():
    v, f = _icosphere()
    sdf_b, lo, ext = bake.bake_mesh_sdf(v, f, resolution=24)
    sdf_e, _, _ = bake.bake_mesh_sdf(v, f, resolution=24, exact=True)
    assert np.isfinite(sdf_b).all()
    cell = float((ext / (np.array(sdf_b.shape) - 1)).max())
    band = np.abs(sdf_e) < 2 * cell
    assert band.any()
    # band (all contact queries) bit-identical; far field O(cell)
    np.testing.assert_array_equal(sdf_b[band], sdf_e[band])
    assert np.abs(sdf_b - sdf_e)[~band].max() < 1.2 * cell


def test_bake_sign_and_value_vs_analytic_sphere():
    r = 0.5
    v, f = _icosphere(r, n=24)
    sdf, lo, ext = bake.bake_mesh_sdf(v, f, resolution=24)
    res = sdf.shape
    axes = [np.linspace(lo[i], lo[i] + ext[i], res[i]) for i in range(3)]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    rad = np.sqrt(gx**2 + gy**2 + gz**2)
    exact = rad - r
    cell = float((ext / (np.array(res) - 1)).max())
    # mesh faceting + far-field sweep both bounded by ~a cell
    assert np.abs(sdf - exact).max() < 1.5 * cell
    inside = rad < r - 0.5 * cell
    outside = rad > r + 0.5 * cell
    assert (sdf[inside] < 0).all()
    assert (sdf[outside] > 0).all()


def test_grid_parity_matches_pointwise_parity():
    v, f = _icosphere()
    lo = v.min(0) - 0.2
    hi = v.max(0) + 0.2
    axes = [np.linspace(lo[i], hi[i], 10 + i) for i in range(3)]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    per_node = bake._ray_parity_z(pts, v, f).reshape(10, 11, 12)
    per_col = bake._grid_parity_z(v, f, axes)
    np.testing.assert_array_equal(per_col, per_node)


def test_kdtree_distance_matches_bruteforce():
    rng = np.random.default_rng(3)
    v, f = _icosphere(0.4, n=10)
    pts = rng.uniform(-1.0, 1.0, (500, 3))
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    fast = bake._min_dist_kdtree(pts, a, b, c)
    brute = np.full(len(pts), np.inf)
    for s in range(0, len(pts), 128):
        d = bake._point_triangle_distance(pts[s:s + 128], a, b, c)
        brute[s:s + 128] = d.min(axis=1)
    np.testing.assert_array_equal(fast, brute)

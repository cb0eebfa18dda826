"""Offline SDF baking: triangle mesh → dense signed-distance grid.

Replaces the reference's runtime Discregrid dependency
(``Demos/SceneLoaderDemo/SceneLoaderDemo.cpp:212-260``: Discregrid
``TriangleMeshDistance`` → ``CubicLagrangeDiscreteGrid``, MD5-keyed
``.csdf`` cache) with a self-contained numpy baker producing a dense
``(nx, ny, nz)`` float32 array that :class:`..collision.sdf.SDFShape.grid`
interpolates on device. Baking happens once at scene-build time on the
host; the grid is then a read-only replicated array shared by every
rollout scenario (SURVEY §7 "SDF memory").

Unsigned distance = exact point–triangle distance (vectorized, chunked);
sign = ray-crossing parity along +z per grid column (robust for closed
meshes, the same class of meshes Discregrid requires).
"""
from __future__ import annotations

import hashlib
import os

import numpy as np


def _point_triangle_distance(p: np.ndarray, a, b, c) -> np.ndarray:
    """Min distance from points ``p (P, 3)`` to triangles ``a/b/c (T, 3)``
    — broadcast to ``(P, T)`` (Ericson, *Real-Time Collision Detection*
    §5.1.5 closed-form region classification, fully vectorized)."""
    ab = b - a
    ac = c - a
    ap = p[:, None, :] - a[None, :, :]

    d1 = np.einsum("tj,ptj->pt", ab, ap)
    d2 = np.einsum("tj,ptj->pt", ac, ap)

    bp = p[:, None, :] - b[None, :, :]
    d3 = np.einsum("tj,ptj->pt", ab, bp)
    d4 = np.einsum("tj,ptj->pt", ac, bp)

    cp = p[:, None, :] - c[None, :, :]
    d5 = np.einsum("tj,ptj->pt", ab, cp)
    d6 = np.einsum("tj,ptj->pt", ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom = np.maximum(va + vb + vc, 1e-30)
    v = vb / denom
    w = vc / denom
    # interior closest point
    closest = a[None] + v[..., None] * ab[None] + w[..., None] * ac[None]

    # vertex regions
    reg_a = (d1 <= 0) & (d2 <= 0)
    reg_b = (d3 >= 0) & (d4 <= d3)
    reg_c = (d6 >= 0) & (d5 <= d6)
    # edge regions
    t_ab = np.clip(d1 / np.where(d1 - d3 != 0, d1 - d3, 1e-30), 0, 1)
    reg_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    t_ac = np.clip(d2 / np.where(d2 - d6 != 0, d2 - d6, 1e-30), 0, 1)
    reg_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    t_bc = np.clip((d4 - d3) / np.where((d4 - d3) + (d5 - d6) != 0,
                                        (d4 - d3) + (d5 - d6), 1e-30), 0, 1)
    reg_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    closest = np.where(reg_bc[..., None],
                       b[None] + t_bc[..., None] * (c - b)[None], closest)
    closest = np.where(reg_ac[..., None],
                       a[None] + t_ac[..., None] * ac[None], closest)
    closest = np.where(reg_ab[..., None],
                       a[None] + t_ab[..., None] * ab[None], closest)
    closest = np.where(reg_c[..., None], np.broadcast_to(c[None], closest.shape), closest)
    closest = np.where(reg_b[..., None], np.broadcast_to(b[None], closest.shape), closest)
    closest = np.where(reg_a[..., None], np.broadcast_to(a[None], closest.shape), closest)

    d = p[:, None, :] - closest
    return np.sqrt(np.einsum("ptj,ptj->pt", d, d))


def _ray_parity_z(points: np.ndarray, verts, tris) -> np.ndarray:
    """Inside test by +z ray-crossing parity for points ``(P, 3)``."""
    a, b, c = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    inside = np.zeros(points.shape[0], bool)
    # 2D barycentric test in the xy plane, then z-intersection above point
    for start in range(0, points.shape[0], 4096):
        p = points[start:start + 4096]
        ax, ay = a[:, 0][None], a[:, 1][None]
        bx, by = b[:, 0][None], b[:, 1][None]
        cx, cy = c[:, 0][None], c[:, 1][None]
        px, py = p[:, 0][:, None], p[:, 1][:, None]
        d = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
        d = np.where(np.abs(d) < 1e-30, 1e-30, d)
        l1 = ((by - cy) * (px - cx) + (cx - bx) * (py - cy)) / d
        l2 = ((cy - ay) * (px - cx) + (ax - cx) * (py - cy)) / d
        l3 = 1.0 - l1 - l2
        hit = (l1 >= 0) & (l2 >= 0) & (l3 >= 0)
        z = l1 * a[:, 2][None] + l2 * b[:, 2][None] + l3 * c[:, 2][None]
        above = hit & (z > p[:, 2][:, None])
        inside[start:start + 4096] = (above.sum(axis=1) % 2) == 1
    return inside


def bake_mesh_sdf(vertices, triangles, resolution=32, padding=0.2,
                  chunk=2048, tri_chunk=2048):
    """Bake a closed triangle mesh into ``(values, origin, extent)`` for
    :meth:`SDFShape.grid`. ``resolution`` may be an int (longest axis) or a
    3-tuple. ``padding`` is relative AABB padding (reference default SDF
    domains are likewise padded; ``doc/file_format.md`` resolution field)."""
    verts = np.asarray(vertices, np.float64)
    tris = np.asarray(triangles, np.int64).reshape(-1, 3)
    lo = verts.min(axis=0)
    hi = verts.max(axis=0)
    size = hi - lo
    pad = padding * max(float(size.max()), 1e-6)
    lo, hi = lo - pad, hi + pad
    extent = hi - lo

    if np.isscalar(resolution):
        longest = float(extent.max())
        res = np.maximum((extent / longest * resolution).astype(int), 2)
    else:
        res = np.asarray(resolution, int)

    axes = [np.linspace(lo[i], hi[i], res[i]) for i in range(3)]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)

    a, b, c = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    dist = np.full(pts.shape[0], np.inf)
    for s in range(0, pts.shape[0], chunk):
        p = pts[s:s + chunk]
        best = np.full(p.shape[0], np.inf)
        for ts in range(0, tris.shape[0], tri_chunk):
            d = _point_triangle_distance(
                p, a[ts:ts + tri_chunk], b[ts:ts + tri_chunk],
                c[ts:ts + tri_chunk])
            best = np.minimum(best, d.min(axis=1))
        dist[s:s + chunk] = best

    inside = _ray_parity_z(pts, verts, tris)
    sdf = np.where(inside, -dist, dist).astype(np.float32)
    return sdf.reshape(tuple(res)), lo.astype(np.float32), extent.astype(np.float32)


def bake_cache_key(vertices, triangles, resolution, padding) -> str:
    """MD5 content key for bake caching — the same idea as the reference's
    MD5-validated ``.csdf`` cache (``Utils/FileSystem.h:310-353``)."""
    h = hashlib.md5()
    h.update(np.ascontiguousarray(np.asarray(vertices, np.float32)).tobytes())
    h.update(np.ascontiguousarray(np.asarray(triangles, np.int32)).tobytes())
    h.update(repr((resolution, padding)).encode())
    return h.hexdigest()


def bake_mesh_sdf_cached(vertices, triangles, resolution=32, padding=0.2,
                         cache_dir=None):
    """Bake with an on-disk npz cache keyed by mesh content + params."""
    if cache_dir is None:
        return bake_mesh_sdf(vertices, triangles, resolution, padding)
    os.makedirs(cache_dir, exist_ok=True)
    key = bake_cache_key(vertices, triangles, resolution, padding)
    path = os.path.join(cache_dir, f"sdf_{key}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return z["values"], z["origin"], z["extent"]
    values, origin, extent = bake_mesh_sdf(vertices, triangles, resolution, padding)
    np.savez(path, values=values, origin=origin, extent=extent)
    return values, origin, extent

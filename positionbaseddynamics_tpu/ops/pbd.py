"""Classic PBD constraint kernels (stiffness ∈ [0,1], no Lagrange multiplier).

TPU-native re-derivation of ``PositionBasedDynamics/PositionBasedDynamics.cpp``
solve bodies. Single-constraint functions designed for ``jax.vmap``; the
reference's boolean early-outs become ``jnp.where`` masks returning zero
corrections. Each kernel returns the stacked per-particle corrections.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .mathutils import EPS, safe_inv

Array = jax.Array


def solve_distance(p0, w0, p1, w1, rest_length, stiffness):
    """Classic distance constraint: move both ends toward rest length scaled
    by a [0,1] stiffness (``solve_DistanceConstraint``,
    ``PositionBasedDynamics.cpp:13-35``). Returns ``corr (2,3)``.
    """
    w_sum = w0 + w1
    n = p1 - p0
    d = jnp.linalg.norm(n)
    n = n * safe_inv(jnp.maximum(d, 1e-12))

    valid = w_sum > 0.0
    corr = jnp.where(valid, stiffness * (d - rest_length) * safe_inv(w_sum), 0.0) * n
    return jnp.stack([w0 * corr, -w1 * corr])


def solve_dihedral(p0, w0, p1, w1, p2, w2, p3, w3, rest_angle, stiffness):
    """Dihedral-angle bending over triangles (p0,p2,p3) and (p1,p3,p2) with
    shared edge (p2,p3), Bridson-style angle gradients
    (``solve_DihedralConstraint``, ``PositionBasedDynamics.cpp``).
    Returns ``corr (4,3)``.
    """
    e = p3 - p2
    elen = jnp.linalg.norm(e)
    inv_elen = safe_inv(jnp.maximum(elen, EPS))

    n1 = jnp.cross(p2 - p0, p3 - p0)
    n1 = n1 * safe_inv(jnp.maximum(jnp.dot(n1, n1), 1e-24))
    n2 = jnp.cross(p3 - p1, p2 - p1)
    n2 = n2 * safe_inv(jnp.maximum(jnp.dot(n2, n2), 1e-24))

    d0 = elen * n1
    d1 = elen * n2
    d2 = jnp.dot(p0 - p3, e) * inv_elen * n1 + jnp.dot(p1 - p3, e) * inv_elen * n2
    d3 = jnp.dot(p2 - p0, e) * inv_elen * n1 + jnp.dot(p2 - p1, e) * inv_elen * n2

    n1u = n1 * safe_inv(jnp.maximum(jnp.linalg.norm(n1), 1e-12))
    n2u = n2 * safe_inv(jnp.maximum(jnp.linalg.norm(n2), 1e-12))
    dot = jnp.clip(jnp.dot(n1u, n2u), -1.0, 1.0)
    phi = jnp.arccos(dot)

    denom = (
        w0 * jnp.dot(d0, d0) + w1 * jnp.dot(d1, d1)
        + w2 * jnp.dot(d2, d2) + w3 * jnp.dot(d3, d3)
    )
    valid = (elen >= EPS) & (denom != 0.0) & ((w0 > 0.0) | (w1 > 0.0))

    lam = jnp.where(valid, (phi - rest_angle) * safe_inv(denom) * stiffness, 0.0)
    lam = jnp.where(jnp.dot(jnp.cross(n1u, n2u), e) > 0.0, -lam, lam)

    return jnp.stack([-w0 * lam * d0, -w1 * lam * d1, -w2 * lam * d2, -w3 * lam * d3])


def solve_volume(p0, w0, p1, w1, p2, w2, p3, w3, rest_volume, stiffness):
    """Classic tet volume preservation (``solve_VolumeConstraint``,
    ``PositionBasedDynamics.cpp``). Returns ``corr (4,3)``."""
    volume = jnp.dot(jnp.cross(p1 - p0, p2 - p0), p3 - p0) / 6.0

    grad0 = jnp.cross(p1 - p2, p3 - p2)
    grad1 = jnp.cross(p2 - p0, p3 - p0)
    grad2 = jnp.cross(p0 - p1, p3 - p1)
    grad3 = jnp.cross(p1 - p0, p2 - p0)

    denom = (
        w0 * jnp.dot(grad0, grad0) + w1 * jnp.dot(grad1, grad1)
        + w2 * jnp.dot(grad2, grad2) + w3 * jnp.dot(grad3, grad3)
    )
    valid = (stiffness != 0.0) & (jnp.abs(denom) >= EPS)
    lam = jnp.where(valid, stiffness * (volume - rest_volume) * safe_inv(denom), 0.0)

    return jnp.stack([-lam * w0 * grad0, -lam * w1 * grad1, -lam * w2 * grad2, -lam * w3 * grad3])


def solve_isometric_bending(p0, w0, p1, w1, p2, w2, p3, w3, q_mat, stiffness):
    """Classic isometric bending (quadratic energy, no compliance):
    ``Δλ = −k·E / Σ w‖∇E‖²`` (``solve_IsometricBendingConstraint``,
    ``PositionBasedDynamics.cpp:~419``). Stencil order matches the XPBD
    variant: internal ``x = [p2, p3, p0, p1]``. Returns ``corr (4,3)``."""
    xs = jnp.stack([p2, p3, p0, p1])
    ws = jnp.stack([w2, w3, w0, w1])

    energy = 0.5 * jnp.einsum("jk,jd,kd->", q_mat, xs, xs)
    grad = q_mat @ xs

    sum_norm = jnp.sum(ws * jnp.sum(grad * grad, axis=-1))
    valid = jnp.abs(sum_norm) > EPS
    dlam = jnp.where(valid, -stiffness * energy * safe_inv(sum_norm), 0.0)

    corr_internal = dlam * ws[:, None] * grad
    return jnp.stack(
        [corr_internal[2], corr_internal[3], corr_internal[0], corr_internal[1]]
    )


def solve_fem_triangle(p0, w0, p1, w1, p2, w2, area, inv_rest_mat,
                       youngs_x, youngs_y, youngs_shear,
                       poisson_xy, poisson_yx):
    """Orthotropic FEM triangle: St. Venant–Kirchhoff membrane energy with a
    2D rest configuration (``solve_FEMTriangleConstraint``,
    ``PositionBasedDynamics.cpp:843-931``). ``inv_rest_mat`` is the 2×2
    inverse of the projected rest edge matrix (``init_FEMTriangleConstraint``
    ``:806-840``). Returns ``corr (3,3)``."""
    denom = 1.0 - poisson_xy * poisson_yx
    c00 = youngs_x * safe_inv(denom)
    c01 = youngs_x * poisson_yx * safe_inv(denom)
    c11 = youngs_y * safe_inv(denom)
    c10 = youngs_y * poisson_xy * safe_inv(denom)
    c22 = youngs_shear

    # F (3,2) = [p0−p2 | p1−p2] · invRestMat
    dm = jnp.stack([p0 - p2, p1 - p2], axis=1)  # (3,2)
    f = dm @ inv_rest_mat

    # Green strain ε = ½(FᵀF − I₂)
    ftf = f.T @ f
    e00 = 0.5 * (ftf[0, 0] - 1.0)
    e11 = 0.5 * (ftf[1, 1] - 1.0)
    e01 = 0.5 * ftf[0, 1]

    s00 = c00 * e00 + c01 * e11
    s11 = c10 * e00 + c11 * e11
    s01 = c22 * e01
    stress = jnp.array([[s00, s01], [s01, s11]])

    pk = f @ stress
    psi = 0.5 * (e00 * s00 + e11 * s11 + 2.0 * e01 * s01)
    energy = area * psi

    h = area * pk @ inv_rest_mat.T          # (3,2)
    grad0 = h[:, 0]
    grad1 = h[:, 1]
    grad2 = -grad0 - grad1

    denom_g = (w0 * jnp.dot(grad0, grad0) + w1 * jnp.dot(grad1, grad1)
               + w2 * jnp.dot(grad2, grad2))
    valid = jnp.abs(denom_g) > EPS
    s = jnp.where(valid, energy * safe_inv(denom_g), 0.0)
    return jnp.stack([-s * w0 * grad0, -s * w1 * grad1, -s * w2 * grad2])


def _strain_pass(ps, corr, ws, inv_rest, i, j, stretch_k, shear_k,
                 normalize_stretch, normalize_shear):
    """One (i, j) sub-constraint of the strain-based-dynamics solve with
    in-kernel Gauss-Seidel accumulation over the pairs, mirroring the loop
    bodies of ``solve_StrainTriangleConstraint`` / ``solve_StrainTetraConstraint``
    (``PositionBasedDynamics.cpp:590-688, 711-805``)."""
    dim = len(ps) - 1
    cols = [(ps[k + 1] + corr[k + 1]) - (ps[0] + corr[0]) for k in range(dim)]
    p_mat = jnp.stack(cols, axis=1)       # (3, dim)
    fi = p_mat @ inv_rest[:, i]
    fj = p_mat @ inv_rest[:, j]
    sij = jnp.dot(fi, fj)

    ds = [fj * inv_rest[k, i] + fi * inv_rest[k, j] for k in range(dim)]
    if normalize_shear and i != j:
        wi2 = jnp.dot(fi, fi)
        wj2 = jnp.dot(fj, fj)
        wi = jnp.sqrt(jnp.maximum(wi2, 1e-24))
        wj = jnp.sqrt(jnp.maximum(wj2, 1e-24))
        s1 = safe_inv(wi * wj)
        s3 = s1 * s1 * s1
        ds = [s1 * dk - sij * s3 * (wj2 * fi * inv_rest[k, i]
                                    + wi2 * fj * inv_rest[k, j])
              for k, dk in enumerate(ds)]
        sij = sij * s1
    d0 = -ds[0]
    for dk in ds[1:]:
        d0 = d0 - dk
    dall = [d0] + ds

    denom = ws[0] * jnp.dot(d0, d0)
    for k in range(dim):
        denom = denom + ws[k + 1] * jnp.dot(ds[k], ds[k])

    if i == j:
        if normalize_stretch:
            s = jnp.sqrt(jnp.maximum(sij, 0.0))
            lam = 2.0 * s * (s - 1.0) * safe_inv(denom) * stretch_k[i]
        else:
            lam = (sij - 1.0) * safe_inv(denom) * stretch_k[i]
    else:
        lam = sij * safe_inv(denom) * shear_k[i + j - 1]
    lam = jnp.where(jnp.abs(denom) < EPS, 0.0, lam)
    return [c - lam * w * d for c, w, d in zip(corr, ws, dall)]


def solve_strain_triangle(p0, w0, p1, w1, p2, w2, inv_rest_mat,
                          stretch_k, shear_k,
                          normalize_stretch=False, normalize_shear=False):
    """Strain-based dynamics triangle (Müller et al. 2014): three
    sub-constraints S00, S10, S11 with internal Gauss-Seidel accumulation
    (``solve_StrainTriangleConstraint``, ``PositionBasedDynamics.cpp:590-688``).
    ``stretch_k (2,)`` = (xx, yy), ``shear_k (1,)`` = (xy,).
    Returns ``corr (3,3)``."""
    ps = [p0, p1, p2]
    ws = [w0, w1, w2]
    corr = [jnp.zeros(3, p0.dtype) for _ in range(3)]
    for i in range(2):
        for j in range(i + 1):
            corr = _strain_pass(ps, corr, ws, inv_rest_mat, i, j,
                                stretch_k, shear_k,
                                normalize_stretch, normalize_shear)
    return jnp.stack(corr)


def solve_strain_tetra(p0, w0, p1, w1, p2, w2, p3, w3, inv_rest_mat,
                       stretch_k, shear_k,
                       normalize_stretch=False, normalize_shear=False):
    """Strain-based dynamics tetrahedron: six sub-constraints Sij
    (``solve_StrainTetraConstraint``, ``PositionBasedDynamics.cpp:711-805``).
    ``stretch_k (3,)``, ``shear_k (3,)``. Returns ``corr (4,3)``."""
    ps = [p0, p1, p2, p3]
    ws = [w0, w1, w2, w3]
    corr = [jnp.zeros(3, p0.dtype) for _ in range(4)]
    for i in range(3):
        for j in range(i + 1):
            corr = _strain_pass(ps, corr, ws, inv_rest_mat, i, j,
                                stretch_k, shear_k,
                                normalize_stretch, normalize_shear)
    return jnp.stack(corr)


def solve_fem_tetra_classic(p0, w0, p1, w1, p2, w2, p3, w3,
                            rest_volume, inv_rest_mat, youngs, poisson,
                            handle_inversion=True):
    """Classic (non-XPBD) FEM tet: one Newton step on the StVK energy with
    Young's modulus folded into the Lamé parameters
    (``solve_FEMTetraConstraint``, ``PositionBasedDynamics.cpp:1109-1170``).
    Returns ``corr (4,3)``."""
    from . import xpbd as _xpbd

    mu = youngs * 0.5 * safe_inv(1.0 + poisson)
    lame = youngs * poisson * safe_inv(
        (1.0 + poisson) * (1.0 - 2.0 * poisson))
    volume = jnp.dot(jnp.cross(p1 - p0, p2 - p0), p3 - p0) / 6.0

    if handle_inversion:
        u_reg, sig_reg, _ = _xpbd.green_strain_energy(
            p0, p1, p2, p3, inv_rest_mat, rest_volume, mu, lame)
        u_inv, sig_inv, _ = _xpbd.green_strain_energy_inversion(
            p0, p1, p2, p3, inv_rest_mat, rest_volume, mu, lame)
        inverted = volume <= 0.0
        energy = jnp.where(inverted, u_inv, u_reg)
        sigma = jnp.where(inverted, sig_inv, sig_reg)
    else:
        energy, sigma, _ = _xpbd.green_strain_energy(
            p0, p1, p2, p3, inv_rest_mat, rest_volume, mu, lame)

    grad = _xpbd.grad_c_green(rest_volume, inv_rest_mat, sigma)
    ws = jnp.stack([w0, w1, w2, w3])
    denom = jnp.sum(ws * jnp.sum(grad * grad, axis=-1))
    valid = (denom >= EPS) & (youngs > 0.0)
    s = jnp.where(valid, energy * safe_inv(denom), 0.0)
    return -s * ws[:, None] * grad


def solve_shape_matching_cluster(x, x0, w, rest_cm, stiffness, mask):
    """Stateless cluster shape matching via stable polar decomposition —
    the exact formulation of ``solve_ShapeMatchingConstraint``
    (``PositionBasedDynamics.cpp:481-558``): masses ``m = 1/(w + eps)`` (so
    pinned particles act as very heavy anchors), goal ``g = cm + R(x0−cm0)``,
    correction ``(g − x)·k``. ``mask (K,)`` deactivates padded cluster
    slots. Returns ``corr (K,3)``."""
    from .mathutils import polar_decomposition_stable

    m = mask / (w + EPS)
    m_total = jnp.sum(m)
    cm = jnp.sum(m[:, None] * x, axis=0) * safe_inv(m_total)

    p = x - cm
    q0c = x0 - rest_cm
    a_pq = jnp.einsum("k,ki,kj->ij", m, p, q0c)
    # the reference's own scaled-Newton polar iteration with its exact
    # stopping criterion — an SVD-based R differs at ~tolerance scale
    # per call, which compounds past 1e-4 over a 50-step trajectory
    r = polar_decomposition_stable(a_pq)
    goal = cm[None, :] + q0c @ r.T
    return mask[:, None] * stiffness * (goal - x)


def solve_shape_matching(x, x0, w, rest_cm, inv_rest_mat_unused, stiffness, q_prev):
    """Cluster shape matching via rotation extraction (Müller et al.):
    goal positions ``g = R (x0 − cm0) + cm`` applied with stiffness.

    Behavioral equivalent of ``solve_ShapeMatchingConstraint``
    (``PositionBasedDynamics.cpp:501+``) using quaternion warm-started
    rotation extraction. ``x, x0: (K,3)``, ``w: (K,)``.
    Returns ``(corr (K,3), q_new)``.
    """
    from .mathutils import extract_rotation
    from . import quaternion as quat

    # The reference uses true masses; reconstruct m = 1/w for dynamic
    # particles (static particles keep zero weight in the moment sums).
    mass = jnp.where(w > 0.0, 1.0 / jnp.maximum(w, 1e-12), 0.0)
    m_total = jnp.sum(mass)
    cm = jnp.sum(mass[:, None] * x, axis=0) * safe_inv(m_total)

    p = x - cm
    q0c = x0 - rest_cm
    a_pq = jnp.einsum("k,ki,kj->ij", mass, p, q0c)

    q_new = extract_rotation(a_pq, q_prev, iterations=10)
    r = quat.to_matrix(q_new)

    goal = cm[None, :] + q0c @ r.T
    corr = jnp.where((w > 0.0)[:, None], stiffness * (goal - x), 0.0)
    return corr, q_new


def solve_edge_point_distance(p, w, p0, w0, p1, w1, rest_dist,
                              compression_stiffness, stretch_stiffness):
    """Point-vs-edge distance (``solve_EdgePointDistanceConstraint``,
    ``PositionBasedDynamics.cpp:239-289``): keep a point at ``rest_dist``
    from its closest point on the segment, with separate compression /
    stretch stiffness. Returns ``corr (3, 3)`` for (p, p0, p1)."""
    d = p1 - p0
    d2 = jnp.dot(d, d)
    t = jnp.where(d2 < EPS * EPS, 0.5,
                  jnp.clip(jnp.dot(d, p - p1) * safe_inv(
                      jnp.maximum(d2, 1e-30)), 0.0, 1.0))
    q = p0 + d * t
    n = p - q
    dist = jnp.linalg.norm(n)
    n = n * safe_inv(jnp.maximum(dist, 1e-12))
    c = dist - rest_dist
    b0 = 1.0 - t
    b1 = t
    s_den = w + w0 * b0 * b0 + w1 * b1 * b1
    k = jnp.where(c < 0.0, compression_stiffness, stretch_stiffness)
    s = jnp.where(s_den > 0.0, k * c * safe_inv(jnp.maximum(s_den, 1e-30)),
                  0.0)
    return jnp.stack([-s * w * n, s * w0 * b0 * n, s * w1 * b1 * n])


def solve_triangle_point_distance(p, w, p0, w0, p1, w1, p2, w2, rest_dist,
                                  compression_stiffness,
                                  stretch_stiffness):
    """Point-vs-triangle distance
    (``solve_TrianglePointDistanceConstraint``,
    ``PositionBasedDynamics.cpp:291-384``): closest point by barycentric
    region classification. Returns ``corr (4, 3)`` for (p, p0, p1, p2)."""
    d1 = p1 - p0
    d2 = p2 - p0
    pp0 = p - p0
    a = jnp.dot(d1, d1)
    b = jnp.dot(d2, d1)
    cdot = jnp.dot(pp0, d1)
    e = jnp.dot(d2, d2)
    f = jnp.dot(pp0, d2)
    det = a * e - b * b
    inv_det = safe_inv(jnp.where(det != 0.0, det, 1.0))
    s = (cdot * e - b * f) * inv_det
    t = (a * f - cdot * b) * inv_det
    b0 = jnp.where(det != 0.0, 1.0 - s - t, 1.0 / 3.0)
    b1 = jnp.where(det != 0.0, s, 1.0 / 3.0)
    b2 = jnp.where(det != 0.0, t, 1.0 / 3.0)

    def edge_t(pa, pb, pt):
        dd = pb - pa
        dd2 = jnp.dot(dd, dd)
        return jnp.where(dd2 == 0.0, 0.5,
                         jnp.clip(jnp.dot(dd, pt - pa) * safe_inv(
                             jnp.maximum(dd2, 1e-30)), 0.0, 1.0))

    # region edges (evaluated branchlessly, last-writer-wins ordering of
    # the reference's else-if chain)
    t12 = edge_t(p1, p2, p)
    t20 = edge_t(p2, p0, p)
    t01 = edge_t(p0, p1, p)
    on12 = (det != 0.0) & (b0 < 0.0)
    on20 = (det != 0.0) & (b0 >= 0.0) & (b1 < 0.0)
    on01 = (det != 0.0) & (b0 >= 0.0) & (b1 >= 0.0) & (b2 < 0.0)
    b0 = jnp.where(on12, 0.0, jnp.where(on20, t20,
                                        jnp.where(on01, 1.0 - t01, b0)))
    b1 = jnp.where(on12, 1.0 - t12, jnp.where(on20, 0.0,
                                              jnp.where(on01, t01, b1)))
    b2 = jnp.where(on12, t12, jnp.where(on20, 1.0 - t20,
                                        jnp.where(on01, 0.0, b2)))

    q = p0 * b0 + p1 * b1 + p2 * b2
    n = p - q
    dist = jnp.linalg.norm(n)
    n = n * safe_inv(jnp.maximum(dist, 1e-12))
    c = dist - rest_dist
    s_den = w + w0 * b0 * b0 + w1 * b1 * b1 + w2 * b2 * b2
    k = jnp.where(c < 0.0, compression_stiffness, stretch_stiffness)
    ss = jnp.where(s_den > 0.0, k * c * safe_inv(jnp.maximum(s_den, 1e-30)),
                   0.0)
    return jnp.stack([-ss * w * n, ss * w0 * b0 * n, ss * w1 * b1 * n,
                      ss * w2 * b2 * n])


def solve_edge_edge_distance(p0, w0, p1, w1, p2, w2, p3, w3, rest_dist,
                             compression_stiffness, stretch_stiffness):
    """Edge-vs-edge distance (``solve_EdgeEdgeDistanceConstraint``,
    ``PositionBasedDynamics.cpp:386-478``); the degenerate parallel case
    uses the overlap-midpoint rule of the reference. Returns
    ``corr (4, 3)``."""
    d0 = p1 - p0
    d1 = p3 - p2
    a = jnp.dot(d0, d0)
    b = -jnp.dot(d0, d1)
    cc = jnp.dot(d0, d1)
    d = -jnp.dot(d1, d1)
    e = jnp.dot(p2 - p0, d0)
    f = jnp.dot(p2 - p0, d1)
    det = a * d - b * cc
    nondeg = det != 0.0
    inv_det = safe_inv(jnp.where(nondeg, det, 1.0))
    s_nd = (e * d - b * f) * inv_det
    t_nd = (a * f - e * cc) * inv_det

    # parallel case: overlap midpoint along d0
    s0 = jnp.dot(p0, d0)
    s1 = jnp.dot(p1, d0)
    t0 = jnp.dot(p2, d0)
    t1 = jnp.dot(p3, d0)
    flip0 = s0 > s1
    flip1 = t0 > t1
    s0s, s1s = jnp.minimum(s0, s1), jnp.maximum(s0, s1)
    t0s, t1s = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
    disjoint_a = s0s >= t1s
    disjoint_b = t0s >= s1s
    mid = jnp.where(s0s > t0s, 0.5 * (s0s + t1s), 0.5 * (t0s + s1s))
    s_ov = jnp.where(s0s == s1s, 0.5,
                     (mid - s0s) * safe_inv(jnp.where(s1s != s0s,
                                                      s1s - s0s, 1.0)))
    t_ov = jnp.where(t0s == t1s, 0.5,
                     (mid - t0s) * safe_inv(jnp.where(t1s != t0s,
                                                      t1s - t0s, 1.0)))
    s_par = jnp.where(disjoint_a, jnp.where(flip0, 1.0, 0.0),
                      jnp.where(disjoint_b, jnp.where(flip0, 0.0, 1.0),
                                s_ov))
    t_par = jnp.where(disjoint_a, jnp.where(flip1, 0.0, 1.0),
                      jnp.where(disjoint_b, jnp.where(flip1, 1.0, 0.0),
                                t_ov))

    s = jnp.clip(jnp.where(nondeg, s_nd, s_par), 0.0, 1.0)
    t = jnp.clip(jnp.where(nondeg, t_nd, t_par), 0.0, 1.0)

    b0, b1 = 1.0 - s, s
    b2, b3 = 1.0 - t, t
    q0 = p0 * b0 + p1 * b1
    q1 = p2 * b2 + p3 * b3
    n = q0 - q1
    dist = jnp.linalg.norm(n)
    n = n * safe_inv(jnp.maximum(dist, 1e-12))
    c = dist - rest_dist
    s_den = w0 * b0 * b0 + w1 * b1 * b1 + w2 * b2 * b2 + w3 * b3 * b3
    k = jnp.where(c < 0.0, compression_stiffness, stretch_stiffness)
    ss = jnp.where(s_den > 0.0, k * c * safe_inv(jnp.maximum(s_den, 1e-30)),
                   0.0)
    return jnp.stack([-ss * w0 * b0 * n, -ss * w1 * b1 * n,
                      ss * w2 * b2 * n, ss * w3 * b3 * n])

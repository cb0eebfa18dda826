"""Fixed-radius neighbor search — sort-based spatial hashing, jittable.

TPU-native replacement for the reference's
``NeighborhoodSearchSpatialHashing`` (``Simulation/
NeighborhoodSearchSpatialHashing.cpp:89-160``): the reference inserts
particles into a prime-XOR hash map then gathers the 27 surrounding
cells with ``maxNeighbors=60`` / ``maxParticlesPerCell=50`` caps. Here
the hash map becomes a *sort*: hash every particle's cell id, argsort,
and locate each of the 27 neighbor cells with ``searchsorted`` — all
static shapes, no dynamic allocation. Candidates are returned as a
fixed ``(N, 27·cap)`` index array + validity mask; downstream SPH sums
reduce over that axis directly (no compaction pass needed on TPU).

Hash collisions between distinct cells are resolved EXACTLY: candidates
are re-checked against their actual integer cell coordinates (the
reference's ``Hashmap`` does the same through key equality). This
matters — the XOR-of-primes hash collides *systematically* for
mirror-image offsets near the origin (``(-1,y,-1)`` vs ``(1,y,1)``),
which double-counted whole neighbor runs in every SPH sum before the
check was added. A colliding run can still crowd out true candidates
within the per-cell cap (the reference's ``maxParticlesPerCell``
failure mode); ``cell_overflow`` is the loud counter for that.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# the reference's hash primes (NeighborhoodSearchSpatialHashing.h:12-19)
_P1 = jnp.int32(73856093)
_P2 = jnp.int32(19349663)
_P3 = jnp.int32(83492791)


def _cell_hash(cell: Array) -> Array:
    """XOR-of-primes cell hash on int32 cell coords ``(..., 3)``."""
    return (cell[..., 0] * _P1) ^ (cell[..., 1] * _P2) ^ (cell[..., 2] * _P3)


def neighbor_candidates(x: Array, radius, cap_per_cell: int = 12):
    """Candidate neighbor indices within the 27 cells around each point.

    Args:
      x: ``(N, 3)`` positions (fluid + boundary concatenated).
      radius: search radius = cell size (the reference uses the SPH
        support radius as the grid size).
      cap_per_cell: static per-cell candidate cap (reference:
        ``maxParticlesPerCell=50``; ~8 suffices at rest density).

    Returns:
      ``(idx (N, 27·cap), valid (N, 27·cap) bool)`` — ``valid`` already
      includes the ``‖xᵢ−xⱼ‖ < radius`` test and excludes self.
    """
    n = x.shape[0]
    inv = 1.0 / radius
    cell = jnp.floor(x * inv).astype(jnp.int32)
    h = _cell_hash(cell)
    order = jnp.argsort(h)
    h_sorted = h[order]

    # 27 neighbor-cell hashes per particle
    offs = jnp.stack(jnp.meshgrid(*([jnp.arange(-1, 2)] * 3),
                                  indexing="ij"), -1).reshape(27, 3)
    ncell = cell[:, None, :] + offs[None, :, :].astype(jnp.int32)
    nh = _cell_hash(ncell)                       # (N, 27)

    start = jnp.searchsorted(h_sorted, nh)       # (N, 27)
    take = jnp.arange(cap_per_cell, dtype=jnp.int32)
    pos = start[..., None] + take                # (N, 27, cap)
    pos_c = jnp.minimum(pos, n - 1)
    same_hash = h_sorted[pos_c] == nh[..., None]
    in_range = pos < n
    idx_3d = order[pos_c]                        # (N, 27, cap)
    # exact cell check (hash equality is NOT enough: mirror-image
    # offsets collide systematically near the origin and would
    # double-count their runs)
    same_cell = same_hash
    for c in range(3):
        same_cell = same_cell & (cell[:, c][idx_3d]
                                 == ncell[..., c][..., None])
    idx = idx_3d.reshape(n, -1)                  # (N, 27*cap)
    valid = (same_cell & in_range).reshape(n, -1)

    # per-component gathers: a (N, K, 3) vector gather flattens to a
    # 128-lane-padded (N·K, 3) layout in XLA (42× memory at 100k scale)
    dist2 = sum((x[:, c][idx] - x[:, c][:, None]) ** 2 for c in range(3))
    valid = valid & (dist2 < radius * radius)
    valid = valid & (idx != jnp.arange(n, dtype=idx.dtype)[:, None])
    return idx, valid


def cell_overflow(x: Array, radius, cap_per_cell: int = 12) -> Array:
    """Number of particles crowded out by the static ``cap_per_cell``
    limit: ``Σ_cells max(0, occupancy − cap)``. Zero means the capacity
    was sufficient this step — the loud-failure counter SURVEY §7
    requires for every fixed-capacity buffer (the reference's analogue is
    the hard ``maxParticlesPerCell=50`` truncation,
    ``NeighborhoodSearchSpatialHashing.h:27``, which fails silently).
    Cheap (one sort reuse) and jittable; assert on it in tests or poll it
    periodically in production rollouts."""
    inv = 1.0 / radius
    h = _cell_hash(jnp.floor(x * inv).astype(jnp.int32))
    h_sorted = jnp.sort(h)
    first = jnp.searchsorted(h_sorted, h_sorted, side="left")
    last = jnp.searchsorted(h_sorted, h_sorted, side="right")
    occupancy = last - first
    # count each cell once (at its first slot)
    is_first = jnp.arange(h.shape[0]) == first
    over = jnp.maximum(occupancy - cap_per_cell, 0)
    return jnp.sum(jnp.where(is_first, over, 0))

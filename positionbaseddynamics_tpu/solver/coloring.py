"""Greedy graph coloring of constraint batches (host-side, build time).

The reference partitions its constraint list into groups where no two
members share a body, groups solved sequentially and members in parallel
(``SimulationModel::initConstraintGroups``, ``SimulationModel.cpp:1033-1094``,
greedy first-fit over insertion order). We reproduce that per constraint
family: color ids let the projector run an exact colored Gauss-Seidel on TPU
(scatter within a color is conflict-free, hence equivalent to sequential
application), while the Jacobi mode ignores colors entirely.
"""
from __future__ import annotations

import numpy as np


def greedy_color(idx: np.ndarray) -> tuple[np.ndarray, int]:
    """First-fit greedy coloring in row order.

    ``idx (C, k)``: item indices used by each constraint. Two constraints
    conflict iff they share an item. Returns ``(color (C,) int32, n_colors)``.
    """
    idx = np.asarray(idx)
    c = idx.shape[0]
    if c == 0:
        return np.zeros((0,), np.int32), 1
    # Pure-Python ints in the hot loop (arbitrary-precision bitmasks, ~10×
    # faster than per-element numpy indexing for the ~10⁵–10⁶ rows of a
    # large scene; build-time only).
    rows = idx.tolist()
    n_items = int(idx.max()) + 1
    used = [0] * n_items                # bitmask of colors used at each item
    colors = [0] * c
    max_color = 0
    for i, items in enumerate(rows):
        mask = 0
        for it in items:
            mask |= used[it]
        color = 0
        while (mask >> color) & 1:
            color += 1
        colors[i] = color
        if color > max_color:
            max_color = color
        bit = 1 << color
        for it in items:
            used[it] |= bit
    return np.asarray(colors, np.int32), max_color + 1

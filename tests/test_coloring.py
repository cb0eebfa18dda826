"""Greedy graph-coloring validity tests (solver/coloring.py)."""
import numpy as np

from positionbaseddynamics_tpu.solver.coloring import greedy_color


def _assert_valid(idx, colors):
    by_color = {}
    for i, c in enumerate(colors):
        items = by_color.setdefault(int(c), set())
        row = set(int(v) for v in idx[i])
        assert not (items & row), f"color {c} shares items"
        items |= row


def test_chain_coloring_two_colors():
    # A path graph of edges needs exactly 2 colors greedily.
    idx = np.array([(i, i + 1) for i in range(10)])
    colors, n = greedy_color(idx)
    assert n == 2
    _assert_valid(idx, colors)


def test_random_coloring_valid():
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 50, size=(200, 4))
    colors, n = greedy_color(idx)
    assert n == colors.max() + 1
    _assert_valid(idx, colors)


def test_empty():
    colors, n = greedy_color(np.zeros((0, 2), np.int32))
    assert len(colors) == 0 and n == 1

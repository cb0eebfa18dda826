"""Checkpoint / resume: the full sim state is one flat pytree, so
serialization is trivial (SURVEY §5 — the reference has no checkpointing
at all; its closest mechanisms are the x0/q0 snapshot + ``reset()``,
``SimulationModel.cpp:270-304``, and per-frame OBJ export).

npz keeps zero dependencies; for multi-host sharded states use orbax
with the same pytree.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def save_state(path: str, state) -> None:
    """Serialize a :class:`SimState` (or any pytree of arrays) to npz."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez(path, **arrays)


def load_state(path: str, template):
    """Restore a state saved by :func:`save_state`. ``template`` provides
    the pytree structure (e.g. the freshly built state)."""
    z = np.load(path)
    leaves, treedef = jax.tree.flatten(template)
    new = [jnp.asarray(z[f"leaf_{i}"]) for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new)


# (``SimulationModel::reset`` parity lives on the state itself:
# ``SimState.reset()``, ``solver/state.py``.)

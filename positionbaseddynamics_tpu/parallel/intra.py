"""Intra-scene sharding: one big cloth distributed over the device mesh.

SURVEY.md §2.6 row 4 — the "TP" analogue of this engine: instead of
sharding the rollout batch, a *single* scene's work is split across
chips. The decomposition is TPU-first:

* the **particle axis** is sharded for all elementwise phases
  (integration, velocity update) — zero communication;
* each constraint family's **constraint axis** is block-sharded for the
  projection: every shard gathers the full position array
  (``all_gather`` over ICI), solves its constraint block, scatters the
  block's corrections into a full-size buffer, and the per-shard buffers
  are combined with a single ``psum`` — the "λ-reduction collective" of
  SURVEY §2.6. Positions then return to shard-local slices.

One ``all_gather`` + one ``psum`` of the (N, 3) position array per family
pass per iteration; everything else stays local. Supported families:
the XPBD cloth metric set (distance + isometric bending). The sharded
trajectory matches the single-device stepper to float tolerance
(``tests/test_intra_sharding.py``).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver.constraints import ConstraintSet
from ..solver.state import SimState
from ..solver.step import StepConfig
from ..ops import integration

SHARD_AXIS = "scene"


def _pad_rows(a, mult):
    n = a.shape[0]
    pad = (-n) % mult
    if pad == 0:
        return a
    return jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)


def make_intra_sharded_step_fn(state: SimState, cset: ConstraintSet,
                               cfg: StepConfig, mesh: Mesh,
                               axis: str = SHARD_AXIS):
    """Build ``(padded_state) -> padded_state`` where the particle axis of
    every state array is sharded over ``mesh``'s ``axis``. Use
    :func:`pad_state_for_mesh` first; unsupported features (rigid bodies,
    rods, grid cloths, contacts) raise."""
    if (cset.grid_cloths or cset.joints or cset.stretch_shear is not None
            or cset.bend_twist is not None):
        raise NotImplementedError(
            "this generic all_gather path supports unstructured particle "
            "constraint families only; structured grid cloths shard with "
            "O(halo) ICI via parallel.intra_grid.make_grid_intra_step_fn "
            "(build with use_structured_grid=False to force this path)")
    n_dev = mesh.devices.size
    h = cfg.dt / cfg.substeps
    gravity = jnp.asarray(cfg.gravity, jnp.float32)

    # constraint families, block-sharded at solve time (closed over;
    # replicated across shards)
    fams = list(cset.particle_batches())

    def fn(st: SimState) -> SimState:
        p = st.particles
        n = p.x.shape[0]

        x_sharding = NamedSharding(mesh, P(axis))

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(axis), P(axis), P(axis), P(axis)),
                 out_specs=(P(axis), P(axis), P(axis)))
        def sharded_step(x_loc, v_loc, old_loc, w_loc):
            di = jax.lax.axis_index(axis)

            def substep(carry, _):
                x_loc, v_loc = carry
                old = x_loc
                x_loc2, v_loc2 = integration.semi_implicit_euler(
                    h, w_loc, x_loc, v_loc,
                    jnp.broadcast_to(gravity, x_loc.shape))

                # projection: gather -> per-family block solve -> psum
                x_full = jax.lax.all_gather(x_loc2, axis, tiled=True)
                w_full = jax.lax.all_gather(w_loc, axis, tiled=True)
                lams = []
                for name, batch in fams:
                    lam0 = batch.init_lambda()
                    if lam0.size:
                        chunk = (-(-lam0.shape[0] // n_dev))
                        lam0 = jax.lax.dynamic_slice_in_dim(
                            _pad_rows(lam0, n_dev), di * chunk, chunk, 0)
                    lams.append(lam0)
                for _ in range(cfg.max_iterations):
                    for fi, (name, batch) in enumerate(fams):
                        # per-constraint arrays sliced the same way as idx
                        blk = _slice_batch(batch, di, n_dev)
                        corr, new_lam = blk.solve(x_full, w_full,
                                                  lams[fi], h)
                        from ..solver.constraints import scatter_add
                        local = scatter_add(x_full.shape[0], blk.idx, corr)
                        total = jax.lax.psum(local, axis)
                        inv_cnt = cset.jacobi_inv_counts.get(name)
                        if inv_cnt is None:
                            raise ValueError(
                                "build the ConstraintSet with "
                                "with_jacobi_counts() before sharding")
                        x_full = x_full + cfg.jacobi_omega * inv_cnt * total
                        lams[fi] = new_lam

                # back to the local slice
                nloc = x_loc.shape[0]
                x_loc3 = jax.lax.dynamic_slice_in_dim(
                    x_full, di * nloc, nloc, 0)
                v_loc3 = integration.velocity_update_first_order(
                    h, w_loc, x_loc3, old, v_loc2)
                if cfg.damping:
                    v_loc3 = v_loc3 * (1.0 - cfg.damping)
                return (x_loc3, v_loc3), None

            (x_loc, v_loc), _ = jax.lax.scan(
                substep, (x_loc, v_loc), None, length=cfg.substeps)
            return x_loc, v_loc, x_loc

        x, v, old = sharded_step(p.x, p.v, p.old_x, p.inv_mass)
        return dataclasses.replace(
            st, particles=dataclasses.replace(p, x=x, v=v, old_x=old),
            time=st.time + cfg.dt)

    def _slice_batch(batch, di, n_dev):
        c = batch.idx.shape[0]
        pad = (-c) % n_dev
        chunk = (c + pad) // n_dev

        def padslice(a, fill=0):
            if a.shape and a.shape[0] == c:
                a = _pad_rows(a, n_dev)
                return jax.lax.dynamic_slice_in_dim(a, di * chunk, chunk, 0)
            return a

        repl = {}
        for f in dataclasses.fields(batch):
            v = getattr(batch, f.name)
            if f.metadata.get("static") or v is None or not hasattr(
                    v, "shape"):
                continue
            if v.ndim >= 1 and v.shape[0] == c:
                repl[f.name] = padslice(v)
        return dataclasses.replace(batch, **repl)

    return jax.jit(fn)


def pad_state_for_mesh(state: SimState, mesh: Mesh) -> SimState:
    """Pad the particle axis to a device-count multiple (padding
    particles are static: zero inverse mass)."""
    n_dev = mesh.devices.size
    p = state.particles
    n = p.x.shape[0]
    pad = (-n) % n_dev
    if pad == 0:
        return state

    def padx(a, fill=0.0):
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], 0)

    particles = dataclasses.replace(
        p, x=padx(p.x), v=padx(p.v), old_x=padx(p.old_x),
        last_x=padx(p.last_x), x0=padx(p.x0),
        inv_mass=padx(p.inv_mass))
    return dataclasses.replace(state, particles=particles)

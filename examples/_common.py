"""Shared headless-demo harness: jitted rollout + summary print +
optional npz trajectory export (the DemoBase export path,
``Demos/Common/DemoBase.h:78-95``, without the GUI)."""
import argparse
import os
import sys
import time

import numpy as np

# allow running straight from the examples/ directory of a checkout
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# this image's sitecustomize pins jax_platforms to the axon TPU backend;
# honor an explicit JAX_PLATFORMS (e.g. =cpu in the example smoke tests)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass


def demo_args(description, steps=200):
    ap = argparse.ArgumentParser(description=description)
    ap.add_argument("--steps", type=int, default=steps)
    ap.add_argument("--export-npz", default=None,
                    help="save the particle/rigid trajectory to this npz")
    return ap


def simulate(state, cset, cfg, steps, pipeline=None, export_npz=None,
             collect_every=8):
    """Roll out ``steps`` sim steps jitted; print steps/s and return the
    final state. Collects every ``collect_every``-th frame when
    exporting (the reference renders every 8 steps)."""
    import jax
    from positionbaseddynamics_tpu.solver import make_step_fn

    fn = make_step_fn(cset, cfg, pipeline)
    state = jax.block_until_ready(fn(state))      # compile
    frames_x, frames_r = [], []
    t0 = time.perf_counter()
    for i in range(steps):
        state = fn(state)
        if export_npz and i % collect_every == 0:
            if state.particles.x.shape[0]:
                frames_x.append(np.asarray(state.particles.x))
            if state.rigid is not None:
                frames_r.append(np.asarray(state.rigid.x))
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    print(f"{steps} steps in {dt:.2f}s -> {steps / dt:.1f} steps/s")

    finite = True
    if state.particles.x.shape[0]:
        finite &= bool(np.isfinite(np.asarray(state.particles.x)).all())
    if state.rigid is not None:
        finite &= bool(np.isfinite(np.asarray(state.rigid.x)).all())
    print(f"finite: {finite}")
    if not finite:
        sys.exit(1)

    if export_npz:
        out = {}
        if frames_x:
            out["particles"] = np.stack(frames_x)
        if frames_r:
            out["rigid"] = np.stack(frames_r)
        np.savez(export_npz, **out)
        print(f"trajectory saved to {export_npz}")
    return state


def p(label, value):
    print(f"{label}: {value}")

"""Phase timing — the observability layer.

Equivalent of the reference's hierarchical averaging timers
(``Utils/Timing.h:12-100``; ``START_TIMING``/``STOP_TIMING_AVG`` hooked
around "simulation step", "position constraints projection" and
"collision detection" at ``TimeStepController.cpp:77,132,191``). Under
XLA the full step is one fused program, so per-phase times are measured
by compiling each phase as its own jitted function and averaging
block-until-ready wall times over repeated calls — same three phase
names, same averaging semantics.

For kernel-level drill-down use ``jax.profiler.trace`` around
``bench.py`` and inspect in TensorBoard/XProf; these timers are the
cheap always-available summary.
"""
from __future__ import annotations

import time
from typing import Optional

import jax


class PhaseTimers:
    """Average wall-clock per phase, ``Timing::printAverageTimes``
    style."""

    def __init__(self, cset, cfg, pipeline=None):
        from ..solver.step import _substep, step as step_fn

        self._phases = {}

        @jax.jit
        def full(state):
            return step_fn(state, cset, cfg, pipeline)

        self._phases["simulation step"] = full

        h = cfg.dt / cfg.substeps

        @jax.jit
        def projection(state):
            return _substep(state, cset, h, cfg)

        self._phases["position constraints projection"] = projection

        if pipeline is not None and pipeline.active:
            @jax.jit
            def detection(state):
                out = []
                r = state.rigid
                if r is not None and pipeline.rb_pairs:
                    out.append(pipeline.detect_rigid(r))
                p = state.particles
                if r is not None and pipeline.particle_groups:
                    out.append(pipeline.detect_particles(
                        p.x, p.v, p.inv_mass, r))
                if pipeline.solid_pairs:
                    out.append(pipeline.detect_solids(p.x, p.v, p.inv_mass))
                return out

            self._phases["collision detection"] = detection

        self._sums = {k: 0.0 for k in self._phases}
        self._counts = {k: 0 for k in self._phases}

    def measure(self, state, repeats: int = 5):
        """Run each phase ``repeats`` times on ``state`` (after one
        untimed warmup/compile call) and accumulate averages."""
        for name, fn in self._phases.items():
            jax.block_until_ready(fn(state))          # compile/warmup
            t0 = time.perf_counter()
            for _ in range(repeats):
                out = fn(state)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / repeats
            self._sums[name] += dt
            self._counts[name] += 1
        return self.averages()

    def averages(self) -> dict:
        """Phase → average seconds (``printAverageTimes`` analogue)."""
        return {k: (self._sums[k] / self._counts[k] if self._counts[k]
                    else 0.0) for k in self._phases}

    def report(self) -> str:
        lines = ["---- average times ----"]
        for k, v in self.averages().items():
            lines.append(f"  {k}: {1e3 * v:.3f} ms")
        return "\n".join(lines)

"""Sampling-based MPC planners: MPPI and CEM over vmapped XPBD rollouts.

The north-star subsystem (BASELINE.json: "XPBD trajectory-rollout +
sampling-MPC engine"). Everything is a pure jittable function:

* :func:`make_sequence_cost` closes a scene (``ConstraintSet`` +
  ``StepConfig`` + control model + cost terms) into
  ``(state, controls (T, u)) -> (scalar cost, final state)``; the rollout
  is a ``lax.scan`` accumulating running costs in the carry — no
  trajectory materialization.
* :func:`mppi_update` / :func:`cem_update` — one planner iteration over
  ``K`` sampled control sequences (``vmap`` over K; on a device mesh the
  K axis shards as pure DP, see ``parallel/sharding.py``).
* :func:`make_mpc_controller` — receding-horizon driver: plan
  ``plan_iters`` updates, execute the first control, shift the nominal
  sequence. One ``lax.scan`` over environment steps.

MPPI follows the information-theoretic weighting exp(-(J-J*)/λ)
(Williams et al., standard form); CEM refits a diagonal Gaussian to the
elite fraction per iteration.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..solver.constraints import ConstraintSet
from ..solver.step import StepConfig, step

Array = jax.Array


@dataclass(frozen=True)
class MPPIConfig:
    horizon: int = 20
    num_samples: int = 128
    sigma: float = 1.0            # exploration std-dev (per control dim)
    temperature: float = 0.1      # λ in exp(-(J - J*)/λ)
    plan_iters: int = 2           # planner updates per environment step


@dataclass(frozen=True)
class CEMConfig:
    horizon: int = 20
    num_samples: int = 128
    elite_frac: float = 0.1
    init_sigma: float = 1.0
    min_sigma: float = 0.05
    plan_iters: int = 3


def make_sequence_cost(cset: ConstraintSet, cfg: StepConfig, control_model,
                       running_cost: Optional[Callable] = None,
                       terminal_cost: Optional[Callable] = None,
                       pipeline=None):
    """Build ``seq_cost(state, controls) -> (cost, final_state)``."""

    def seq_cost(state, controls):
        def body(carry, u):
            s, acc = carry
            s = control_model.apply(s, u, cfg.dt)
            s = step(s, cset, cfg, pipeline)
            if running_cost is not None:
                acc = acc + running_cost(s, u)
            return (s, acc), None

        (s, acc), _ = jax.lax.scan(body, (state, jnp.float32(0.0)), controls)
        if terminal_cost is not None:
            acc = acc + terminal_cost(s)
        return acc, s

    return seq_cost


# ---------------------------------------------------------------------------
# Planner iterations
# ---------------------------------------------------------------------------


def mppi_update(key, state, nominal: Array, seq_cost, mcfg: MPPIConfig):
    """One MPPI iteration: sample K perturbations, softmin-weight them.
    Returns ``(new_nominal, costs (K,))``."""
    eps = mcfg.sigma * jax.random.normal(
        key, (mcfg.num_samples,) + nominal.shape, nominal.dtype)
    costs = jax.vmap(lambda e: seq_cost(state, nominal + e)[0])(eps)
    beta = jnp.min(costs)
    w = jnp.exp(-(costs - beta) / mcfg.temperature)
    w = w / jnp.maximum(jnp.sum(w), 1e-12)
    return nominal + jnp.einsum("k,k...->...", w, eps), costs


def cem_update(key, state, mean: Array, sigma: Array, seq_cost,
               ccfg: CEMConfig):
    """One CEM iteration: sample, select elites, refit diagonal Gaussian.
    Returns ``(mean, sigma, costs (K,))``."""
    n_elite = max(1, int(ccfg.elite_frac * ccfg.num_samples))
    eps = jax.random.normal(
        key, (ccfg.num_samples,) + mean.shape, mean.dtype)
    samples = mean + sigma * eps
    costs = jax.vmap(lambda s_: seq_cost(state, s_)[0])(samples)
    _, elite_idx = jax.lax.top_k(-costs, n_elite)
    elites = samples[elite_idx]
    mean = jnp.mean(elites, axis=0)
    sigma = jnp.maximum(jnp.std(elites, axis=0), ccfg.min_sigma)
    return mean, sigma, costs


def plan_mppi(key, state, nominal, seq_cost, mcfg: MPPIConfig):
    """``plan_iters`` MPPI updates. Returns ``(nominal, best_cost)``."""
    keys = jax.random.split(key, mcfg.plan_iters)

    def body(nom, k):
        nom, costs = mppi_update(k, state, nom, seq_cost, mcfg)
        return nom, jnp.min(costs)

    nominal, best = jax.lax.scan(body, nominal, keys)
    return nominal, best[-1]


def plan_cem(key, state, mean, seq_cost, ccfg: CEMConfig):
    """``plan_iters`` CEM updates from ``init_sigma``. Returns
    ``(mean, best_cost)``."""
    keys = jax.random.split(key, ccfg.plan_iters)
    sigma0 = jnp.full_like(mean, ccfg.init_sigma)

    def body(carry, k):
        mean, sigma = carry
        mean, sigma, costs = cem_update(k, state, mean, sigma, seq_cost, ccfg)
        return (mean, sigma), jnp.min(costs)

    (mean, _), best = jax.lax.scan(body, (mean, sigma0), keys)
    return mean, best[-1]


# ---------------------------------------------------------------------------
# Receding-horizon controller
# ---------------------------------------------------------------------------


def make_mpc_controller(cset: ConstraintSet, cfg: StepConfig, control_model,
                        running_cost=None, terminal_cost=None,
                        planner: str = "mppi",
                        planner_cfg=None, pipeline=None):
    """Receding-horizon MPC: returns jittable
    ``run(key, state, n_steps) -> (final_state, info)`` where ``info`` has
    per-step ``controls (n_steps, u)``, ``cost (n_steps,)``, and tracked
    particle positions. The nominal sequence warm-starts each step by a
    one-step shift (zero-padded tail)."""
    if planner_cfg is None:
        planner_cfg = MPPIConfig() if planner == "mppi" else CEMConfig()
    seq_cost = make_sequence_cost(cset, cfg, control_model,
                                  running_cost, terminal_cost, pipeline)
    u_dim = control_model.u_dim
    T = planner_cfg.horizon

    plan = plan_mppi if planner == "mppi" else plan_cem

    def run(key, state, n_steps: int):
        nominal0 = jnp.zeros((T, u_dim), jnp.float32)

        def body(carry, k):
            state, nominal = carry
            nominal, best = plan(k, state, nominal, seq_cost, planner_cfg)
            u0 = nominal[0]
            state = control_model.apply(state, u0, cfg.dt)
            state = step(state, cset, cfg, pipeline)
            nominal = jnp.roll(nominal, -1, axis=0).at[-1].set(0.0)
            return (state, nominal), (u0, best)

        keys = jax.random.split(key, n_steps)
        (state, _), (controls, costs) = jax.lax.scan(
            body, (state, nominal0), keys)
        return state, {"controls": controls, "cost": costs}

    return run

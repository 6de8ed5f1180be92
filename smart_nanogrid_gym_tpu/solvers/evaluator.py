"""Policy evaluation flows.

Re-expresses the reference evaluator/predictor scripts (solvers/evaluator.py,
solvers/predictor.py) TPU-natively:

- the reference compares controllers by replaying the *same generated day*
  across models via ``initial_values.json`` round-trips
  (solvers/evaluator.py:89-101, its only fixture mechanism);
  :func:`evaluate_policies_same_days` does the same thing on device: one
  schedule batch is generated once and shared by every policy, so comparisons
  are paired sample-for-sample — no file IO needed;
- the reference predictor rolls a single day per trained model and dumps
  telemetry (solvers/predictor.py:85-94); :func:`predict_single_day` returns
  the full stacked StepInfo telemetry for one day.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import NanogridConfig
from ..core.generate import generate_schedule
from ..core.params import NanogridParams
from ..core.state import StepInfo
from ..core.transition import reset as core_reset, step as core_step


def evaluate_policies_same_days(
    config: NanogridConfig,
    params: NanogridParams,
    policies: dict[str, Callable],
    num_days: int = 100,
    seed: int = 0,
) -> dict[str, np.ndarray]:
    """Evaluate several policies on identical generated days (paired design).

    ``policies`` maps name -> ``policy(obs, key) -> actions`` (vectorized over a
    leading batch axis).  Returns name -> per-day returns array of shape
    (num_days,).  Mirrors the reference evaluator's same-day fairness across
    models (solvers/evaluator.py:89-101) with days as the batch axis.

    Policy-noise keys are derived from ``seed`` (fold-in, decorrelated from the
    day-generation stream), so stochastic policies get fresh noise per distinct
    seed while every policy inside one call still sees identical keys (paired
    design).  Deterministic policies ignore the keys entirely.
    """
    key = jax.random.PRNGKey(seed)
    env_keys = jax.random.split(key, num_days)
    policy_key = jax.random.fold_in(key, 0x9E3779B9)
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (num_days,) + x.shape), params)
    reset_fn = jax.jit(jax.vmap(functools.partial(core_reset, config)))
    states0, obs0 = reset_fn(bparams, env_keys, None, None)

    step_fn = jax.vmap(functools.partial(core_step, config))

    results = {}
    for name, policy in policies.items():

        def body(carry, key_t, policy=policy):
            st, ob = carry
            actions = policy(ob, key_t)
            res = step_fn(bparams, st, actions)
            return (res.state, res.obs), res.reward

        @jax.jit
        def rollout(states, obs):
            keys = jax.random.split(policy_key, config.steps_per_day)
            (_, _), rewards = jax.lax.scan(body, (states, obs), keys)
            return rewards.sum(axis=0)

        results[name] = np.asarray(rollout(states0, obs0))
    return results


def evaluate_policy_at_scale(
    config: NanogridConfig,
    params: NanogridParams,
    net_params,
    num_days: int = 10_000,
    batch: int = 4096,
    seed: int = 0,
    algorithm: str = "ppo",
) -> dict[str, float]:
    """Massive-scale deterministic-actor evaluation in ONE fused TPU kernel.

    Runs ``num_days`` freshly generated days × ``batch`` envs of the trained
    MLP actor closed-loop via :func:`..ops.pallas_gen_policy_rollout.
    pallas_gen_policy_multiday` — the whole-benchmark fusion of the reference's
    evaluate loop (solvers/evaluator.py:13-24 over fresh days), at hundreds of
    millions of env-steps/s.  TPU-only (the in-kernel PRNG has no CPU
    lowering); use :func:`evaluate_policies_same_days` for paired CPU-testable
    comparisons.

    Returns ``{"mean_day_return", "std_day_return", "total_days"}``.
    """
    from ..ops.param_guard import check_baked_params

    # guard eagerly (params stay traced inside the cached jit)
    check_baked_params(config, params, "evaluate_policy_at_scale",
                       generation=True, battery_init=True)
    stats = _at_scale_jit(config, num_days, batch, algorithm)(
        params, net_params, seed)
    total = float(num_days * batch)
    mean = float(stats[0].sum()) / total
    var = float(stats[1].sum()) / total - mean * mean
    return {
        "mean_day_return": mean,
        "std_day_return": float(np.sqrt(max(var, 0.0))),
        "total_days": int(total),
    }


@functools.lru_cache(maxsize=32)
def _at_scale_jit(config: NanogridConfig, num_days: int, batch: int,
                  algorithm: str = "ppo"):
    """One compiled evaluation program per (config, days, batch, algorithm) —
    repeated at-scale calls (checkpoint sweeps) reuse it instead of re-jitting
    a fresh partial every call (which cost seconds of retrace per checkpoint)."""
    from ..ops.pallas_gen_policy_rollout import pallas_gen_policy_multiday

    def run(params, net_params, seed):
        return pallas_gen_policy_multiday(
            config, params, net_params, num_days, seed, batch,
            check_params=False, actor=algorithm,
        )

    return jax.jit(run)


def predict_single_day(
    config: NanogridConfig,
    params: NanogridParams,
    policy: Callable,
    seed: int = 0,
    schedule=None,
    pv_shift: float | None = None,
) -> tuple[np.ndarray, StepInfo]:
    """Roll one day with a policy; returns (per-step rewards, stacked StepInfo).

    The stacked StepInfo carries every telemetry series the reference dumps to
    ``prediction_results.json`` (envs/smart_nanogrid_environment.py:246-275).
    Policy-noise keys derive from ``seed`` (fold-in), so stochastic policies
    get independent noise per distinct seed.
    """
    key = jax.random.PRNGKey(seed)
    policy_key = jax.random.fold_in(key, 0x9E3779B9)
    state, obs = core_reset(config, params, key, schedule=schedule)
    if pv_shift is not None:
        state = state._replace(pv_shift=jnp.asarray(pv_shift, params.dtype))

    def body(carry, key_t):
        st, ob = carry
        actions = policy(ob, key_t)
        res = core_step(config, params, st, actions)
        return (res.state, res.obs), (res.reward, res.info)

    @jax.jit
    def rollout(state, obs):
        keys = jax.random.split(policy_key, config.steps_per_day)
        (_, _), (rewards, infos) = jax.lax.scan(body, (state, obs), keys)
        return rewards, infos

    rewards, infos = rollout(state, obs)
    return np.asarray(rewards), infos

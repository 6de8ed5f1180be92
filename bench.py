"""Benchmark: aggregate env-steps/s of the TPU-native engine.

Measures the BASELINE.json headline metric — env-steps/s with 4096 vectorized
envs — on the default reference configuration (8 chargers, PV + battery, 1h,
sparse penalties; reference ctor defaults, envs/smart_nanogrid_environment.py:32-34)
running the RBC policy closed-loop fully on device.  Each timed iteration
includes a fresh day-schedule generation + reset + a full 24-step day, matching
what the reference does per episode (generate_new_initial_values=True path).

Baseline: the reference pure-Python env measured in this container at
1,699 steps/s (single env, 8ch b-pv, including its per-episode day generation
and JSON telemetry dumps — solvers/RL training drives exactly that loop).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import functools
import json
import time

import jax

# Persistent compile cache: the fused multi-day program takes minutes to build
# over the tunneled-TPU toolchain on first compile; cached runs start in seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from smart_nanogrid_gym_tpu.core import NanogridConfig, make_params
from smart_nanogrid_gym_tpu.core.rollout import fused_day_rollout
from smart_nanogrid_gym_tpu.core.transition import reset as core_reset
from smart_nanogrid_gym_tpu.solvers.rbc import rbc_policy

REFERENCE_STEPS_PER_SEC = 1699.0  # measured in this container, see module docstring

BATCH = 4096
DAYS_PER_CALL = 50   # amortize per-dispatch latency, like a real training loop
NUM_CALLS_TIMED = 4


def main():
    config = NanogridConfig(
        num_chargers=8,
        pv_system=True,
        battery_system=True,
        penalty_mode="sparse",
        time_interval=1.0,
    )
    params = make_params(config, dtype=jnp.float32)
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (BATCH,) + x.shape), params)
    T = config.steps_per_day

    reset_fn = jax.vmap(functools.partial(core_reset, config))
    policy = jax.vmap(functools.partial(rbc_policy, config))

    @jax.jit
    def run_days(i):
        """DAYS_PER_CALL fresh days per env: generate + reset + closed-loop RBC."""

        def day(carry, j):
            keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(0), i * 1000 + j), BATCH)
            states, _ = reset_fn(bparams, keys, None, None)
            _, (_, rewards, _) = fused_day_rollout(
                config, bparams, states, lambda ob, k: policy(ob),
                jax.random.fold_in(jax.random.PRNGKey(1), j),
            )
            return carry, rewards.sum(axis=0).mean()

        _, day_returns = jax.lax.scan(day, 0, jnp.arange(DAYS_PER_CALL))
        return day_returns.mean()

    # warmup / compile
    run_days(0).block_until_ready()

    n_steps = 0
    t0 = time.perf_counter()
    for i in range(NUM_CALLS_TIMED):
        run_days(i).block_until_ready()
        n_steps += BATCH * T * DAYS_PER_CALL
    elapsed = time.perf_counter() - t0

    steps_per_sec = n_steps / elapsed
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip_4096envs",
                "value": round(steps_per_sec, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

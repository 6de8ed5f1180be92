"""Randomized-configuration exactness fuzzing vs the live reference.

test_exactness.py pins hand-picked configurations; this sweep samples the
*full* supported configuration cross-product (price models 0-4, 1-8 chargers,
pv/battery/v2x, capacity/requested-SoC toggles, all four penalty modes, both
working intervals — SURVEY.md §5.6) with random action sequences, and requires
the TPU engine to match the live reference oracle to 1e-9 on every
observation and reward.  The draw is seeded, so each CI run replays the same
configurations; bumping ``FUZZ_ROUNDS`` widens the sweep locally.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle
from smart_nanogrid_gym_tpu.core import NanogridConfig, make_params, schedule_from_arrays
from smart_nanogrid_gym_tpu.core.transition import reset as core_reset, step as core_step
from test_exactness import assert_trajectories_match, run_pair

FUZZ_ROUNDS = 32
CONTINUATION_ROUNDS = 8
MASTER_SEED = 20260820


def _draw_config(rng):
    """One random reference-kwarg dict from the supported config space."""
    pv = bool(rng.randint(2))
    battery = bool(rng.randint(2))
    # v2x negative total demand is computed through (the reference's
    # breakpoint() is a debugger hook, not control flow — pinned by
    # tests/test_q4_negative_demand.py), so discharge is sampled over the
    # full [-1, 1] action range
    v2x = bool(rng.randint(2))
    return dict(
        price_model=int(rng.randint(5)),
        number_of_chargers=int(rng.randint(1, 9)),
        pv_system_available_in_model=pv,
        battery_system_available_in_model=battery,
        vehicle_to_everything=v2x,
        enable_different_vehicle_battery_capacities=bool(rng.randint(2)),
        enable_requested_state_of_charge=bool(rng.randint(2)),
        time_interval=["1h", "2h"][rng.randint(2)],
        charging_mode="bounded",
        vehicle_uncharged_penalty_mode=[
            "no_penalty", "on_departure", "sparse", "dense"
        ][rng.randint(4)],
    )


def _draw_actions(rng, kw, days=1):
    """A ``days``-day action sequence respecting the variant's action space
    (envs/smart_nanogrid_environment.py:101-118: chargers then the appended
    battery action; charger low = -1 only with v2x — incl. the Q4
    negative-demand region, which the engine computes through exactly like
    the reference past its breakpoint trap)."""
    steps = (24 if kw["time_interval"] == "1h" else 12) * days
    n = kw["number_of_chargers"]
    low = -1.0 if kw["vehicle_to_everything"] else 0.0
    actions = []
    for _ in range(steps):
        a = rng.uniform(low, 1.0, size=n)
        if kw["battery_system_available_in_model"]:
            a = np.concatenate([a, rng.uniform(-1.0, 1.0, size=1)])
        actions.append(a)
    return actions


@pytest.mark.parametrize("round_idx", range(CONTINUATION_ROUNDS))
def test_random_config_two_day_continuation_matches_reference(round_idx):
    """Q8 multi-day no-reset continuation under RANDOM configs: stepping two
    full days without reset must carry the trailing penalty-check set, the
    persisted SoC history, and the battery across the day rollover for every
    sampled variant — the fuzz twin of tests/test_continuation.py's
    hand-picked configs, with the pv-shift redraw at rollover re-pinned the
    same way on both sides (chained pv-shift replay)."""
    rng = np.random.RandomState(MASTER_SEED + 7000 + round_idx)
    kw = _draw_config(rng)
    actions = _draw_actions(rng, kw, days=2)
    pv_shift = round(rng.randint(0, 181) / 100.0, 2)
    seed = int(rng.randint(10_000))

    np.random.seed(seed)
    env = oracle.make_reference_env(**kw)
    ref = oracle.run_reference_episode(env, actions, pv_shift=pv_shift)
    assert len(ref["observations"]) == len(actions)
    sched = ref["schedule"]

    config = NanogridConfig.from_reference_kwargs(**kw)
    params = make_params(config, dtype=jnp.float64)
    day = schedule_from_arrays(
        config, soc=sched["SOC"], arrivals=sched["Arrivals"],
        departures=sched["Departures"], occupancy=sched["Charger_occupancy"],
        capacities=sched["Vehicle_capacities"], requested_soc=sched["Requested_SOC"],
    )
    state, _ = core_reset(config, params, jax.random.PRNGKey(seed),
                          schedule=day, pv_shift=pv_shift)

    label = (f"fuzz-cont[{round_idx}] {kw['number_of_chargers']}ch "
             f"pv={kw['pv_system_available_in_model']} "
             f"batt={kw['battery_system_available_in_model']} "
             f"v2x={kw['vehicle_to_everything']} {kw['time_interval']} "
             f"{kw['vehicle_uncharged_penalty_mode']}")
    for i, a in enumerate(actions):
        res = core_step(config, params, state, jnp.asarray(a, jnp.float64))
        state = res.state
        if bool(res.done):
            # the rollover redraws the PV shift (env.py:181); the oracle
            # re-pins the same value — mirror it (chained replay contract)
            state = state._replace(pv_shift=jnp.asarray(pv_shift, jnp.float64))
        np.testing.assert_allclose(
            np.asarray(res.obs), ref["observations"][i], rtol=1e-9, atol=1e-9,
            err_msg=f"{label}: obs mismatch at step {i} (day {i // config.steps_per_day + 1})",
        )
        np.testing.assert_allclose(
            float(res.reward), ref["rewards"][i], rtol=1e-9, atol=1e-9,
            err_msg=f"{label}: reward mismatch at step {i}",
        )


@pytest.mark.parametrize("round_idx", range(FUZZ_ROUNDS))
def test_random_config_matches_reference(round_idx):
    rng = np.random.RandomState(MASTER_SEED + round_idx)
    kw = _draw_config(rng)
    actions = _draw_actions(rng, kw)
    pv_shift = round(rng.randint(0, 181) / 100.0, 2)
    ref, tpu = run_pair(kw, actions, seed=int(rng.randint(10_000)),
                        pv_shift=pv_shift)
    label = (f"fuzz[{round_idx}] {kw['number_of_chargers']}ch "
             f"pv={kw['pv_system_available_in_model']} "
             f"batt={kw['battery_system_available_in_model']} "
             f"v2x={kw['vehicle_to_everything']} "
             f"pm={kw['price_model']} {kw['time_interval']} "
             f"{kw['vehicle_uncharged_penalty_mode']}")
    assert_trajectories_match(ref, tpu, label)

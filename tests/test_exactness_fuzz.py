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
import pytest

from test_exactness import assert_trajectories_match, run_pair

FUZZ_ROUNDS = 8
MASTER_SEED = 20260820


def _draw_config(rng):
    """One random reference-kwarg dict from the supported config space."""
    pv = bool(rng.randint(2))
    battery = bool(rng.randint(2))
    # v2x without PV + aggressive discharge can flip total demand negative,
    # which the reference traps with breakpoint() (SURVEY.md Q4) — sampled,
    # but driven with mild discharge below.
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


def _draw_actions(rng, kw):
    """A full-day action sequence respecting the variant's action space
    (envs/smart_nanogrid_environment.py:101-118: chargers then the appended
    battery action; charger low = -1 only with v2x)."""
    steps = 24 if kw["time_interval"] == "1h" else 12
    n = kw["number_of_chargers"]
    # mild discharge floor keeps v2x demand positive (reference Q4 trap)
    low = -0.08 if kw["vehicle_to_everything"] else 0.0
    actions = []
    for _ in range(steps):
        a = rng.uniform(low, 1.0, size=n)
        if kw["battery_system_available_in_model"]:
            a = np.concatenate([a, rng.uniform(-1.0, 1.0, size=1)])
        actions.append(a)
    return actions


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

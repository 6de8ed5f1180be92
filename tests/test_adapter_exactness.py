"""API-surface exactness: the compat adapter vs the live reference env, both
replaying the *same* initial_values.json through their public reset/step APIs."""

import json
import os

import numpy as np
import pytest
import jax.numpy as jnp

import oracle
from smart_nanogrid_gym_tpu.compat.gym_adapter import SmartNanogridEnv


@pytest.mark.parametrize("variant", ["basic", "b-pv"])
def test_adapter_matches_reference_via_json_replay(variant, tmp_path):
    kw = dict(
        price_model=0, number_of_chargers=4,
        pv_system_available_in_model=variant == "b-pv",
        battery_system_available_in_model=variant == "b-pv",
        vehicle_to_everything=False,
        enable_different_vehicle_battery_capacities=True,
        enable_requested_state_of_charge=False,
        time_interval="1h", charging_mode="bounded",
        vehicle_uncharged_penalty_mode="sparse",
    )
    n_act = 4 + (1 if variant == "b-pv" else 0)
    rng = np.random.RandomState(31)
    actions = [rng.uniform(0, 1, n_act) for _ in range(24)]
    if variant == "b-pv":
        for a in actions:
            a[-1] = rng.uniform(-1, 1)

    # reference generates a day and we capture it as JSON (its own format)
    np.random.seed(44)
    env_ref = oracle.make_reference_env(**kw)
    ref = oracle.run_reference_episode(env_ref, actions, pv_shift=1.3)
    sched = ref["schedule"]
    payload = {
        "SOC": sched["SOC"].tolist(),
        "Arrivals": sched["Arrivals"],
        "Departures": sched["Departures"],
        "Charger_occupancy": sched["Charger_occupancy"].tolist(),
        "Vehicle_capacities": sched["Vehicle_capacities"].tolist(),
        "Requested_SOC": sched["Requested_SOC"].tolist(),
    }
    json_path = tmp_path / "initial_values.json"
    with open(json_path, "w") as fp:
        json.dump(payload, fp)

    # adapter replays the same day through the public API; pin the PV shift and
    # recompute the reset obs under it (the adapter drew a random shift)
    env = SmartNanogridEnv(**kw, output_directory=str(tmp_path / "out"), dtype=jnp.float64)
    obs, _ = env.reset(generate_new_initial_values=False, initial_values_path=str(json_path))
    env._state = env._state._replace(pv_shift=jnp.asarray(1.3, jnp.float64))
    from smart_nanogrid_gym_tpu.core.transition import observe

    obs = np.asarray(observe(env.config, env.params, env._state))

    np.testing.assert_allclose(obs, ref["reset_obs"], rtol=1e-9, atol=1e-9)

    rewards = []
    for i, a in enumerate(actions):
        o, r, done, trunc, info = env.step(a)
        rewards.append(r)
        np.testing.assert_allclose(
            o, ref["observations"][i], rtol=1e-9, atol=1e-9,
            err_msg=f"adapter obs mismatch at step {i}",
        )
    np.testing.assert_allclose(rewards, ref["rewards"], rtol=1e-9)
    assert done

    # the day-end dump landed with reference-compatible keys
    dumped = None
    for root, _, files in os.walk(tmp_path / "out"):
        for f in files:
            if f == "prediction_results.json":
                dumped = os.path.join(root, f)
    assert dumped is not None
    with open(dumped) as fp:
        results = json.load(fp)
    for key in ("SOC", "Grid_power", "Total_cost", "Charger_power_values",
                "Insufficiently_charged_vehicle_penalties", "Available_solar_energy"):
        assert key in results, key
    np.testing.assert_allclose(
        np.asarray(results["Total_cost"]), [-r for r in rewards], rtol=1e-6
    )

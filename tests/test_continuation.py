"""Multi-day continuation semantics (SURVEY.md Q8): stepping past a day end
WITHOUT reset keeps the schedule, carries the battery and the trailing
penalty-check set, and replays the day's arrays from their post-day-1 values.

Ground truth: the live reference env stepped 48 times without reset.
Also asserts fused_day_rollout == sequential step across the day boundary
(the CLAUDE.md equivalence invariant, now including day 2).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle
from smart_nanogrid_gym_tpu.core import NanogridConfig, make_params, schedule_from_arrays
from smart_nanogrid_gym_tpu.core.rollout import fused_day_rollout
from smart_nanogrid_gym_tpu.core.transition import reset as core_reset, step as core_step


@pytest.mark.parametrize("variant,penalty", [("basic", "dense"), ("b-pv", "sparse"),
                                             ("b-pv", "on_departure")])
def test_two_day_continuation_matches_reference(variant, penalty):
    kw = dict(
        price_model=0, number_of_chargers=4,
        pv_system_available_in_model=variant == "b-pv",
        battery_system_available_in_model=variant == "b-pv",
        vehicle_to_everything=False,
        enable_different_vehicle_battery_capacities=True,
        enable_requested_state_of_charge=False,
        time_interval="1h", charging_mode="bounded",
        vehicle_uncharged_penalty_mode=penalty,
    )
    n_act = 4 + (1 if variant == "b-pv" else 0)
    rng = np.random.RandomState(13)
    actions = [rng.uniform(0, 1, n_act) for _ in range(48)]  # two days, no reset

    np.random.seed(77)
    env = oracle.make_reference_env(**kw)
    ref = oracle.run_reference_episode(env, actions, pv_shift=1.1)
    assert len(ref["observations"]) == 48
    sched = ref["schedule"]

    config = NanogridConfig.from_reference_kwargs(**kw)
    params = make_params(config, dtype=jnp.float64)
    day = schedule_from_arrays(
        config, soc=sched["SOC"], arrivals=sched["Arrivals"], departures=sched["Departures"],
        occupancy=sched["Charger_occupancy"], capacities=sched["Vehicle_capacities"],
        requested_soc=sched["Requested_SOC"],
    )
    state, _ = core_reset(config, params, jax.random.PRNGKey(0), schedule=day)
    state = state._replace(pv_shift=jnp.asarray(1.1, jnp.float64))

    for i, a in enumerate(actions):
        res = core_step(config, params, state, jnp.asarray(a, jnp.float64))
        state = res.state
        if bool(res.done):
            state = state._replace(pv_shift=jnp.asarray(1.1, jnp.float64))
        np.testing.assert_allclose(
            np.asarray(res.obs), ref["observations"][i], rtol=1e-9, atol=1e-9,
            err_msg=f"continuation obs mismatch at step {i} (day {i // 24 + 1})",
        )
        np.testing.assert_allclose(float(res.reward), ref["rewards"][i], rtol=1e-9, atol=1e-9,
                                   err_msg=f"continuation reward mismatch at step {i}")


def test_fused_day2_equals_sequential():
    """The fused rollout must stay exactly equivalent to sequential stepping on
    a continued (day >= 2) state — regression for the review finding that day 2
    previously read generation-time SoC instead of the persisted history."""
    config = NanogridConfig(num_chargers=4, pv_system=True, battery_system=True)
    B = 5
    params = make_params(config, dtype=jnp.float64)
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
    keys = jax.random.split(jax.random.PRNGKey(4), B)
    states0, obs0 = jax.vmap(functools.partial(core_reset, config))(bparams, keys, None, None)

    low_high = config.action_bounds()
    low = jnp.asarray(low_high[0], jnp.float64)
    high = jnp.asarray(low_high[1], jnp.float64)

    def policy(obs, key):
        u = (obs[..., : config.num_actions].astype(jnp.float64) * 7.31 + 0.173) % 1.0
        return low + u * (high - low)

    # sequential: 48 steps
    step_fn = jax.vmap(functools.partial(core_step, config))
    st, ob = states0, obs0
    seq_rew = []
    for t in range(48):
        res = step_fn(bparams, st, policy(ob, None))
        st, ob = res.state, res.obs
        seq_rew.append(np.asarray(res.reward))
    seq_final = st

    # fused: two chained day rollouts; day-2 gets the trailing obs of day 1.
    # The sequential path redraws pv_shift at the rollover from state.key; the
    # fused path does the identical redraw internally, so both see the same
    # shift on day 2.
    st1, (obs_t1, rew1, _) = fused_day_rollout(config, bparams, states0, policy, jax.random.PRNGKey(0))
    st2, (obs_t2, rew2, _) = fused_day_rollout(
        config, bparams, st1, policy, jax.random.PRNGKey(1), obs0=obs_t1[-1]
    )
    fused_rew = np.concatenate([np.asarray(rew1), np.asarray(rew2)], axis=0)

    np.testing.assert_allclose(fused_rew, np.asarray(seq_rew), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(st2.soc), np.asarray(seq_final.soc), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(st2.batt_soc), np.asarray(seq_final.batt_soc), rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(st2.pmask), np.asarray(seq_final.pmask))

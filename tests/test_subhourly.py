"""Sub-hourly interval support.

The reference offers 15/30/45-min intervals in its config lists
(solvers/RL/ppo_train.py:19) but crashes on them (fixed zeros(25) arrays,
SURVEY.md Q3).  The TPU build supports arbitrary intervals *correctly* while
matching the reference exactly at 1h/2h (covered in test_exactness).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smart_nanogrid_gym_tpu.core import NanogridConfig, make_params
from smart_nanogrid_gym_tpu.core.generate import generate_schedule
from smart_nanogrid_gym_tpu.core.rollout import fused_day_rollout
from smart_nanogrid_gym_tpu.core.transition import reset as core_reset, step as core_step
from smart_nanogrid_gym_tpu.core.config import parse_time_interval


def test_parse_time_interval():
    assert parse_time_interval("1h") == 1.0
    assert parse_time_interval("2h") == 2.0
    assert parse_time_interval("15min") == 0.25
    assert parse_time_interval("30min") == 0.5
    assert parse_time_interval("") == 1.0
    with pytest.raises(ValueError):
        parse_time_interval("7q")


@pytest.mark.parametrize("interval,steps", [(0.25, 96), (0.5, 48)])
def test_subhourly_generation_invariants(interval, steps):
    config = NanogridConfig(
        num_chargers=4, time_interval=interval, pv_system=True, battery_system=True
    )
    assert config.steps_per_day == steps
    params = make_params(config, dtype=jnp.float64)
    s = generate_schedule(jax.random.PRNGKey(0), config, params)
    occ = np.asarray(s.occupancy)
    is_arr = np.asarray(s.is_arrival) > 0
    dep = np.asarray(s.dep_obs)
    k4 = int(4 / interval)
    k10 = int(10 / interval)
    for c in range(4):
        for t in np.where(is_arr[c])[0]:
            d = dep[c, t]
            # stays last between 4h and 10h of wall time in steps
            assert k4 <= d <= k10, (t, d)
    # price/solar tables sized for the interval
    assert params.price.shape[0] == max(48, 2 * steps)
    assert params.solar_power.shape[0] == 2 * steps


def test_subhourly_full_day_runs():
    config = NanogridConfig(
        num_chargers=4, time_interval=0.25, pv_system=True, battery_system=True
    )
    params = make_params(config, dtype=jnp.float64)
    state, obs = core_reset(config, params, jax.random.PRNGKey(1))
    assert obs.shape == (config.obs_dim,)
    T = config.steps_per_day
    for t in range(T):
        res = core_step(config, params, state, jnp.full(5, 0.4, jnp.float64))
        state = res.state
        assert np.isfinite(float(res.reward))
    assert bool(res.done)
    assert int(state.t) == 0
    # energy accounting scales with dt: a full-power hour equals 4 quarter steps
    # (charger power * dt accumulates SoC identically)


def test_subhourly_fused_equals_sequential():
    config = NanogridConfig(
        num_chargers=4, time_interval=0.5, pv_system=True, battery_system=True
    )
    B = 4
    params = make_params(config, dtype=jnp.float64)
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    states0, obs0 = jax.vmap(functools.partial(core_reset, config))(bparams, keys, None, None)

    def policy(obs, key):
        u = (obs[..., : config.num_actions].astype(jnp.float64) * 5.17 + 0.31) % 1.0
        low, high = config.action_bounds()
        return jnp.asarray(low) + u * (jnp.asarray(high) - jnp.asarray(low))

    step_fn = jax.vmap(functools.partial(core_step, config))
    st, ob = states0, obs0
    seq_rew = []
    for t in range(config.steps_per_day):
        res = step_fn(bparams, st, policy(ob, None))
        st, ob = res.state, res.obs
        seq_rew.append(np.asarray(res.reward))

    _, (_, rewards, _) = fused_day_rollout(config, bparams, states0, policy, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(rewards), np.asarray(seq_rew), rtol=1e-12, atol=1e-12)


def test_price_table_general_intervals():
    """Non-divisor intervals map timestep -> wall-clock hour correctly
    (45 min => 32 steps/day; 1.5 h handled via the reference-exact 48 branch)."""
    from smart_nanogrid_gym_tpu.core.prices import build_price_table, price_day

    day = price_day(0)
    # 45-minute interval: 32 steps/day, table 64
    table, _ = build_price_table(0, 64)
    assert table.shape == (64,)
    for t in range(32):
        hour = int(np.floor(t * 0.75)) % 24
        assert table[t] == day[hour], (t, hour)
    # duplicated second day
    np.testing.assert_array_equal(table[:32], table[32:])
    # 1.5h interval: 16 steps/day, general mapping (reference cannot run this)
    from smart_nanogrid_gym_tpu.core import NanogridConfig
    cfg = NanogridConfig(time_interval=1.5, num_chargers=4,
                         pv_system=False, battery_system=False)
    assert cfg.price_table_len == 32
    t15, _ = build_price_table(0, cfg.price_table_len)
    for t in range(16):
        hour = int(np.floor(t * 1.5)) % 24
        assert t15[t] == day[hour], (t, hour)
    # 15-minute interval: each hour repeated 4x
    table15, _ = build_price_table(0, 192)
    for t in range(96):
        assert table15[t] == day[t // 4]
    # 1h/2h keep the reference's exact duplicated-hourly table
    table1h, _ = build_price_table(0, 48)
    np.testing.assert_array_equal(table1h, np.concatenate([day, day]))


def test_soc_dynamics_scale_with_interval():
    """Charging at a fixed action for 1h must equal 4x 15min steps in SoC."""
    results = {}
    for interval in (1.0, 0.25):
        config = NanogridConfig(
            num_chargers=1, time_interval=interval,
            pv_system=False, battery_system=False,
            different_battery_capacities=False, penalty_mode="no_penalty",
        )
        params = make_params(config, dtype=jnp.float64)
        # hand-built schedule: one vehicle arrives at t=0, stays all day
        T, L = config.steps_per_day, config.table_len
        from smart_nanogrid_gym_tpu.core.state import DaySchedule

        def tab(fill, first=None):
            x = np.zeros((1, L)); x[0, :T] = fill
            if first is not None:
                x[0, 0] = first
            return jnp.asarray(x)

        schedule = DaySchedule(
            occupancy=tab(1.0), capacity=tab(40.0),
            requested_soc=tab(1.0), soc_init=tab(0.0, first=0.2),
            is_arrival=tab(0.0, first=1.0),
            dep_obs=jnp.asarray(np.arange(L, 0, -1, dtype=float)[None, :]),
            mask_departing=tab(0.0), mask_departing3=tab(0.0),
        )
        state, _ = core_reset(config, params, jax.random.PRNGKey(0), schedule=schedule)
        steps_per_hour = int(1 / interval)
        for _ in range(steps_per_hour):
            res = core_step(config, params, state, jnp.asarray([0.5], jnp.float64))
            state = res.state
        col = steps_per_hour - 1
        results[interval] = float(np.asarray(state.soc)[0, col])
    # SoC after one hour of charging at action 0.5 is interval-invariant:
    # 0.2 + 0.5*22*0.95/40 = 0.46125
    assert abs(results[1.0] - 0.46125) < 1e-12
    assert abs(results[0.25] - results[1.0]) < 1e-12

"""Fused day rollout must be exactly equivalent to sequential step() calls."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smart_nanogrid_gym_tpu.core import NanogridConfig, make_params
from smart_nanogrid_gym_tpu.core.rollout import fused_day_rollout
from smart_nanogrid_gym_tpu.core.transition import reset as core_reset, step as core_step
from smart_nanogrid_gym_tpu.solvers.rbc import make_rbc_policy_fn


CONFIGS = [
    NanogridConfig(num_chargers=4, pv_system=False, battery_system=False, penalty_mode="dense"),
    NanogridConfig(num_chargers=4, pv_system=True, battery_system=True, penalty_mode="sparse"),
    NanogridConfig(num_chargers=8, pv_system=True, battery_system=True,
                   vehicle_to_everything=True, penalty_mode="on_departure"),
    NanogridConfig(num_chargers=4, pv_system=True, battery_system=True,
                   requested_state_of_charge=True, time_interval=2.0),
]


@pytest.mark.parametrize("config", CONFIGS, ids=lambda c: f"{c.variant_name}-{int(c.time_interval)}h")
def test_fused_equals_sequential(config):
    B = 6
    params = make_params(config, dtype=jnp.float64)
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    reset_fn = jax.vmap(functools.partial(core_reset, config))
    states0, obs0 = reset_fn(bparams, keys, None, None)

    # Deterministic pseudo-random policy derived element-wise from the obs.
    # Must avoid reductions (e.g. obs.sum()): XLA may reassociate f32 reductions
    # differently per compilation, which would inject ulp noise unrelated to the
    # engine under test.  Element-wise float ops are bitwise deterministic.
    low_high = config.action_bounds()
    low = jnp.asarray(low_high[0], jnp.float64)
    high = jnp.asarray(low_high[1], jnp.float64)

    def policy(obs, key):
        u = (obs[..., : config.num_actions].astype(jnp.float64) * 7.31 + 0.173) % 1.0
        return low + u * (high - low)

    # sequential path
    step_fn = jax.vmap(functools.partial(core_step, config))
    st, ob = states0, obs0
    seq_obs, seq_rew, seq_infos = [], [], []
    for t in range(config.steps_per_day):
        a = policy(ob, None)
        res = step_fn(bparams, st, a)
        st, ob = res.state, res.obs
        seq_obs.append(np.asarray(res.obs))
        seq_rew.append(np.asarray(res.reward))
        seq_infos.append(res.info)
    seq_final = st

    # fused path
    fused_final, (obs_traj, rewards, dones, infos) = fused_day_rollout(
        config, bparams, states0, policy, jax.random.PRNGKey(9), collect_info=True
    )

    np.testing.assert_allclose(np.asarray(rewards), np.asarray(seq_rew), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(obs_traj), np.asarray(seq_obs), rtol=1e-12, atol=1e-12)
    assert bool(dones[-1].all()) and not bool(dones[:-1].any())

    # state equivalence: SoC history, battery, timestep, day counter
    np.testing.assert_allclose(np.asarray(fused_final.soc), np.asarray(seq_final.soc), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(fused_final.batt_soc), np.asarray(seq_final.batt_soc), rtol=1e-12
    )
    assert (np.asarray(fused_final.t) == 0).all()
    assert (np.asarray(fused_final.day) == np.asarray(seq_final.day)).all()

    # telemetry equivalence across every StepInfo field
    for field in infos._fields:
        fused_series = np.asarray(getattr(infos, field))
        seq_series = np.stack([np.asarray(getattr(i, field)) for i in seq_infos])
        np.testing.assert_allclose(
            fused_series, seq_series, rtol=1e-12, atol=1e-12,
            err_msg=f"info field {field!r} mismatch",
        )


def test_fused_with_rbc_policy_jits():
    config = NanogridConfig(num_chargers=8, pv_system=True, battery_system=True)
    B = 32
    params = make_params(config, dtype=jnp.float32)
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states0, obs0 = jax.vmap(functools.partial(core_reset, config))(bparams, keys, None, None)
    rbc = make_rbc_policy_fn(config)

    @jax.jit
    def run(states):
        return fused_day_rollout(config, bparams, states, lambda o, k: rbc(o), jax.random.PRNGKey(2))

    next_state, (obs_traj, rewards, dones) = run(states0)
    assert rewards.shape == (config.steps_per_day, B)
    assert np.isfinite(np.asarray(rewards)).all()
    # PV shift was redrawn for the new day
    assert not np.allclose(np.asarray(next_state.pv_shift), np.asarray(states0.pv_shift))

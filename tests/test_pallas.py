"""Pallas RBC day-rollout kernel vs the fused XLA rollout (interpret mode on CPU)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smart_nanogrid_gym_tpu.core import NanogridConfig, make_params
from smart_nanogrid_gym_tpu.core.rollout import fused_day_rollout
from smart_nanogrid_gym_tpu.core.transition import reset as core_reset
from smart_nanogrid_gym_tpu.ops.pallas_rollout import pallas_rbc_day_rollout
from smart_nanogrid_gym_tpu.solvers.rbc import make_rbc_policy_fn


@pytest.mark.parametrize(
    "config",
    [
        NanogridConfig(num_chargers=8, pv_system=True, battery_system=True),
        NanogridConfig(num_chargers=8, pv_system=True, battery_system=False),
        NanogridConfig(num_chargers=4, pv_system=False, battery_system=False, penalty_mode="dense"),
    ],
    ids=["b-pv", "pv-only", "basic-dense"],
)
def test_pallas_kernel_matches_fused(config):
    B = 128
    params = make_params(config, dtype=jnp.float32)
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states, obs = jax.vmap(functools.partial(core_reset, config))(bparams, keys, None, None)

    rbc = make_rbc_policy_fn(config)
    _, (_, rew_fused, _) = fused_day_rollout(
        config, bparams, states, lambda ob, k: rbc(ob), jax.random.PRNGKey(1)
    )

    rew_pallas, soc_final = pallas_rbc_day_rollout(config, bparams, states, interpret=True)

    np.testing.assert_allclose(
        np.asarray(rew_pallas), np.asarray(rew_fused), rtol=2e-5, atol=1e-5
    )
    assert soc_final.shape == (config.num_chargers, B)
    assert np.isfinite(np.asarray(soc_final)).all()


@pytest.mark.parametrize(
    "config",
    [
        NanogridConfig(num_chargers=8, pv_system=True, battery_system=True),
        NanogridConfig(num_chargers=8, pv_system=True, battery_system=True,
                       different_battery_capacities=False, requested_state_of_charge=True),
        # both specializations at once (no cap/req carries at all)
        NanogridConfig(num_chargers=8, pv_system=True, battery_system=True,
                       different_battery_capacities=False),
        NanogridConfig(num_chargers=4, pv_system=False, battery_system=False,
                       penalty_mode="on_departure"),
    ],
    ids=["b-pv-sparse", "b-pv-reqsoc", "b-pv-fixedcap", "basic-ondep"],
)
def test_pallas_gen_kernel_matches_fused(config):
    """Fused generation+RBC kernel vs generate_schedule(uniforms=·) + fused XLA
    rollout driven by the SAME uniform block (interpret mode on CPU)."""
    from smart_nanogrid_gym_tpu.core.generate import generate_schedule
    from smart_nanogrid_gym_tpu.ops.pallas_gen_rollout import pallas_gen_rbc_day

    B = 128
    T, N = config.steps_per_day, config.num_chargers
    params = make_params(config, dtype=jnp.float32)
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)

    u = jax.random.uniform(jax.random.PRNGKey(3), (B, T, 5, N), jnp.float32)
    schedules = jax.vmap(
        lambda uu: generate_schedule(None, config, params, uniforms=uu)
    )(u)
    keys = jax.random.split(jax.random.PRNGKey(4), B)
    states, _ = jax.vmap(functools.partial(core_reset, config))(
        bparams, keys, None, schedules
    )

    rbc = make_rbc_policy_fn(config)
    _, (_, rew_fused, _) = fused_day_rollout(
        config, bparams, states, lambda ob, k: rbc(ob), jax.random.PRNGKey(5)
    )

    rew_pallas, soc_final = pallas_gen_rbc_day(
        config, bparams, jnp.moveaxis(u, 0, -1), states.pv_shift, interpret=True
    )

    np.testing.assert_allclose(
        np.asarray(rew_pallas), np.asarray(rew_fused), rtol=2e-5, atol=1e-5
    )
    assert soc_final.shape == (N, B)
    assert np.isfinite(np.asarray(soc_final)).all()


def test_pallas_policy_kernel_matches_fused():
    """Fused MLP-policy+env kernel vs fused XLA rollout with the deterministic
    PPO policy (interpret mode; biases pushed away from 0 so where-branch signs
    can't flip between the two matmul orderings' last-ulp differences)."""
    from smart_nanogrid_gym_tpu.ops.pallas_policy_rollout import pallas_policy_day_rollout
    from smart_nanogrid_gym_tpu.solvers.ppo import PPOLearner

    config = NanogridConfig(num_chargers=8, pv_system=True, battery_system=True)
    B = 128
    params = make_params(config, dtype=jnp.float32)
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    states, obs = jax.vmap(functools.partial(core_reset, config))(bparams, keys, None, None)

    learner = PPOLearner(config)
    net_params = learner.network.init(
        jax.random.PRNGKey(1), jnp.zeros((1, config.obs_dim), jnp.float32)
    )
    # push action means clearly away from the 0 branch boundaries; with v2x,
    # alternate charge/discharge per charger so both branches are exercised
    if config.vehicle_to_everything:
        ch_bias = np.where(np.arange(config.num_chargers) % 2 == 0, 0.5, -0.4)
    else:
        ch_bias = np.full(config.num_chargers, 0.5)
    bias = np.concatenate(
        [ch_bias, [-0.3]] if config.battery_system else [ch_bias]
    ).astype(np.float32)
    net_params = jax.tree_util.tree_map_with_path(
        lambda path, x: jnp.asarray(bias) if "Dense_2" in str(path) and "pi" in str(path) and "bias" in str(path) else x,
        net_params,
    )

    policy = learner.policy_fn(net_params, deterministic=True)
    _, (obs_t, rew_fused, _) = fused_day_rollout(
        config, bparams, states, lambda ob, k: policy(ob), jax.random.PRNGKey(2)
    )

    rew_pallas, actions, soc_final = pallas_policy_day_rollout(
        config, bparams, states, net_params, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(rew_pallas), np.asarray(rew_fused), rtol=2e-4, atol=2e-4
    )
    assert actions.shape == (config.steps_per_day, config.num_actions, B)
    low, high = config.action_bounds()
    a = np.asarray(actions)
    assert (a >= low[None, :, None] - 1e-6).all() and (a <= high[None, :, None] + 1e-6).all()


@pytest.mark.parametrize(
    "config",
    [
        NanogridConfig(num_chargers=8, pv_system=True, battery_system=True),
        # v2x variants: charger actions go negative (discharge branch + V2G
        # energy sold to the grid), reference ppo_train.py:50-75
        NanogridConfig(num_chargers=8, pv_system=True, battery_system=True,
                       vehicle_to_everything=True),
        NanogridConfig(num_chargers=4, pv_system=False, battery_system=False,
                       vehicle_to_everything=True, penalty_mode="dense"),
    ],
    ids=["b-pv", "v2x-b-pv", "v2x"],
)
def test_pallas_gen_policy_kernel_matches_fused(config):
    """Fused generation+MLP-policy kernel vs generate_schedule(uniforms=·) +
    fused XLA rollout with the deterministic PPO policy, driven by the SAME
    uniform block (interpret mode on CPU)."""
    from smart_nanogrid_gym_tpu.core.generate import generate_schedule
    from smart_nanogrid_gym_tpu.ops.pallas_gen_policy_rollout import pallas_gen_policy_day
    from smart_nanogrid_gym_tpu.solvers.ppo import PPOLearner

    B = 128
    T, N = config.steps_per_day, config.num_chargers
    params = make_params(config, dtype=jnp.float32)
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)

    u = jax.random.uniform(jax.random.PRNGKey(11), (B, T, 5, N), jnp.float32)
    schedules = jax.vmap(
        lambda uu: generate_schedule(None, config, params, uniforms=uu)
    )(u)
    keys = jax.random.split(jax.random.PRNGKey(12), B)
    states, _ = jax.vmap(functools.partial(core_reset, config))(
        bparams, keys, None, schedules
    )

    learner = PPOLearner(config)
    net_params = learner.network.init(
        jax.random.PRNGKey(13), jnp.zeros((1, config.obs_dim), jnp.float32)
    )
    # push action means clearly away from the 0 branch boundaries; with v2x,
    # alternate charge/discharge per charger so both branches are exercised
    if config.vehicle_to_everything:
        ch_bias = np.where(np.arange(config.num_chargers) % 2 == 0, 0.5, -0.4)
    else:
        ch_bias = np.full(config.num_chargers, 0.5)
    bias = np.concatenate(
        [ch_bias, [-0.3]] if config.battery_system else [ch_bias]
    ).astype(np.float32)
    net_params = jax.tree_util.tree_map_with_path(
        lambda path, x: jnp.asarray(bias) if "Dense_2" in str(path) and "pi" in str(path) and "bias" in str(path) else x,
        net_params,
    )

    policy = learner.policy_fn(net_params, deterministic=True)
    next_state, (_, rew_fused, _) = fused_day_rollout(
        config, bparams, states, lambda ob, k: policy(ob), jax.random.PRNGKey(14)
    )

    rew_pallas, actions, soc_final, batt_final = pallas_gen_policy_day(
        config, bparams, net_params, jnp.moveaxis(u, 0, -1), states.pv_shift,
        interpret=True,
    )

    np.testing.assert_allclose(
        np.asarray(rew_pallas), np.asarray(rew_fused), rtol=2e-4, atol=2e-4
    )
    if config.battery_system:
        # battery SoC carried across the day matches the XLA engine's final state
        np.testing.assert_allclose(
            np.asarray(batt_final), np.asarray(next_state.batt_soc), rtol=2e-4, atol=2e-4
        )
    assert actions.shape == (T, config.num_actions, B)
    low, high = config.action_bounds()
    a = np.asarray(actions)
    assert (a >= low[None, :, None] - 1e-6).all() and (a <= high[None, :, None] + 1e-6).all()
    assert soc_final.shape == (N, B)
    assert np.isfinite(np.asarray(soc_final)).all()


def test_pallas_gen_policy_kernel_matches_fused_ddpg():
    """Fused generation+policy kernel with the DDPG actor (400-300 relu torso,
    tanh squashed into the action box — solvers.networks.DDPGActor) vs the
    same uniform block through generate_schedule + fused XLA rollout."""
    from smart_nanogrid_gym_tpu.core.generate import generate_schedule
    from smart_nanogrid_gym_tpu.ops.pallas_gen_policy_rollout import pallas_gen_policy_day
    from smart_nanogrid_gym_tpu.solvers.ddpg import DDPGLearner

    config = NanogridConfig(num_chargers=8, pv_system=True, battery_system=True)
    B = 128
    T, N = config.steps_per_day, config.num_chargers
    params = make_params(config, dtype=jnp.float32)
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)

    u = jax.random.uniform(jax.random.PRNGKey(21), (B, T, 5, N), jnp.float32)
    schedules = jax.vmap(
        lambda uu: generate_schedule(None, config, params, uniforms=uu)
    )(u)
    keys = jax.random.split(jax.random.PRNGKey(22), B)
    states, _ = jax.vmap(functools.partial(core_reset, config))(
        bparams, keys, None, schedules
    )

    learner = DDPGLearner(config)
    actor_params = learner.actor.init(
        jax.random.PRNGKey(23), jnp.zeros((1, config.obs_dim), jnp.float32)
    )
    # push the battery action's pre-squash mean away from 0 so the charge/
    # discharge branch can't flip on last-ulp matmul-ordering differences
    # (charger actions live in [0, 1] — tanh squash keeps them > 0 always)
    bias = np.concatenate(
        [np.full(config.num_chargers, 0.4), [-0.6]]
    ).astype(np.float32)
    actor_params = jax.tree_util.tree_map_with_path(
        lambda path, x: jnp.asarray(bias)
        if "Dense_2" in str(path) and "mu" in str(path) and "bias" in str(path)
        else x,
        actor_params,
    )

    policy = learner.policy_fn(actor_params)
    next_state, (_, rew_fused, _) = fused_day_rollout(
        config, bparams, states, lambda ob, k: policy(ob), jax.random.PRNGKey(24)
    )

    rew_pallas, actions, soc_final, batt_final = pallas_gen_policy_day(
        config, bparams, actor_params, jnp.moveaxis(u, 0, -1), states.pv_shift,
        interpret=True, actor="ddpg",
    )

    np.testing.assert_allclose(
        np.asarray(rew_pallas), np.asarray(rew_fused), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(batt_final), np.asarray(next_state.batt_soc), rtol=2e-4, atol=2e-4
    )
    low, high = config.action_bounds()
    a = np.asarray(actions)
    assert (a >= low[None, :, None] - 1e-6).all() and (a <= high[None, :, None] + 1e-6).all()

"""Parity tests for the trajectory-emitting PPO collection kernel
(ops/pallas_collect.py), interpret mode on CPU.

The explicit-noise twin consumes the same generation uniforms, PV shifts and
action normals as the XLA path (generate_schedule + core reset +
fused_day_rollout with the noise injected through policy_xs), so every
trajectory tensor must match to f32 rounding: the physics step body is the
bit-pinned one shared with the evaluation kernels (tests/test_pallas.py);
only the MLP's lanes-layout matmul order differs from XLA's.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from smart_nanogrid_gym_tpu.core import NanogridConfig, make_params
from smart_nanogrid_gym_tpu.core.generate import generate_schedule
from smart_nanogrid_gym_tpu.core.rollout import fused_day_rollout
from smart_nanogrid_gym_tpu.core.transition import reset as core_reset
from smart_nanogrid_gym_tpu.ops.pallas_collect import pallas_ppo_collect_day
from smart_nanogrid_gym_tpu.solvers.networks import ActorCritic
from smart_nanogrid_gym_tpu.solvers.ppo import _gaussian_logp


def _setup(config, B, seed=0):
    params = make_params(config, dtype=jnp.float32)
    T, N, A = config.steps_per_day, config.num_chargers, config.num_actions
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    uniforms = jax.random.uniform(ks[0], (T, 5, N, B), jnp.float32)
    normals = jax.random.normal(ks[1], (T, A, B), jnp.float32)
    pv_shift = jnp.floor(jax.random.uniform(ks[2], (B,), jnp.float32) * 181.0) / 100.0
    batt0 = jax.random.uniform(ks[3], (B,), jnp.float32)
    net = ActorCritic(action_dim=A)
    net_params = net.init(ks[4], jnp.zeros((1, config.obs_dim), jnp.float32))
    # push biases off zero so both where-branches and the clip both engage
    net_params = jax.tree.map(
        lambda x: x + 0.05 if x.ndim == 1 else x, net_params)
    return params, uniforms, normals, pv_shift, batt0, net, net_params


def _xla_collect(config, params, net, net_params, uniforms, normals,
                 pv_shift, batt0):
    """The XLA rollout with identical injected noise: generate each env's day
    from the same uniforms, reset with the same pv_shift/battery, and step
    fused_day_rollout with the normals fed per step through policy_xs."""
    B = pv_shift.shape[0]
    low, high = config.action_bounds()
    low = jnp.asarray(low, jnp.float32)
    high = jnp.asarray(high, jnp.float32)
    bparams = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)

    gen = jax.vmap(
        lambda u: generate_schedule(jax.random.PRNGKey(0), config, params,
                                    uniforms=u),
        in_axes=3, out_axes=0)
    schedules = gen(uniforms)
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states, obs = jax.vmap(
        functools.partial(core_reset, config)
    )(bparams, keys, batt0, schedules)
    states = states._replace(pv_shift=pv_shift)

    def policy_step(ob, key_t, normal_t):
        mean, log_std, value = net.apply(net_params, ob)
        action = mean + jnp.exp(log_std) * normal_t
        logp = _gaussian_logp(mean, log_std, action)
        clipped = jnp.clip(action, low, high)
        return clipped, (ob, action, logp, value)

    # normals arrive (T, A, B) -> per-step (B, A)
    xs = jnp.swapaxes(normals, 1, 2)
    states, (obs_traj, rewards, dones, aux) = fused_day_rollout(
        config, bparams, states, policy_step, jax.random.PRNGKey(2),
        policy_aux=True, policy_xs=xs,
    )
    ob_t, act_t, logp_t, val_t = aux
    return ob_t, act_t, logp_t, val_t, rewards, states.batt_soc


def test_collect_day_matches_xla_rollout_bitwise_class():
    config = NanogridConfig(num_chargers=8, pv_system=True,
                            battery_system=True, penalty_mode="sparse")
    B = 256
    params, uniforms, normals, pv_shift, batt0, net, net_params = _setup(
        config, B)

    k_obs, k_act, k_logp, k_val, k_rew, k_batt = pallas_ppo_collect_day(
        config, params, net_params, uniforms, normals, pv_shift, batt0,
        interpret=True)
    x_obs, x_act, x_logp, x_val, x_rew, x_batt = _xla_collect(
        config, params, net, net_params, uniforms, normals, pv_shift, batt0)

    # layouts: kernel (T, feat, B) vs XLA (T, B, feat)
    np.testing.assert_allclose(np.asarray(k_obs), np.asarray(
        jnp.swapaxes(x_obs, 1, 2)), rtol=1e-6, atol=1e-6, err_msg="obs")
    np.testing.assert_allclose(np.asarray(k_act), np.asarray(
        jnp.swapaxes(x_act, 1, 2)), rtol=1e-5, atol=1e-5, err_msg="actions")
    np.testing.assert_allclose(np.asarray(k_logp), np.asarray(x_logp),
                               rtol=1e-4, atol=1e-4, err_msg="logp")
    np.testing.assert_allclose(np.asarray(k_val), np.asarray(x_val),
                               rtol=1e-4, atol=1e-5, err_msg="value")
    np.testing.assert_allclose(np.asarray(k_rew), np.asarray(x_rew),
                               rtol=1e-5, atol=1e-5, err_msg="rewards")
    np.testing.assert_allclose(np.asarray(k_batt), np.asarray(x_batt),
                               rtol=1e-6, atol=1e-7, err_msg="battery")


def test_collect_day_no_battery_no_pv_variant():
    config = NanogridConfig(num_chargers=4, pv_system=False,
                            battery_system=False, penalty_mode="sparse")
    B = 128
    params, uniforms, normals, pv_shift, batt0, net, net_params = _setup(
        config, B, seed=7)
    k_obs, k_act, k_logp, k_val, k_rew, k_batt = pallas_ppo_collect_day(
        config, params, net_params, uniforms, normals, pv_shift, batt0,
        interpret=True)
    x = _xla_collect(config, params, net, net_params, uniforms, normals,
                     pv_shift, batt0)
    np.testing.assert_allclose(np.asarray(k_rew), np.asarray(x[4]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_logp), np.asarray(x[2]),
                               rtol=1e-4, atol=1e-4)


def test_ddpg_collect_day_matches_xla_rollout():
    """The explicit-uniforms DDPG collection twin (deterministic actor + OU
    via policy_xs) matches fused_day_rollout step for step: obs, clipped
    actions, rewards, next_obs (including the trailing day-end observe), and
    the carried battery SoC."""
    from smart_nanogrid_gym_tpu.ops.pallas_collect import pallas_ddpg_collect_day
    from smart_nanogrid_gym_tpu.solvers.networks import DDPGActor

    config = NanogridConfig(num_chargers=8, pv_system=True,
                            battery_system=True, penalty_mode="sparse")
    B = 256
    params = make_params(config, dtype=jnp.float32)
    T, N, A = config.steps_per_day, config.num_chargers, config.num_actions
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 5)
    uniforms = jax.random.uniform(ks[0], (T, 5, N, B), jnp.float32)
    ou_seq = 0.3 * jax.random.normal(ks[1], (T, A, B), jnp.float32)
    pv_shift = jnp.floor(jax.random.uniform(ks[2], (B,), jnp.float32) * 181.0) / 100.0
    batt0 = jax.random.uniform(ks[3], (B,), jnp.float32)
    low, high = config.action_bounds()
    actor = DDPGActor(A, tuple(low.tolist()), tuple(high.tolist()))
    net_params = actor.init(ks[4], jnp.zeros((1, config.obs_dim), jnp.float32))

    k_obs, k_act, k_rew, k_next, k_batt = pallas_ddpg_collect_day(
        config, params, net_params, uniforms, ou_seq, pv_shift, batt0,
        interpret=True)

    # XLA twin
    low_a = jnp.asarray(low, jnp.float32)
    high_a = jnp.asarray(high, jnp.float32)
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
    gen = jax.vmap(
        lambda u: generate_schedule(jax.random.PRNGKey(0), config, params,
                                    uniforms=u),
        in_axes=3, out_axes=0)
    schedules = gen(uniforms)
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states, obs = jax.vmap(functools.partial(core_reset, config))(
        bparams, keys, batt0, schedules)
    states = states._replace(pv_shift=pv_shift)

    def policy_step(ob, key_t, ou_t):
        a = actor.apply(net_params, ob)
        a = jnp.clip(a + ou_t, low_a, high_a)
        return a, (ob, a)

    xs = jnp.swapaxes(ou_seq, 1, 2)
    states, (obs_traj, rewards, dones, aux) = fused_day_rollout(
        config, bparams, states, policy_step, jax.random.PRNGKey(2),
        policy_aux=True, policy_xs=xs)
    x_obs, x_act = aux

    np.testing.assert_allclose(np.asarray(k_obs), np.asarray(
        jnp.swapaxes(x_obs, 1, 2)), rtol=1e-6, atol=1e-6, err_msg="obs")
    np.testing.assert_allclose(np.asarray(k_act), np.asarray(
        jnp.swapaxes(x_act, 1, 2)), rtol=1e-5, atol=1e-5, err_msg="actions")
    np.testing.assert_allclose(np.asarray(k_rew), np.asarray(rewards),
                               rtol=1e-5, atol=1e-5, err_msg="rewards")
    np.testing.assert_allclose(np.asarray(k_next), np.asarray(
        jnp.swapaxes(obs_traj, 1, 2)), rtol=1e-5, atol=1e-5,
        err_msg="next_obs")
    np.testing.assert_allclose(np.asarray(k_batt), np.asarray(states.batt_soc),
                               rtol=1e-5, atol=1e-6, err_msg="battery")

"""Sharding tests on a virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from smart_nanogrid_gym_tpu.core import NanogridConfig, SmartNanogridTPU
from smart_nanogrid_gym_tpu.parallel.mesh import (
    make_mesh,
    shard_env_batch,
    sharded_rollout_fn,
)
from smart_nanogrid_gym_tpu.solvers.rbc import make_rbc_policy_fn


def cpu_mesh():
    devs = jax.devices("cpu")
    assert len(devs) == 8, "conftest must force 8 virtual CPU devices"
    return make_mesh(devs)


def test_sharded_rollout_matches_unsharded():
    config = NanogridConfig(num_chargers=4, pv_system=True, battery_system=True)
    env = SmartNanogridTPU(config)
    params = env.default_params(dtype=jnp.float32)
    B = 64
    mesh = cpu_mesh()

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    bparams = env.broadcast_params(params, B)
    states, obs = env.reset_batch(bparams, keys)

    policy = make_rbc_policy_fn(config)
    policy_fn = lambda ob, k: policy(ob)

    # unsharded scan rollout
    _, _, (obs_u, rew_u, done_u, _) = env.rollout_day(bparams, states, policy_fn, obs)

    # sharded rollout over the 8-device mesh
    sb_params = shard_env_batch(bparams, mesh)
    sb_states = shard_env_batch(states, mesh)
    sb_obs = shard_env_batch(obs, mesh)
    step_keys = jax.random.split(jax.random.PRNGKey(0), config.steps_per_day)
    rollout = sharded_rollout_fn(config, mesh, policy_fn)
    states_f, obs_f, (obs_s, rew_s, done_s) = rollout(sb_params, sb_states, sb_obs, step_keys)

    np.testing.assert_allclose(np.asarray(rew_s), np.asarray(rew_u), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(obs_s), np.asarray(obs_u), rtol=1e-6)
    # results stay sharded over the mesh
    assert len(obs_f.sharding.device_set) == 8


def test_sharded_rollout_compiles_without_collectives():
    """The env rollout must not introduce cross-device communication."""
    config = NanogridConfig(num_chargers=8, pv_system=True, battery_system=True)
    env = SmartNanogridTPU(config)
    params = env.default_params(dtype=jnp.float32)
    B = 32
    mesh = cpu_mesh()
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    bparams = env.broadcast_params(params, B)
    states, obs = env.reset_batch(bparams, keys)

    policy = make_rbc_policy_fn(config)
    rollout = sharded_rollout_fn(config, mesh, lambda ob, k: policy(ob))
    sb = (shard_env_batch(bparams, mesh), shard_env_batch(states, mesh), shard_env_batch(obs, mesh))
    step_keys = jax.random.split(jax.random.PRNGKey(1), config.steps_per_day)
    compiled = rollout.lower(*sb, step_keys).compile()
    hlo = compiled.as_text()
    for comm_op in ("all-reduce", "all-gather", "collective-permute", "all-to-all", "reduce-scatter"):
        assert comm_op not in hlo, f"unexpected collective {comm_op} in env rollout"

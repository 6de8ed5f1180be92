"""Heterogeneous batches must share one compiled program (BASELINE config 3):
varying *array* params (charger masks, capacities, price/PV traces) never
recompiles; only static config flags do."""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from smart_nanogrid_gym_tpu.core import NanogridConfig, make_params
from smart_nanogrid_gym_tpu.core.transition import reset as core_reset, step as core_step


def test_varied_params_no_recompile():
    config = NanogridConfig(num_chargers=8, pv_system=True, battery_system=True)
    B = 16
    params = make_params(config, dtype=jnp.float32)
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)

    step_jit = jax.jit(jax.vmap(functools.partial(core_step, config)))
    reset_jit = jax.jit(jax.vmap(functools.partial(core_reset, config)))

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states, obs = reset_jit(bparams, keys, None, None)
    actions = jnp.zeros((B, 9), jnp.float32)
    step_jit(bparams, states, actions)
    n_compiles = step_jit._cache_size()

    # vary every interesting array param per env
    rng = np.random.RandomState(0)
    masks = (rng.rand(B, 8) > 0.3).astype(np.float32)
    masks[:, 0] = 1.0
    het = bparams._replace(
        charger_mask=jnp.asarray(masks),
        batt_capacity=jnp.asarray(rng.uniform(40, 160, B), jnp.float32),
        batt_max_power=jnp.asarray(rng.uniform(20, 60, B), jnp.float32),
        charger_max_power=jnp.asarray(rng.uniform(11, 44, B), jnp.float32),
        price=bparams.price * jnp.asarray(rng.uniform(0.5, 2.0, (B, 1)), jnp.float32),
        solar_power=bparams.solar_power * jnp.asarray(rng.uniform(0.2, 3.0, (B, 1)), jnp.float32),
    )
    states2, obs2 = reset_jit(het, keys, None, None)
    res = step_jit(het, states2, actions)
    assert np.isfinite(np.asarray(res.reward)).all()
    assert step_jit._cache_size() == n_compiles, "heterogeneous params recompiled!"

    # physics respond to the varied params: chargers with bigger max power draw more
    a = jnp.ones((B, 9), jnp.float32)
    r1 = step_jit(het, states2, a)
    powers = np.asarray(r1.info.charger_power_values)
    occ0 = np.asarray(states2.schedule.occupancy)[:, :, 0] > 0
    maxp = np.asarray(het.charger_max_power)
    for i in range(B):
        if occ0[i].any():
            expected = maxp[i] * 0.95
            got = powers[i][occ0[i]]
            np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_heterogeneous_ppo_training():
    """BASELINE config 3 end-to-end: PPO trains over a batch where every env
    has different charger masks/capacities/price/PV tables — one compiled
    train step (no recompile vs the homogeneous batch) and finite learning."""
    from smart_nanogrid_gym_tpu.solvers.ppo import PPOConfig, PPOLearner

    config = NanogridConfig(num_chargers=4, pv_system=True, battery_system=True)
    B = 32
    params = make_params(config, dtype=jnp.float32)
    learner = PPOLearner(config, PPOConfig(num_epochs=2, num_minibatches=2))
    state = learner.init(jax.random.PRNGKey(0), params, batch_size=B)
    train_step = learner.build_train_step()

    # homogeneous update first: this compiles the program
    state, metrics0 = train_step(state, learner.nanogrid_params_batched)
    n_compiles = train_step._cache_size()

    rng = np.random.RandomState(1)
    masks = (rng.rand(B, 4) > 0.3).astype(np.float32)
    masks[:, 0] = 1.0
    bparams = learner.nanogrid_params_batched
    het = bparams._replace(
        charger_mask=jnp.asarray(masks),
        batt_capacity=jnp.asarray(rng.uniform(40, 160, B), jnp.float32),
        charger_max_power=jnp.asarray(rng.uniform(11, 44, B), jnp.float32),
        price=bparams.price * jnp.asarray(rng.uniform(0.5, 2.0, (B, 1)), jnp.float32),
        solar_power=bparams.solar_power * jnp.asarray(rng.uniform(0.2, 3.0, (B, 1)), jnp.float32),
    )

    returns = []
    for _ in range(5):
        state, metrics = train_step(state, het)
        returns.append(float(metrics.mean_return))
    assert train_step._cache_size() == n_compiles, "heterogeneous PPO recompiled!"
    assert np.isfinite(returns).all(), returns
    assert np.isfinite(float(metrics.policy_loss))
    # the policy net stayed finite through heterogeneous gradients
    assert all(
        bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(state.params)
    )

"""DDPG learner + evaluator/predictor flow tests."""

import numpy as np
import jax
import jax.numpy as jnp

from smart_nanogrid_gym_tpu.core import NanogridConfig, make_params
from smart_nanogrid_gym_tpu.solvers import (
    DDPGConfig,
    DDPGLearner,
    evaluate_policies_same_days,
    make_rbc_policy_fn,
    predict_single_day,
)


CFG = NanogridConfig(num_chargers=4, pv_system=True, battery_system=True)


def test_ddpg_train_step_runs():
    learner = DDPGLearner(CFG, DDPGConfig(buffer_days=4, gradient_steps=4, batch_size=64))
    params = make_params(CFG, dtype=jnp.float32)
    state = learner.init(jax.random.PRNGKey(0), params, batch_size=16)
    state, history = learner.train(state, 3, log_every=1)
    assert int(state.update_step) == 3
    assert int(state.buffer.filled) == 3 * 24
    for m in history:
        assert all(np.isfinite(v) for v in m.values()), m
    # exploration actions landed inside the action box
    acts = np.asarray(state.buffer.actions[: 3 * 24])
    low, high = CFG.action_bounds()
    assert (acts >= low - 1e-6).all() and (acts <= high + 1e-6).all()


def test_evaluator_same_day_fairness():
    params = make_params(CFG, dtype=jnp.float32)
    rbc = make_rbc_policy_fn(CFG)
    zero = lambda obs, key: jnp.zeros(obs.shape[:-1] + (CFG.num_actions,), obs.dtype)
    results = evaluate_policies_same_days(
        CFG, params, {"rbc": lambda o, k: rbc(o), "idle": zero}, num_days=16, seed=3
    )
    assert set(results) == {"rbc", "idle"}
    assert results["rbc"].shape == (16,)
    assert np.isfinite(results["rbc"]).all() and np.isfinite(results["idle"]).all()
    # paired same-day design: arrays differ (policies act differently)
    assert not np.allclose(results["rbc"], results["idle"])


def test_predict_single_day_telemetry():
    params = make_params(CFG, dtype=jnp.float32)
    rbc = make_rbc_policy_fn(CFG)
    rewards, infos = predict_single_day(CFG, params, lambda o, k: rbc(o), seed=5, pv_shift=1.0)
    T = CFG.steps_per_day
    assert rewards.shape == (T,)
    assert infos.total_cost.shape == (T,)
    assert infos.charger_power_values.shape == (T, 4)
    np.testing.assert_allclose(np.asarray(infos.total_cost), -rewards, rtol=1e-6)

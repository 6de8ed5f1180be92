"""Failure-detection guard, DDPG mesh training, and PPO resume tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from smart_nanogrid_gym_tpu.core import NanogridConfig, make_params
from smart_nanogrid_gym_tpu.parallel.mesh import make_mesh
from smart_nanogrid_gym_tpu.solvers.ddpg import DDPGConfig, DDPGLearner
from smart_nanogrid_gym_tpu.utils.guard import TrainGuard, check_finite


def test_check_finite():
    good = {"a": jnp.ones((3,)), "b": (jnp.zeros(2), jnp.asarray(1))}
    assert bool(check_finite(good))
    bad = {"a": jnp.asarray([1.0, jnp.nan])}
    assert not bool(check_finite(bad))
    inf = {"a": jnp.asarray([jnp.inf])}
    assert not bool(check_finite(inf))


def test_train_guard_recovers_from_nan(tmp_path):
    """A step function that corrupts the state at a specific call must be
    rolled back and routed around via the RNG fold."""
    from typing import NamedTuple

    class S(NamedTuple):
        x: jnp.ndarray
        key: jnp.ndarray

    calls = {"n": 0}

    def step(state):
        calls["n"] += 1
        # corrupt exactly once, on the 4th call, when the rng is untouched
        poison = calls["n"] == 4 and int(state.key[1]) == 0
        x = state.x + 1
        if poison:
            x = x * jnp.nan
        return S(x, state.key), {"loss": x.sum()}

    key = jax.random.PRNGKey(0)
    key = jax.vmap(lambda k: k)(key[None])[0] * 0  # zero key -> poison fires
    state = S(jnp.zeros(2), jnp.zeros(2, jnp.uint32))
    guard = TrainGuard(step, str(tmp_path / "g"), save_every=2)
    final = guard.run(state, 6)
    assert guard.recoveries == 1
    assert np.isfinite(np.asarray(final.x)).all()
    assert float(final.x[0]) == 6.0


def test_ddpg_mesh_training_runs():
    mesh = make_mesh(jax.devices("cpu"))
    cfg = NanogridConfig(num_chargers=4, pv_system=True, battery_system=True)
    learner = DDPGLearner(cfg, DDPGConfig(buffer_days=2, gradient_steps=2, batch_size=32), mesh=mesh)
    params = make_params(cfg, dtype=jnp.float32)
    state = learner.init(jax.random.PRNGKey(0), params, batch_size=16)
    step_fn = learner.build_train_step()
    state2, metrics = step_fn(state, learner.nanogrid_params_batched)
    assert all(np.isfinite(float(v)) for v in metrics.values())
    # gradient sync present in the compiled program
    hlo = step_fn.lower(state, learner.nanogrid_params_batched).compile().as_text()
    assert "all-reduce" in hlo
    # actor params identical across shards (replicated update)
    leaves = jax.tree.leaves(state2.actor_params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_ppo_resume(tmp_path):
    from smart_nanogrid_gym_tpu.tools.train_ppo import main

    def args(epochs, extra=()):
        return ["--variant", "basic", "--num-chargers", "4", "--batch", "8",
                "--epochs", str(epochs), "--episodes-per-epoch", "8",
                "--models-dir", str(tmp_path / "m"), "--seed", "3", *extra]

    main(args(2))
    run_dir = os.path.join(tmp_path / "m", os.listdir(tmp_path / "m")[0])
    assert os.path.isdir(os.path.join(run_dir, "full"))
    # resume with more epochs continues from epoch 2
    state = main(args(3, ["--resume"]))
    assert int(state.update_step) >= 1

"""SB3 trained-checkpoint ingestion.

The reference ships 50 trained PPO checkpoints
(solvers/RL/models/PPO-b-pv-bounded-sparse-4ch-1h/0.zip … 999600.zip) and its
evaluator/predictor load them (solvers/evaluator.py:49-77).  These tests prove
the torch-free loader reproduces the exact policy:

- tensor extraction matches a torch.load + manual forward pass (torch is used
  ONLY as a cross-check oracle here; the loader itself never imports it);
- the final checkpoint (999600 = the fully trained policy the reference
  evaluates) produces sane b-pv day returns on this engine — far better than
  idle and in the band of a trained controller.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_nanogrid_gym_tpu.compat.sb3_loader import (
    actor_critic_params_from_sb3,
    load_sb3_actor_critic,
    load_sb3_zip,
    make_sb3_policy_fn,
)
from smart_nanogrid_gym_tpu.core import NanogridConfig, make_params
from smart_nanogrid_gym_tpu.solvers.networks import ActorCritic
from smart_nanogrid_gym_tpu.solvers.evaluator import evaluate_policies_same_days
from smart_nanogrid_gym_tpu.solvers.rbc import make_rbc_policy_fn

MODELS_DIR = "/root/reference/solvers/RL/models/PPO-b-pv-bounded-sparse-4ch-1h"
FINAL_CKPT = os.path.join(MODELS_DIR, "999600.zip")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FINAL_CKPT), reason="reference checkpoints not mounted"
)


def _config():
    # The shipped models are the b-pv 4-charger 1h sparse config
    # (reference solvers/RL/ppo_train.py:36-48,76).
    return NanogridConfig(
        num_chargers=4, pv_system=True, battery_system=True, penalty_mode="sparse"
    )


def test_state_dict_matches_torch():
    torch = pytest.importorskip("torch")
    import io
    import zipfile

    state, _ = load_sb3_zip(FINAL_CKPT)
    with zipfile.ZipFile(FINAL_CKPT) as z:
        ref = torch.load(
            io.BytesIO(z.read("policy.pth")), map_location="cpu", weights_only=True
        )
    assert set(state) == set(ref)
    for name, arr in state.items():
        np.testing.assert_array_equal(arr, ref[name].numpy(), err_msg=name)


def test_forward_pass_matches_sb3_architecture():
    """ActorCritic(loaded params) == manual SB3 MlpPolicy forward (via torch)."""
    torch = pytest.importorskip("torch")
    import io
    import zipfile

    config = _config()
    net_params, hyper = load_sb3_actor_critic(FINAL_CKPT, config)
    assert hyper["gamma"] == 0.99 and hyper["n_steps"] == 2048

    with zipfile.ZipFile(FINAL_CKPT) as z:
        sd = torch.load(
            io.BytesIO(z.read("policy.pth")), map_location="cpu", weights_only=True
        )

    obs = np.random.RandomState(3).rand(32, config.obs_dim).astype(np.float32)
    x = torch.tensor(obs)

    def torso(prefix, x):
        h = torch.tanh(torch.nn.functional.linear(
            x, sd[f"{prefix}.0.weight"], sd[f"{prefix}.0.bias"]))
        return torch.tanh(torch.nn.functional.linear(
            h, sd[f"{prefix}.2.weight"], sd[f"{prefix}.2.bias"]))

    mean_ref = torch.nn.functional.linear(
        torso("mlp_extractor.policy_net", x), sd["action_net.weight"], sd["action_net.bias"]
    ).numpy()
    value_ref = torch.nn.functional.linear(
        torso("mlp_extractor.value_net", x), sd["value_net.weight"], sd["value_net.bias"]
    ).numpy()[:, 0]

    net = ActorCritic(action_dim=config.num_actions)
    mean, log_std, value = net.apply(net_params, jnp.asarray(obs))
    np.testing.assert_allclose(np.asarray(mean), mean_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(value), value_ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(log_std), sd["log_std"].numpy(), atol=0)


def test_rejects_wrong_config():
    with pytest.raises(ValueError, match="4-charger"):
        load_sb3_actor_critic(FINAL_CKPT, NanogridConfig(num_chargers=8))


def test_trained_checkpoint_beats_idle_on_engine():
    """Checkpoint 999600 (the reference's fully trained policy) must behave
    like a trained controller on this engine: clearly better than idle."""
    config = _config()
    params = make_params(config, dtype=jnp.float32)
    net_params, _ = load_sb3_actor_critic(FINAL_CKPT, config)
    net_params = jax.tree.map(jnp.asarray, net_params)
    rbc = make_rbc_policy_fn(config)

    results = evaluate_policies_same_days(
        config,
        params,
        {
            "sb3": make_sb3_policy_fn(config, net_params),
            "rbc": lambda obs, key: rbc(obs),
            "idle": lambda obs, key: jnp.zeros(
                obs.shape[:-1] + (config.num_actions,), obs.dtype
            ),
        },
        num_days=64,
        seed=7,
    )
    sb3, rbc_r, idle = (results[k].mean() for k in ("sb3", "rbc", "idle"))
    assert np.isfinite(sb3)
    # A trained policy must massively beat doing nothing (idle ≈ -500 on 4ch
    # b-pv) and be at least in the neighborhood of the RBC baseline.
    assert sb3 > idle * 0.5, (sb3, idle)
    assert sb3 > rbc_r * 3.0, (sb3, rbc_r)


def test_early_vs_late_checkpoint_ordering():
    """Training should have improved the policy: the untrained 0.zip performs
    worse than the final 999600.zip on identical days."""
    first = os.path.join(MODELS_DIR, "0.zip")
    if not os.path.exists(first):
        pytest.skip("0.zip not shipped")
    config = _config()
    params = make_params(config, dtype=jnp.float32)
    p0, _ = load_sb3_actor_critic(first, config)
    p1, _ = load_sb3_actor_critic(FINAL_CKPT, config)
    results = evaluate_policies_same_days(
        config,
        params,
        {
            "ckpt0": make_sb3_policy_fn(config, jax.tree.map(jnp.asarray, p0)),
            "ckpt999600": make_sb3_policy_fn(config, jax.tree.map(jnp.asarray, p1)),
        },
        num_days=64,
        seed=11,
    )
    assert results["ckpt999600"].mean() > results["ckpt0"].mean()


def test_evaluate_cli_sb3(capsys, tmp_path):
    from smart_nanogrid_gym_tpu.tools.evaluate import main

    fig = tmp_path / "cmp.png"
    main([
        "--variant", "b-pv", "--num-chargers", "4", "--days", "8",
        "--sb3-models-dir", MODELS_DIR, "--plot", str(fig),
    ])
    out = capsys.readouterr().out
    assert "SB3-PPO-b-pv-bounded-sparse-4ch-1h@999600" in out
    assert fig.exists() and fig.stat().st_size > 0

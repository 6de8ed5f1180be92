"""Committed trained artifact: restore + performance regression.

The reference ships trained SB3 checkpoints; this repo ships its own flagship
policy trained on a real TPU (artifacts/PPO-b-pv-bounded-sparse-4ch-1h, see
artifacts/README.md).  This test restores it and verifies the recorded
evaluation still reproduces: the policy must beat the RBC baseline by a wide
margin on freshly generated paired days.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_nanogrid_gym_tpu.core import NanogridConfig, make_params
from smart_nanogrid_gym_tpu.solvers.evaluator import evaluate_policies_same_days
from smart_nanogrid_gym_tpu.solvers.ppo import PPOLearner
from smart_nanogrid_gym_tpu.solvers.rbc import make_rbc_policy_fn
from smart_nanogrid_gym_tpu.utils.checkpoint import latest_step, restore_checkpoint

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "PPO-b-pv-bounded-sparse-4ch-1h")

pytestmark = pytest.mark.skipif(not os.path.isdir(ART), reason="artifact absent")


def test_committed_checkpoint_beats_rbc():
    with open(os.path.join(ART, "config.json")) as fp:
        meta = json.load(fp)
    config = NanogridConfig(
        num_chargers=meta["num_chargers"],
        pv_system=meta["pv_system"],
        battery_system=meta["battery_system"],
        vehicle_to_everything=meta["vehicle_to_everything"],
        penalty_mode=meta["penalty_mode"],
        time_interval=meta["time_interval"],
    )
    params = make_params(config, dtype=jnp.float32)
    learner = PPOLearner(config)
    template = learner.init(jax.random.PRNGKey(0), params, batch_size=1).params
    step = latest_step(ART)
    assert step == 9_830_400  # 400 updates x 1024 envs x 24 steps
    net_params = restore_checkpoint(ART, step, template)

    rbc = make_rbc_policy_fn(config)
    res = evaluate_policies_same_days(
        config, params,
        {
            "ppo": learner.policy_fn(net_params),
            "rbc": lambda o, k: rbc(o),
        },
        num_days=64, seed=123,
    )
    ppo, rbc_r = res["ppo"].mean(), res["rbc"].mean()
    # recorded eval: ppo -50.6, rbc -167.6 (artifacts/.../eval.json)
    assert ppo > rbc_r * 0.5, (ppo, rbc_r)
    assert ppo > -90.0, ppo


def test_eval_sidecar_consistent():
    with open(os.path.join(ART, "eval.json")) as fp:
        ev = json.load(fp)
    assert ev["ppo"]["mean"] > ev["rbc"]["mean"] > ev["idle"]["mean"]
    assert ev["env_steps_trained"] == 9_830_400

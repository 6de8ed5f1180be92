"""Single-day prediction CLI — the TPU-native counterpart of solvers/predictor.py.

Rolls one day with a policy (RBC or a restored PPO checkpoint) and dumps the
full telemetry to a reference-compatible ``*-prediction_results.json``
(smart_nanogrid_environment.py:239-309 keys) for the visualisation notebooks.

Run:  python -m smart_nanogrid_gym_tpu.tools.predict --variant b-pv --out out/
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..compat.gym_adapter import SmartNanogridEnv
from ..solvers.rbc import make_rbc_policy_fn
from ..solvers.ppo import PPOLearner
from ..utils.checkpoint import latest_step, restore_checkpoint
from .train_ppo import VARIANTS


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--variant", choices=sorted(VARIANTS), default="b-pv")
    p.add_argument("--num-chargers", type=int, default=4)
    p.add_argument("--time-interval", default="1h")
    p.add_argument("--penalty-mode", default="sparse",
                   choices=["no_penalty", "on_departure", "sparse", "dense"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="nanogrid_outputs")
    p.add_argument("--models-dir", default=None)
    p.add_argument("--checkpoint-step", type=int, default=None)
    p.add_argument("--sb3-zip", default=None,
                   help="predict with one of the reference's shipped SB3 PPO "
                        "zips (solvers/predictor.py:60-74 flow, torch-free)")
    args = p.parse_args(argv)

    v = VARIANTS[args.variant]
    env = SmartNanogridEnv(
        number_of_chargers=args.num_chargers,
        pv_system_available_in_model=v["pv_system"],
        battery_system_available_in_model=v["battery_system"],
        vehicle_to_everything=v["vehicle_to_everything"],
        time_interval=args.time_interval,
        vehicle_uncharged_penalty_mode=args.penalty_mode,
        algorithm_used="RBC" if not (args.models_dir or args.sb3_zip) else "PPO",
        environment_mode="prediction",
        output_directory=args.out,
        seed=args.seed,
    )

    if args.sb3_zip:
        from ..compat.sb3_loader import load_sb3_actor_critic, make_sb3_policy_fn

        net_params, _ = load_sb3_actor_critic(args.sb3_zip, env.config)
        sb3_policy = make_sb3_policy_fn(env.config, jax.tree.map(jnp.asarray, net_params))
        policy = lambda obs, key: sb3_policy(obs)
    elif args.models_dir:
        learner = PPOLearner(env.config)
        from ..core import make_params

        init_state = learner.init(
            jax.random.PRNGKey(0), make_params(env.config, dtype=jnp.float32), batch_size=1
        )
        step = args.checkpoint_step if args.checkpoint_step is not None else latest_step(args.models_dir)
        net_params = restore_checkpoint(args.models_dir, step, init_state.params)
        policy = learner.policy_fn(net_params)
    else:
        rbc = make_rbc_policy_fn(env.config)
        policy = lambda obs, key: rbc(obs)

    obs, _ = env.reset()
    total = 0.0
    done = False
    while not done:
        action = np.asarray(policy(jnp.asarray(obs), None))
        obs, reward, done, _, _ = env.step(action)
        total += reward
    print(json.dumps({"day_return": total, "output_dir": env._out_dir()}))
    return total


if __name__ == "__main__":
    main()

"""Checkpoint/resume for learner states.

The reference checkpoints SB3 model zips once per epoch
(solvers/RL/ppo_train.py:94-102; 50 checkpoints shipped under
solvers/RL/models/) and resumes by load in the evaluator/predictor
(solvers/evaluator.py:69-73).  Here any pytree train state (PPOTrainState,
DDPGTrainState, raw params) round-trips through orbax with the same
numbered-checkpoint convention, plus a metadata sidecar naming the env config.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except ImportError:  # pragma: no cover
    _HAVE_ORBAX = False


def _config_metadata(env_config) -> dict:
    d = dataclasses.asdict(env_config)
    d["penalty_mode"] = int(d["penalty_mode"])
    return d


def save_checkpoint(directory: str, step: int, train_state, env_config=None) -> str:
    """Save a pytree train state under ``directory/<step>`` (numbered like the
    reference's ``{timesteps*epoch}`` zips)."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, str(step))
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(train_state), force=True)
        ckptr.wait_until_finished()
    else:
        flat, treedef = jax.tree.flatten(jax.device_get(train_state))
        os.makedirs(path, exist_ok=True)
        np.savez(os.path.join(path, "state.npz"), *[np.asarray(x) for x in flat])
    if env_config is not None:
        with open(os.path.join(directory, "config.json"), "w") as fp:
            json.dump(_config_metadata(env_config), fp, indent=2)
    return path


def restore_checkpoint(directory: str, step: int, target_state):
    """Restore into the structure of ``target_state`` (an abstract/concrete
    pytree of the same shape)."""
    path = os.path.join(os.path.abspath(directory), str(step))
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, target=jax.device_get(target_state))
    flat, treedef = jax.tree.flatten(jax.device_get(target_state))
    data = np.load(os.path.join(path, "state.npz"))
    restored = [data[k] for k in data.files]
    return jax.tree.unflatten(treedef, restored)


def latest_step(directory: str) -> int | None:
    """Largest numbered checkpoint in a directory (reference evaluator picks a
    specific number, solvers/evaluator.py:49-51; we expose both)."""
    if not os.path.isdir(directory):
        return None
    steps = [int(d) for d in os.listdir(directory) if d.isdigit()]
    return max(steps) if steps else None

"""Device-mesh sharding of env batches.

The reference has no parallel execution of any kind (SURVEY.md §2.3) — one env
object stepped by a single Python loop.  The TPU-native scaling model:

- envs are embarrassingly parallel; the env batch is sharded over a 1-D
  ``envs`` mesh axis (multi-host: the same axis spans hosts — each host
  generates/owns its shard, BASELINE config 5),
- the rolled-out step function contains **no collectives**; cross-device
  communication appears only in the learner (gradient ``psum`` over the same
  axis, :mod:`..solvers.ppo`),
- sharding is expressed with ``NamedSharding`` + ``shard_map`` so XLA lays the
  batch out once and every step stays device-resident.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import NanogridConfig
from ..core.params import NanogridParams
from ..core.step import step as core_step

ENV_AXIS = "envs"


def make_mesh(devices=None, axis_name: str = ENV_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_env_batch(tree, mesh: Mesh, axis_name: str = ENV_AXIS):
    """Place a batched pytree with its leading env axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, sharding)


def sharded_rollout_fn(
    config: NanogridConfig,
    mesh: Mesh,
    policy_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    num_steps: int | None = None,
    axis_name: str = ENV_AXIS,
):
    """Build a jitted, shard_map-ped closed-loop rollout over the env batch.

    Returns ``rollout(params, states, obs, keys) -> (states', obs', (obs, rew,
    done))`` where every argument/result has a leading env axis sharded over
    ``mesh``.  The body is per-shard pure vmapped stepping — XLA inserts no
    collectives (verified by test_parallel.py) so scaling is linear over ICI.
    """
    T = num_steps or config.steps_per_day
    step_fn = jax.vmap(functools.partial(core_step, config))

    def shard_body(params, states, obs, keys):
        def body(carry, key_t):
            st, ob = carry
            actions = policy_fn(ob, key_t)
            res = step_fn(params, st, actions)
            return (res.state, res.obs), (res.obs, res.reward, res.done)

        (states_f, obs_f), traj = jax.lax.scan(body, (states, obs), keys)
        return states_f, obs_f, traj

    spec = P(axis_name)
    traj_spec = P(None, axis_name)  # trajectories have a leading time axis
    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(spec, spec, spec, P()),  # keys are per-step, replicated
        out_specs=(spec, spec, (traj_spec, traj_spec, traj_spec)),
        check_vma=False,
    )
    return jax.jit(sharded)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh (e.g. learner params)."""
    return jax.device_put(tree, NamedSharding(mesh, P()))

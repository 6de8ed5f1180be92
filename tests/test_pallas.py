"""Pallas RBC day-rollout kernel vs the fused XLA rollout (interpret mode on CPU)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smart_nanogrid_gym_tpu.core import NanogridConfig, make_params
from smart_nanogrid_gym_tpu.core.rollout import fused_day_rollout
from smart_nanogrid_gym_tpu.core.transition import reset as core_reset
from smart_nanogrid_gym_tpu.ops.pallas_rollout import pallas_rbc_day_rollout
from smart_nanogrid_gym_tpu.solvers.rbc import make_rbc_policy_fn


@pytest.mark.parametrize(
    "config",
    [
        NanogridConfig(num_chargers=8, pv_system=True, battery_system=True),
        NanogridConfig(num_chargers=8, pv_system=True, battery_system=False),
        NanogridConfig(num_chargers=4, pv_system=False, battery_system=False, penalty_mode="dense"),
    ],
    ids=["b-pv", "pv-only", "basic-dense"],
)
def test_pallas_kernel_matches_fused(config):
    B = 128
    params = make_params(config, dtype=jnp.float32)
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states, obs = jax.vmap(functools.partial(core_reset, config))(bparams, keys, None, None)

    rbc = make_rbc_policy_fn(config)
    _, (_, rew_fused, _) = fused_day_rollout(
        config, bparams, states, lambda ob, k: rbc(ob), jax.random.PRNGKey(1)
    )

    rew_pallas, soc_final = pallas_rbc_day_rollout(config, bparams, states, interpret=True)

    np.testing.assert_allclose(
        np.asarray(rew_pallas), np.asarray(rew_fused), rtol=2e-5, atol=1e-5
    )
    assert soc_final.shape == (config.num_chargers, B)
    assert np.isfinite(np.asarray(soc_final)).all()

"""Pallas fast paths must fail loudly on non-default params.

The XLA engine reads physics constants from NanogridParams (heterogeneous
batches are a feature, core/params.py), but the Pallas kernels bake the
reference defaults at compile time.  ops/param_guard.check_baked_params makes
the mismatch an error instead of silently wrong results.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_nanogrid_gym_tpu.core import NanogridConfig, make_params
from smart_nanogrid_gym_tpu.ops.param_guard import check_baked_params
from smart_nanogrid_gym_tpu.ops.pallas_gen_rollout import pallas_gen_rbc_day


def _config():
    return NanogridConfig(num_chargers=8, pv_system=True, battery_system=True)


def test_default_params_pass():
    config = _config()
    params = make_params(config, dtype=jnp.float32)
    check_baked_params(config, params, "k", generation=True, battery_init=True)
    # batched params with the default values also pass
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (16,) + x.shape), params)
    check_baked_params(config, bparams, "k", generation=True)


@pytest.mark.parametrize(
    "field", ["batt_capacity", "charger_max_power", "sell_coefficient",
              "arrival_threshold", "charger_mask"]
)
def test_modified_param_raises(field):
    config = _config()
    params = make_params(config, dtype=jnp.float32)
    leaf = getattr(params, field)
    params = params._replace(**{field: leaf * 0.5})
    with pytest.raises(ValueError, match=field):
        check_baked_params(config, params, "k", generation=True)


def test_heterogeneous_batch_raises():
    """A batch where only SOME envs deviate must still be caught."""
    config = _config()
    params = make_params(config, dtype=jnp.float32)
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (8,) + x.shape), params)
    cap = bparams.batt_capacity.at[3].set(60.0)
    bparams = bparams._replace(batt_capacity=cap)
    with pytest.raises(ValueError, match="batt_capacity"):
        check_baked_params(config, bparams, "k")


def test_kernel_entry_point_guards():
    """End-to-end: the kernel entry itself raises before any compilation."""
    config = _config()
    params = make_params(config, dtype=jnp.float32)
    bad = params._replace(batt_capacity=jnp.asarray(60.0, jnp.float32))
    T, N, B = config.steps_per_day, config.num_chargers, 128
    uniforms = jnp.zeros((T, 5, N, B), jnp.float32)
    pv_shift = jnp.ones((B,), jnp.float32)
    with pytest.raises(ValueError, match="batt_capacity"):
        pallas_gen_rbc_day(config, bad, uniforms, pv_shift, interpret=True)


def test_traced_params_raise_type_error():
    config = _config()
    params = make_params(config, dtype=jnp.float32)

    @jax.jit
    def f(p):
        check_baked_params(config, p, "k")
        return p.price

    with pytest.raises(TypeError, match="traced"):
        f(params)


def test_policy_multiday_rejects_oversized_torso():
    """Actor torsos beyond the kernel's measured VMEM bound (512x512 wants
    ~20 MB scoped vmem at any lane width vs Mosaic's 16 MB limit) must raise
    a clear trace-time error pointing at the XLA engine path instead of
    failing deep inside the Mosaic compiler."""
    from smart_nanogrid_gym_tpu.ops.pallas_gen_policy_rollout import (
        pallas_gen_policy_multiday)
    from smart_nanogrid_gym_tpu.solvers.networks import ActorCritic

    config = _config()
    params = make_params(config, dtype=jnp.float32)
    net = ActorCritic(action_dim=config.num_actions, hidden=(512, 512))
    with jax.enable_x64(False):
        net_params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, config.obs_dim)))
        with pytest.raises(ValueError, match="VMEM"):
            pallas_gen_policy_multiday(config, params, net_params, 10, 0, 128,
                                       interpret=True)

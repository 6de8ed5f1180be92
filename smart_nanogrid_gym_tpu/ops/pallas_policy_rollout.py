"""Pallas TPU kernel: fused MLP-policy + environment full-day rollout.

The deterministic-evaluation counterpart of the PPO learner: one kernel rolls
an entire day with the trained actor network *inside* the kernel —

- the observation is assembled in VMEM as an ``(obs_dim, 128)`` block with envs
  on the lane axis, so the policy's dense layers become MXU matmuls
  ``W1ᵀ(64,obs) @ obs(obs,128) -> (64,128)`` with **no transposes and no
  observation tensor ever materialised in HBM**,
- tanh activations and the full charger/BESS physics (both charge and
  discharge branches — PPO controls the battery bidirectionally) run on the
  VPU between the matmuls,
- per-step policy inputs follow the reference's obs timing: the policy at step
  t sees the observation returned by step t-1 (envs/smart_nanogrid_environment.py:173-174),
  which for the SoC rows is exactly the previously-written column already in
  registers.

Matches ``fused_day_rollout`` driving ``PPOLearner.policy_fn(deterministic)``
bit-for-bit in f32 (asserted in tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import NanogridConfig
from ..core.params import NanogridParams
from .param_guard import check_baked_params
from ..core.rollout import build_day_tables
from ..core.state import EnvState

LANES = 128


def _policy_env_kernel(
    # scalar traces (1, P)/(1, S)
    price_ref, price_norm_ref, rad_norm_ref, solar_ref,
    # day tables (T, N, BB)
    occ_ref, cap_eff_ref, req_prev_ref, soc_cols_ref, isarr_ref, dep_ref, pmask_ref,
    # carried state (N, BB)
    prev_col0_ref, pmask0_ref,
    # per-env scalar rows (8, BB): 0=batt_soc 1=pv_shift
    scal_ref,
    # MLP weights (replicated blocks): pi torso + head, transposed for
    # envs-on-lanes matmuls
    w1_ref,  # (64, obs_dim)
    b1_ref,  # (64, 1)
    w2_ref,  # (64, 64)
    b2_ref,  # (64, 1)
    w3_ref,  # (A, 64)
    b3_ref,  # (A, 1)
    low_ref,   # (A, 1) action-space lower bounds
    high_ref,  # (A, 1) action-space upper bounds
    # outputs
    rew_ref,        # (T, BB)
    act_ref,        # (T, A, BB)
    soc_final_ref,  # (N, BB)
    *,
    T: int,
    N: int,
    obs_dim: int,
    dt: float,
    pv: bool,
    batt: bool,
):
    f32 = jnp.float32
    max_p, eff = 22.0, 0.95
    b_cap, b_maxp, b_eff, b_dod = 80.0, 44.0, 0.95, 0.15
    margin, gain = 0.05, 10.0
    w_batt, w_veh, grid_w, sell = 0.8, 1.0, 0.75, 0.8

    batt_soc = scal_ref[0:1, :]  # (1, BB)
    pv_shift = scal_ref[1:2, :]
    prev_col = prev_col0_ref[:, :]
    pmask = pmask0_ref[:, :]


    for t in range(T):
        o = max(t - 1, 0)

        # ---- observation block (obs_dim, BB), envs on lanes ----
        soc_rows = prev_col if t > 0 else soc_cols_ref[0]
        rows = []
        if pv:
            rows.append(rad_norm_ref[0, o] * pv_shift)              # (1, BB)
            rows.append(jnp.broadcast_to(price_norm_ref[0:1, o], pv_shift.shape))
            for i in range(1, 4):
                rows.append(rad_norm_ref[0, o + i] * pv_shift)
            for i in range(1, 4):
                rows.append(jnp.broadcast_to(price_norm_ref[0:1, o + i], pv_shift.shape))
        else:
            rows.append(jnp.broadcast_to(price_norm_ref[0:1, o], pv_shift.shape))
            for i in range(1, 4):
                rows.append(jnp.broadcast_to(price_norm_ref[0:1, o + i], pv_shift.shape))
        obs = jnp.concatenate(rows + [soc_rows, dep_ref[o] / 24.0]
                              + ([batt_soc] if batt else []), axis=0)  # (obs_dim, BB)
        obs = obs.astype(f32)

        # ---- MLP policy on the MXU: tanh(W2ᵀ tanh(W1ᵀ obs + b1) + b2) ----
        h1 = jnp.tanh(
            jnp.dot(w1_ref[:, :], obs, preferred_element_type=f32) + b1_ref[:, :]
        )
        h2 = jnp.tanh(
            jnp.dot(w2_ref[:, :], h1, preferred_element_type=f32) + b2_ref[:, :]
        )
        mean = jnp.dot(w3_ref[:, :], h2, preferred_element_type=f32) + b3_ref[:, :]
        actions = jnp.clip(mean, low_ref[:, :], high_ref[:, :])  # (A, BB)

        charger_actions = actions[:N]                     # (N, BB)
        battery_action = actions[N : N + 1] if batt else jnp.zeros_like(pv_shift)

        # ---- charger physics (both branches; physics.py semantics) ----
        occ_t = occ_ref[t]
        soc_col_t = soc_cols_ref[t]
        soc_eff = jnp.where(isarr_ref[t] > 0, soc_col_t, prev_col)
        cap_t = cap_eff_ref[t]
        safe_cap = jnp.where(cap_t > 0, cap_t, 1.0)
        p_raw = charger_actions * (max_p * eff)
        calc = soc_eff + (p_raw * dt) / safe_cap
        # discharge: inverted flag quirk (charger.py:122-132)
        od_flag = calc >= 0.0
        p_dis = jnp.where(od_flag, -(soc_eff * cap_t) / dt, p_raw)
        is_pos = charger_actions > 0
        is_neg = charger_actions < 0
        power = jnp.where(is_pos, p_raw, jnp.where(is_neg, p_dis, 0.0))
        soc_new = jnp.where(
            is_pos, jnp.minimum(calc, 1.0),
            jnp.where(is_neg, jnp.maximum(calc, 0.0), soc_eff),
        )
        power = jnp.where(occ_t > 0, power, 0.0)
        new_col = jnp.where(occ_t > 0, soc_new, soc_col_t)

        total_charging = jnp.sum(jnp.where(power > 0, power, 0.0), axis=0, keepdims=True)
        total_discharging = jnp.sum(jnp.where(power < 0, power, 0.0), axis=0, keepdims=True)

        # ---- vehicle penalty (carried trailing-observe mask) ----
        req_p = req_prev_ref[t]
        insufficient = prev_col < req_p - margin * req_p
        dgap = (req_p - prev_col) * gain
        veh_pen = jnp.sum(jnp.where((pmask > 0) & insufficient, dgap * dgap, 0.0),
                          axis=0, keepdims=True)
        pmask = pmask_ref[t]

        # ---- energy balance + BESS ----
        solar = (solar_ref[0, t] * pv_shift) if pv else jnp.zeros_like(pv_shift)
        remaining = total_charging + total_discharging - solar

        if batt:
            a_b = battery_action
            p_calc = a_b * (b_maxp * b_eff)
            b_calc = batt_soc + (p_calc * dt) / b_cap
            b_od = b_calc < 0.0
            p_b_dis = jnp.where(b_od, -(batt_soc * b_cap) / dt, p_calc)
            b_pos = a_b > 0
            b_neg = a_b < 0
            batt_soc = jnp.where(
                b_pos, jnp.minimum(b_calc, 1.0),
                jnp.where(b_neg, jnp.maximum(b_calc, 0.0), batt_soc),
            )
            p_used = jnp.where(b_pos, p_calc, jnp.where(b_neg, p_b_dis, 0.0))
            grid_power = remaining + p_used
            dod_gap = (b_dod - batt_soc) * gain
            dod_pen = jnp.where(batt_soc < b_dod, dod_gap * dod_gap, 0.0)
        else:
            grid_power = remaining
            dod_pen = jnp.zeros_like(veh_pen)

        grid_energy = grid_power * dt
        price_t = price_ref[0, t]
        g_cost = jnp.where(grid_energy < 0, grid_energy * (sell * price_t),
                           grid_energy * price_t)
        total_cost = grid_w * jnp.abs(g_cost) + w_batt * dod_pen + w_veh * veh_pen

        rew_ref[t, :] = -total_cost[0]
        act_ref[t] = actions
        prev_col = new_col

    soc_final_ref[:, :] = prev_col


def pallas_policy_day_rollout(
    config: NanogridConfig,
    params: NanogridParams,
    state: EnvState,
    net_params,
    interpret: bool = False,
):
    """Roll one day with a trained PPO actor, policy + env fused in one kernel.

    ``net_params``: flax params of solvers.networks.ActorCritic (the ``pi``
    torso and ``log_std``/``vf`` heads; only the deterministic mean path runs).
    Returns ``(rewards (T, B), actions (T, A, B), soc_final (N, B))``.
    """
    T, N = config.steps_per_day, config.num_chargers
    check_baked_params(config, params, "pallas_policy_day_rollout")
    if config.lookahead != 3:  # correctness guard — must survive python -O
        raise ValueError(
            "policy kernels bake the reference 3-step obs lookahead "
            "(smart_nanogrid_environment.py:52); use the XLA engine for other k")
    A = config.num_actions
    B = state.pv_shift.shape[0]
    assert B % LANES == 0, f"batch {B} must be divisible by {LANES}"

    tables = build_day_tables(config, params, state)
    tm = lambda x: jnp.moveaxis(x, -1, -2)
    prev_col0 = state.soc[..., config.table_len - 1].T
    pmask0 = state.pmask.T

    price = params.price[0].reshape(1, -1)
    price_norm = params.price_norm[0].reshape(1, -1)
    rad_norm = params.rad_norm[0].reshape(1, -1)
    solar = params.solar_power[0].reshape(1, -1)

    scal = jnp.zeros((8, B), params.dtype)
    scal = scal.at[0].set(state.batt_soc)
    scal = scal.at[1].set(state.pv_shift)

    # flax ActorCritic param layout: pi torso Dense_0/Dense_1/Dense_2
    pi = net_params["params"]["pi"]
    w1 = pi["Dense_0"]["kernel"].T.astype(jnp.float32)   # (64, obs_dim)
    b1 = pi["Dense_0"]["bias"].reshape(-1, 1).astype(jnp.float32)
    w2 = pi["Dense_1"]["kernel"].T.astype(jnp.float32)   # (64, 64)
    b2 = pi["Dense_1"]["bias"].reshape(-1, 1).astype(jnp.float32)
    w3 = pi["Dense_2"]["kernel"].T.astype(jnp.float32)   # (A, 64)
    b3 = pi["Dense_2"]["bias"].reshape(-1, 1).astype(jnp.float32)

    low, high = config.action_bounds()

    kernel = functools.partial(
        _policy_env_kernel,
        T=T, N=N, obs_dim=config.obs_dim, dt=config.time_interval,
        pv=config.pv_system, batt=config.battery_system,
    )
    low_arr = jnp.asarray(low, jnp.float32).reshape(-1, 1)
    high_arr = jnp.asarray(high, jnp.float32).reshape(-1, 1)

    P = price.shape[1]
    S = rad_norm.shape[1]
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    day = lambda: pl.BlockSpec((T, N, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    env_block = lambda rows: pl.BlockSpec((rows, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)

    rewards, actions, soc_final = pl.pallas_call(
        kernel,
        grid=(B // LANES,),
        in_specs=[
            full((1, P)), full((1, P)), full((1, S)), full((1, S)),
            day(), day(), day(), day(), day(), day(), day(),
            env_block(N), env_block(N), env_block(8),
            full(w1.shape), full(b1.shape), full(w2.shape),
            full(b2.shape), full(w3.shape), full(b3.shape),
            full(low_arr.shape), full(high_arr.shape),
        ],
        out_specs=[
            env_block(T),
            pl.BlockSpec((T, A, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            env_block(N),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B), jnp.float32),
            jax.ShapeDtypeStruct((T, A, B), jnp.float32),
            jax.ShapeDtypeStruct((N, B), jnp.float32),
        ],
        interpret=interpret,
    )(
        price, price_norm, rad_norm, solar,
        tm(tables.occupancy), tm(tables.capacity_eff), tm(tables.requested_prev),
        tm(tables.soc_cols), tm(tables.is_arrival), tm(tables.dep_obs),
        tm(tables.penalty_mask),
        prev_col0, pmask0, scal,
        w1, b1, w2, b2, w3, b3, low_arr, high_arr,
    )
    return rewards, actions, soc_final

"""Pallas TPU kernels: fused day generation + MLP-policy closed-loop rollout.

The PPO-evaluation counterpart of :mod:`.pallas_gen_rollout`: the reference's
"fresh day per episode" loop (envs/smart_nanogrid_environment.py:311-351 +
solvers/evaluator.py:13-24) with a *trained actor network* in the loop instead
of the rule-based controller.  Everything is fused into one kernel:

- the day schedule is generated column-by-column from the streaming recurrence
  shared with the RBC kernels (:func:`.pallas_gen_rollout._generate_column` —
  utils/charging_station.py:200-279 semantics, never materialised in HBM),
- the observation is assembled in VMEM as an ``(obs_dim, 128)`` block with envs
  on the lane axis, so the actor's dense layers are MXU matmuls with no
  transposes (same layout as :mod:`.pallas_policy_rollout`),
- full charger physics (both charge and discharge branches — the policy may
  command V2G/battery discharge), bidirectional BESS, penalties, and grid cost
  run on the VPU between the matmuls (physics identical to
  ops/pallas_policy_rollout.py, asserted bit-compatible in tests/test_pallas.py).

Two entry points share one step body (:func:`_gen_policy_step`):

1. :func:`pallas_gen_policy_day` — consumes an explicit uniform block
   ``(T, 5, N, B)`` (the ``generate_schedule(uniforms=...)`` contract) and is
   runnable in interpret mode: this is what the CPU test suite pins against
   ``generate_schedule`` + ``fused_day_rollout`` + the XLA policy.
2. :func:`pallas_gen_policy_multiday` — uniforms from the in-kernel hardware
   PRNG, whole days looped inside the kernel: ONE launch per tens of thousands
   of evaluation days with zero per-day HBM traffic (TPU-only; the hardware
   PRNG has no CPU interpret lowering).  Battery SoC carries across days, like
   the reference's no-reset rollover (SURVEY.md Q8) and the PPO/DDPG solvers.
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
from .pallas_gen_rollout import (
    LANES,
    _draw_step_uniforms,
    _fresh_carry,
    _generate_column,
    _pick_block,
    _step_kwargs,
    _traces,
    _uniform16_rows,
)

# reference constants (charger.py:20-23, central_management_system.py:35,
# penaliser.py:7,79,177-181, accountant.py:6,35)
_MAX_P, _EFF = 22.0, 0.95
_B_CAP, _B_MAXP, _B_EFF, _B_DOD = 80.0, 44.0, 0.95, 0.15
_MARGIN, _GAIN = 0.05, 10.0
_W_BATT, _W_VEH, _GRID_W, _SELL = 0.8, 1.0, 0.75, 0.8


def _gen_policy_step(
    t, u5, c, batt_soc,
    price_norm_ref, rad_norm_ref, pv_shift,
    w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, low_ref, high_ref,
    *, T, N, dt, pv, batt, penalty_mode, diff_caps, req_soc, k4, k10, k1,
    actor="ppo", reduce_pen=True, policy_override=None,
):
    """One timestep: generate schedule column t, run the MLP actor on the
    step-(t-1) observation (envs/smart_nanogrid_environment.py:173-174 timing),
    apply full charger/BESS physics.

    Returns ``(rows, actions (A, BB), carry, batt_soc_new)`` where ``rows``
    holds the (1, BB) per-step inputs of the grid/cost arithmetic — that part
    has no cross-step dependency, so the kernels batch it over all T steps at
    once (:func:`_policy_day_rewards`), using every sublane instead of 1 of 8.
    ``reduce_pen=False`` returns the raw (N, BB) penalty contributions in
    ``rows["pen"]`` for day-return-only kernels (one sublane reduction per day,
    see pallas_gen_rollout._gen_rbc_step).
    """
    f32 = jnp.float32
    cols, gen = _generate_column(
        t, u5, c, T=T, penalty_mode=penalty_mode, diff_caps=diff_caps,
        req_soc=req_soc, k4=k4, k10=k10, k1=k1,
    )
    arrives, occupied = cols["arrives"], cols["occupied"]
    cap_col, req_col = cols["cap_col"], cols["req_col"]
    soc_t, dep_col, mask_col = cols["soc_t"], cols["dep_col"], cols["mask_col"]

    if t == 0:
        # reset's trailing observe: the step-0 policy sees the generated
        # column 0 and the reset-time penalty-check set (§3.1/§3.2)
        pmask = mask_col
        dep_o = dep_col
        soc_rows = jnp.where(arrives, soc_t, 0.0)  # the generated SoC column 0
    else:
        pmask = c["pmask"]
        dep_o = c["prev_depcol"]
        soc_rows = c["prev_col"]

    # ---- observation block (obs_dim, BB), envs on lanes (§3.2 layout) ----
    o = max(t - 1, 0)
    rows = []
    if pv:
        rows.append(rad_norm_ref[0, o] * pv_shift)
        rows.append(jnp.broadcast_to(price_norm_ref[0:1, o], pv_shift.shape))
        for i in range(1, 4):
            rows.append(rad_norm_ref[0, o + i] * pv_shift)
        for i in range(1, 4):
            rows.append(jnp.broadcast_to(price_norm_ref[0:1, o + i], pv_shift.shape))
    else:
        rows.append(jnp.broadcast_to(price_norm_ref[0:1, o], pv_shift.shape))
        for i in range(1, 4):
            rows.append(jnp.broadcast_to(price_norm_ref[0:1, o + i], pv_shift.shape))
    obs = jnp.concatenate(
        rows + [soc_rows, dep_o / 24.0] + ([batt_soc] if batt else []), axis=0
    ).astype(f32)

    # ---- MLP actor on the MXU ----
    # The weight blocks' dtype selects the MXU mode: f32 (bit-pinned explicit
    # kernel) or bf16 inputs with f32 accumulation (one MXU pass instead of
    # the 3-pass f32 emulation; biases/activations stay f32, so only the
    # matmul operands are rounded).  ``actor`` selects the SB3-default
    # architecture (solvers/networks.py): PPO MlpPolicy (64-64 tanh torso,
    # mean clipped to the action box) or DDPG MlpPolicy (400-300 relu torso,
    # tanh squashed/affine-mapped into the box).
    if policy_override is not None:
        # the collection kernels (ops/pallas_collect.py) supply the whole
        # policy evaluation (stochastic actor + value head + log-prob) and
        # record their extras themselves; the env consumes the returned
        # CLIPPED actions exactly like the inline MLP path
        actions = policy_override(obs)
        return _gen_policy_physics(
            cols, gen, c, batt_soc, actions, pmask, pv_shift,
            N=N, dt=dt, batt=batt, diff_caps=diff_caps, req_soc=req_soc,
            reduce_pen=reduce_pen,
        )

    w1, w2, w3 = w1_ref[:, :], w2_ref[:, :], w3_ref[:, :]
    mxu = w1.dtype
    z1 = jnp.dot(w1, obs.astype(mxu), preferred_element_type=f32) + b1_ref[:, :]
    if actor == "ppo":
        h1 = jnp.tanh(z1)
        h2 = jnp.tanh(jnp.dot(w2, h1.astype(mxu), preferred_element_type=f32) + b2_ref[:, :])
        mean = jnp.dot(w3, h2.astype(mxu), preferred_element_type=f32) + b3_ref[:, :]
        actions = jnp.clip(mean, low_ref[:, :], high_ref[:, :])  # (A, BB)
    else:  # ddpg
        h1 = jax.nn.relu(z1)
        h2 = jax.nn.relu(jnp.dot(w2, h1.astype(mxu), preferred_element_type=f32) + b2_ref[:, :])
        mu = jnp.dot(w3, h2.astype(mxu), preferred_element_type=f32) + b3_ref[:, :]
        squashed = jnp.tanh(mu)
        low, high = low_ref[:, :], high_ref[:, :]
        actions = low + (squashed + 1.0) * 0.5 * (high - low)  # (A, BB)

    return _gen_policy_physics(
        cols, gen, c, batt_soc, actions, pmask, pv_shift,
        N=N, dt=dt, batt=batt, diff_caps=diff_caps, req_soc=req_soc,
        reduce_pen=reduce_pen,
    )


def _gen_policy_physics(cols, gen, c, batt_soc, actions, pmask, pv_shift,
                        *, N, dt, batt, diff_caps, req_soc, reduce_pen):
    """Charger/BESS physics + penalty for one step given the (clipped) action
    block — the post-policy half of :func:`_gen_policy_step`, shared by the
    inline-MLP path and the collection kernels' policy_override path."""
    f32 = jnp.float32
    arrives, occupied = cols["arrives"], cols["occupied"]
    cap_col, req_col = cols["cap_col"], cols["req_col"]
    soc_t, dep_col, mask_col = cols["soc_t"], cols["dep_col"], cols["mask_col"]
    charger_actions = actions[:N]
    battery_action = actions[N : N + 1] if batt else jnp.zeros_like(pv_shift)

    # ---- charger physics, both branches (core/physics.py semantics) ----
    # soc_col_t == where(arrives, soc_t, 0): where(arrives, soc_col_t, x)
    # == where(arrives, soc_t, x) bit-for-bit
    soc_eff = jnp.where(arrives, soc_t, c["prev_col"])
    if diff_caps:
        cap_eff = jnp.where(arrives, cap_col, c["prev_capcol"])
        safe_cap = jnp.where(cap_eff > 0, cap_eff, 1.0)
    else:
        # occupied ⇒ capacity is exactly _DEFAULT_CAP; non-occupied lanes are
        # masked out of power/new_col below, so both the scalar divisor and
        # the occ_f-scaled cap_eff (used by the discharge clamp) are
        # bit-identical to the select forms on every lane that flows out
        cap_eff = cols["occ_f"] * 40.0
        safe_cap = 40.0
    p_raw = charger_actions * (_MAX_P * _EFF)
    calc = soc_eff + (p_raw * dt) / safe_cap
    # discharge: inverted over-discharge flag quirk (charger.py:122-132)
    od_flag = calc >= 0.0
    p_dis = jnp.where(od_flag, -(soc_eff * cap_eff) / dt, p_raw)
    is_pos = charger_actions > 0
    is_neg = charger_actions < 0
    power = jnp.where(is_pos, p_raw, jnp.where(is_neg, p_dis, 0.0))
    soc_new = jnp.where(
        is_pos, jnp.minimum(calc, 1.0),
        jnp.where(is_neg, jnp.maximum(calc, 0.0), soc_eff),
    )
    power = jnp.where(occupied, power, 0.0)
    # ¬occupied ⇒ ¬arrives ⇒ soc_col_t == 0: the fallback lane is always 0
    new_col = jnp.where(occupied, soc_new, 0.0)

    total_charging = jnp.sum(jnp.where(power > 0, power, 0.0), axis=0, keepdims=True)
    total_discharging = jnp.sum(jnp.where(power < 0, power, 0.0), axis=0, keepdims=True)

    # ---- vehicle insufficiency penalty (trailing-observe mask; Q2 reads) ----
    # without requested-SoC, the previous requested column ≡ the carried
    # occupancy row (see pallas_gen_rollout._fresh_carry)
    req_p = c["prev_reqcol"] if req_soc else c["present"]
    insufficient = c["prev_col"] < req_p - _MARGIN * req_p
    dgap = (req_p - c["prev_col"]) * _GAIN
    veh_pen = jnp.where((pmask > 0) & insufficient, dgap * dgap, 0.0)
    if reduce_pen:
        veh_pen = jnp.sum(veh_pen, axis=0, keepdims=True)

    # ---- bidirectional BESS (sequential through batt_soc) ----
    flows = total_charging + total_discharging
    if batt:
        p_calc = battery_action * (_B_MAXP * _B_EFF)
        b_calc = batt_soc + (p_calc * dt) / _B_CAP
        b_od = b_calc < 0.0
        p_b_dis = jnp.where(b_od, -(batt_soc * _B_CAP) / dt, p_calc)
        b_pos = battery_action > 0
        b_neg = battery_action < 0
        batt_soc = jnp.where(
            b_pos, jnp.minimum(b_calc, 1.0),
            jnp.where(b_neg, jnp.maximum(b_calc, 0.0), batt_soc),
        )
        p_used = jnp.where(b_pos, p_calc, jnp.where(b_neg, p_b_dis, 0.0))
        dod_gap = (_B_DOD - batt_soc) * _GAIN
        dod_pen = jnp.where(batt_soc < _B_DOD, dod_gap * dod_gap, 0.0)
    else:
        p_used = None
        dod_pen = None

    carry = {
        **gen,
        "prev_col": new_col,
        "prev_depcol": dep_col,
        "pmask": mask_col,
    }
    if diff_caps:
        carry["prev_capcol"] = cap_col
    if req_soc:
        carry["prev_reqcol"] = req_col
    rows = {"flows": flows, "p_used": p_used, "dod": dod_pen, "pen": veh_pen}
    return rows, actions, carry, batt_soc


def _policy_day_rewards(rows, price_col, solar_col, pv_shift, *, dt, pv, batt):
    """Grid energy + cost + reward for a whole policy day at once
    (central_management_system.py:105-113, accountant.py:26-36): the grid/cost
    arithmetic has no cross-step dependency, so it runs over all T sublanes at
    once.  Elementwise arithmetic (and op order) is identical to the former
    per-step form — every (t, env) value is bit-equal.

    ``rows``: dict of per-step (1, BB) rows stacked to (T, BB) by the caller
    (keys ``flows``, ``p_used``/``dod`` when battery is on, ``pen``)."""
    if pv:
        remaining = rows["flows"] - solar_col * pv_shift
    else:
        remaining = rows["flows"]
    if batt:
        grid_power = remaining + rows["p_used"]
        batt_pen = rows["dod"]
    else:
        grid_power = remaining
        batt_pen = 0.0
    grid_energy = grid_power * dt
    g_cost = jnp.where(grid_energy < 0, grid_energy * (_SELL * price_col),
                       grid_energy * price_col)
    total_cost = _GRID_W * jnp.abs(g_cost) + _W_BATT * batt_pen
    if "pen" in rows:  # absent when the caller defers the penalty reduction
        total_cost = total_cost + _W_VEH * rows["pen"]
    return -total_cost


def _stack_rows(rows_list):
    """Stack per-step (1, BB) row dicts into (T, BB) arrays (None keys drop)."""
    return {
        k: jnp.concatenate([r[k] for r in rows_list], axis=0)
        for k in rows_list[0]
        if rows_list[0][k] is not None
    }


def _gen_policy_kernel(
    price_col_ref, price_norm_ref, rad_norm_ref, solar_col_ref,
    # uniform block (T*5, N, BB): row t*5+k = draw-kind k at timestep t
    u_ref,
    # per-env scalar rows (8, BB): 0=batt_soc 1=pv_shift
    scal_ref,
    # MLP weights + action bounds (replicated blocks)
    w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, low_ref, high_ref,
    # outputs
    rew_ref,        # (T, BB)
    act_ref,        # (T, A, BB)
    soc_final_ref,  # (N, BB)
    batt_final_ref, # (1, BB)
    *,
    T: int,
    N: int,
    **step_kw,
):
    batt_soc = scal_ref[0:1, :]
    pv_shift = scal_ref[1:2, :]

    BB = scal_ref.shape[-1]
    carry = _fresh_carry(N, BB, step_kw["diff_caps"], step_kw["req_soc"])
    step_rows = []
    for t in range(T):
        u5 = tuple(u_ref[t * 5 + k] for k in range(5))
        rows, actions, carry, batt_soc = _gen_policy_step(
            t, u5, carry, batt_soc,
            price_norm_ref, rad_norm_ref, pv_shift,
            w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, low_ref, high_ref,
            T=T, N=N, **step_kw,
        )
        step_rows.append(rows)
        act_ref[t] = actions

    rew_ref[:, :] = _policy_day_rewards(
        _stack_rows(step_rows), price_col_ref[:, :], solar_col_ref[:, :],
        pv_shift, dt=step_kw["dt"], pv=step_kw["pv"], batt=step_kw["batt"],
    )
    soc_final_ref[:, :] = carry["prev_col"]
    batt_final_ref[:, :] = batt_soc


def _gen_policy_multiday_kernel(
    price_col_ref, price_norm_ref, rad_norm_ref, solar_col_ref,
    seed_ref,  # SMEM (1, 1) int32
    w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, low_ref, high_ref,
    stats_ref,  # (8, BB): 0=Σ rewards, 1=Σ (day return)², 2=final batt SoC
    *,
    T: int,
    num_days: int,
    N: int,
    batt: bool,
    **step_kw,
):
    """Whole-evaluation kernel: ``num_days`` fresh policy-driven days per env,
    uniforms from the in-kernel PRNG, battery SoC carried across days."""
    f32 = jnp.float32
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))

    BB = stats_ref.shape[-1]
    inv24 = f32(1.0 / (1 << 24))

    def uniform(shape):
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        return pltpu.bitcast(bits >> 8, jnp.int32).astype(f32) * inv24

    draw_u5 = functools.partial(
        _draw_step_uniforms, functools.partial(_uniform16_rows, N, BB), T=T,
        diff_caps=step_kw["diff_caps"], req_soc=step_kw["req_soc"],
        k4=step_kw["k4"], k1=step_kw["k1"],
    )

    def day_body(_, st):
        rew_total, sq_total, batt_soc = st
        # reset(): fresh carries + new PV shift randint(0,181)/100; battery SoC
        # persists (central_management_system.py:93-94, SURVEY.md Q8)
        pv_shift = jnp.floor(uniform((1, BB)) * 181.0) / 100.0
        carry = _fresh_carry(N, BB, step_kw["diff_caps"], step_kw["req_soc"])

        # penalty is linear in the reward: accumulate raw (N, BB) contributions
        # and reduce over sublanes once per day (see _gen_rbc_multiday_kernel)
        pen_acc = jnp.zeros((N, BB), f32)
        step_rows = []
        for t in range(T):
            rows, _, carry, batt_soc = _gen_policy_step(
                t, draw_u5(t), carry, batt_soc,
                price_norm_ref, rad_norm_ref, pv_shift,
                w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, low_ref, high_ref,
                T=T, N=N, batt=batt, reduce_pen=False, **step_kw,
            )
            pen_acc = pen_acc + rows.pop("pen")
            step_rows.append(rows)

        rewards = _policy_day_rewards(
            _stack_rows(step_rows), price_col_ref[:, :], solar_col_ref[:, :],
            pv_shift, dt=step_kw["dt"], pv=step_kw["pv"], batt=batt,
        )
        pen_total = jnp.sum(pen_acc, axis=0, keepdims=True)
        day_return = (jnp.sum(rewards, axis=0, keepdims=True)
                      - _W_VEH * pen_total)
        return (rew_total + day_return, sq_total + day_return * day_return, batt_soc)

    zero_row = jnp.zeros((1, BB), f32)
    # reference BESS init SoC 0.5 (central_management_system.py:35)
    batt0 = jnp.full((1, BB), 0.5, f32)
    rew_total, sq_total, batt_final = jax.lax.fori_loop(
        0, num_days, day_body, (zero_row, zero_row, batt0)
    )
    stats_ref[0:1, :] = rew_total
    stats_ref[1:2, :] = sq_total
    stats_ref[2:3, :] = batt_final
    stats_ref[3:8, :] = jnp.zeros((5, BB), jnp.float32)


def _actor_blocks(config: NanogridConfig, net_params, mlp_dtype=jnp.float32,
                  actor="ppo"):
    """Extract the actor torso (``pi`` of solvers.networks.ActorCritic for
    PPO, ``mu`` of solvers.networks.DDPGActor for DDPG), transposed for
    envs-on-lanes matmuls, plus the action bounds.  ``mlp_dtype`` sets the
    weight (= MXU operand) dtype; biases stay f32 (f32 accumulation)."""
    torso = net_params["params"]["pi" if actor == "ppo" else "mu"]
    w1 = torso["Dense_0"]["kernel"].T.astype(mlp_dtype)
    b1 = torso["Dense_0"]["bias"].reshape(-1, 1).astype(jnp.float32)
    w2 = torso["Dense_1"]["kernel"].T.astype(mlp_dtype)
    b2 = torso["Dense_1"]["bias"].reshape(-1, 1).astype(jnp.float32)
    w3 = torso["Dense_2"]["kernel"].T.astype(mlp_dtype)
    b3 = torso["Dense_2"]["bias"].reshape(-1, 1).astype(jnp.float32)
    low, high = config.action_bounds()
    low_arr = jnp.asarray(low, jnp.float32).reshape(-1, 1)
    high_arr = jnp.asarray(high, jnp.float32).reshape(-1, 1)
    return w1, b1, w2, b2, w3, b3, low_arr, high_arr


def _policy_step_kwargs(config: NanogridConfig) -> dict:
    kw = _step_kwargs(config)
    kw.pop("pv")
    return dict(
        N=config.num_chargers, pv=config.pv_system, batt=config.battery_system, **kw
    )


def _full_traces(params: NanogridParams):
    def trace(x):
        return (x[0] if x.ndim == 2 else x).reshape(1, -1).astype(jnp.float32)

    price, rad_norm, solar = _traces(params)
    return price, trace(params.price_norm), rad_norm, solar


def pallas_gen_policy_day(
    config: NanogridConfig,
    params: NanogridParams,
    net_params,
    uniforms: jnp.ndarray,
    pv_shift: jnp.ndarray,
    batt_soc: jnp.ndarray | None = None,
    interpret: bool = False,
    actor: str = "ppo",
):
    """Generate a fresh day AND roll the deterministic MLP actor over it in one
    kernel.

    ``uniforms``: ``(T, 5, N, B)`` f32 block (the ``generate_schedule(uniforms=·)``
    contract).  ``net_params``: flax params of solvers.networks.ActorCritic
    (``actor="ppo"``) or solvers.networks.DDPGActor (``actor="ddpg"``).
    Returns ``(rewards (T, B), actions (T, A, B), soc_final (N, B),
    batt_final (B,))``.

    Requirements: batch divisible by 128, homogeneous params (traces from
    env 0 when batched).
    """
    check_baked_params(config, params, "pallas_gen_policy_day", generation=True)
    if config.lookahead != 3:  # correctness guard — must survive python -O
        raise ValueError(
            "policy kernels bake the reference 3-step obs lookahead "
            "(smart_nanogrid_environment.py:52); use the XLA engine for other k")
    T, N = config.steps_per_day, config.num_chargers
    A = config.num_actions
    B = pv_shift.shape[0]
    assert B % LANES == 0, f"batch {B} must be divisible by {LANES}"
    assert uniforms.shape == (T, 5, N, B), uniforms.shape

    price, price_norm, rad_norm, solar = _full_traces(params)
    price_col = price[0, :T].reshape(T, 1)
    solar_col = solar[0, :T].reshape(T, 1)

    scal = jnp.zeros((8, B), jnp.float32)
    if batt_soc is None:
        batt_soc = jnp.broadcast_to(
            params.batt_init_soc[0] if params.batt_init_soc.ndim else params.batt_init_soc,
            (B,),
        )
    scal = scal.at[0].set(batt_soc.astype(jnp.float32))
    scal = scal.at[1].set(pv_shift.astype(jnp.float32))

    u = uniforms.reshape(T * 5, N, B).astype(jnp.float32)
    weights = _actor_blocks(config, net_params, actor=actor)

    kernel = functools.partial(
        _gen_policy_kernel, T=T, actor=actor, **_policy_step_kwargs(config)
    )

    P = price.shape[1]
    S = rad_norm.shape[1]
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    env_block = lambda rows: pl.BlockSpec((rows, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)

    rewards, actions, soc_final, batt_final = pl.pallas_call(
        kernel,
        grid=(B // LANES,),
        in_specs=[
            full((T, 1)), full((1, P)), full((1, S)), full((T, 1)),
            pl.BlockSpec((T * 5, N, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            env_block(8),
        ] + [full(w.shape) for w in weights],
        out_specs=[
            env_block(T),
            pl.BlockSpec((T, A, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            env_block(N),
            env_block(1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B), jnp.float32),
            jax.ShapeDtypeStruct((T, A, B), jnp.float32),
            jax.ShapeDtypeStruct((N, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ],
        interpret=interpret,
    )(price_col, price_norm, rad_norm, solar_col, u, scal, *weights)
    return rewards, actions, soc_final, batt_final[0]


def pallas_gen_policy_multiday(
    config: NanogridConfig,
    params: NanogridParams,
    net_params,
    num_days: int,
    seed: jnp.ndarray | int,
    batch: int,
    interpret: bool = False,
    check_params: bool = True,
    mlp_dtype=jnp.float32,
    actor: str = "ppo",
):
    """Run ``num_days`` fresh generated days × ``batch`` envs of the
    deterministic MLP actor closed-loop in ONE kernel launch.
    ``actor``: "ppo" (ActorCritic pi torso) or "ddpg" (DDPGActor mu torso).

    Returns ``stats (8, batch)``: row 0 = Σ rewards per env over all days,
    row 1 = Σ (day return)², row 2 = final battery SoC.

    The in-kernel PRNG is per (seed, env-block); the step body is pinned
    bit-compatible against the XLA engine by :func:`pallas_gen_policy_day`
    (tests/test_pallas.py).  Requires a real TPU.

    ``mlp_dtype``: operand dtype of the actor matmuls.  ``jnp.bfloat16``
    (f32 accumulation) runs the MXU in its native one-pass mode and keeps
    day-return statistics within 0.5% of f32 (tests/test_tpu_kernels.py), but
    on v5e at this MLP size the kernel is NOT MXU-bound and the extra
    activation casts make it a net loss (measured 2.19 vs 2.27 B steps/s at
    batch 4096) — so exact f32 operands are the default.  The option matters
    for larger actor networks, where the matmuls dominate.
    """
    if check_params:  # callers may pre-check eagerly and pass traced params
        check_baked_params(config, params, "pallas_gen_policy_multiday",
                           generation=True, battery_init=True)
    if config.lookahead != 3:  # correctness guard — must survive python -O
        raise ValueError(
            "policy kernels bake the reference 3-step obs lookahead "
            "(smart_nanogrid_environment.py:52); use the XLA engine for other k")
    T, N = config.steps_per_day, config.num_chargers
    assert batch % LANES == 0, f"batch {batch} must be divisible by {LANES}"

    price, price_norm, rad_norm, solar = _full_traces(params)
    price_col = price[0, :T].reshape(T, 1)
    solar_col = solar[0, :T].reshape(T, 1)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    weights = _actor_blocks(config, net_params, mlp_dtype=mlp_dtype, actor=actor)

    kw = _policy_step_kwargs(config)
    batt = kw.pop("batt")
    kernel = functools.partial(
        _gen_policy_multiday_kernel,
        T=T, num_days=num_days, batt=batt, actor=actor, **kw,
    )

    P = price.shape[1]
    S = rad_norm.shape[1]
    # the MLP matmuls want the widest possible lane block: (64, k)x(k, BLOCK)
    # keeps the MXU streaming (v5e, batch 4096: 1.82/2.24/2.31 B policy-steps/s
    # at 1024/2048/4096 lanes).  Hidden activations of the unrolled day live on
    # the kernel's VMEM stack, which bounds the supported torso: measured on
    # v5e, a 256x256 torso fits at 4096 lanes (and is where bf16 operands
    # start winning — docs/PERFORMANCE.md §4), but a 512x512 torso wants
    # 30.5 MB of scoped vmem against Mosaic's 16 MB limit and stays ~20 MB
    # even at 1024 lanes (the live set is dominated by per-step activations of
    # the unrolled day, not lane width), so torsos beyond 512 summed hidden
    # units are rejected up front — the fused XLA engine path handles them.
    # Measured anchors: 64x64 and 256x256 fit at 4096 lanes; the DDPG
    # 400+300 torso fits at 512 lanes; 512x512 stays ~20 MB at any width.
    h1, h2 = weights[0].shape[0], weights[2].shape[0]
    hsum = h1 + h2
    if hsum > 768:  # correctness guard — must survive python -O
        raise ValueError(
            f"pallas_gen_policy_multiday: actor torso {h1}x{h2} exceeds the "
            "kernel's VMEM budget (512x512 measures ~20 MB scoped at any lane "
            "width vs the 16 MB limit); use the fused XLA rollout instead")
    BLOCK = _pick_block(batch, 4096 if hsum <= 512 else 512)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    (stats,) = pl.pallas_call(
        kernel,
        grid=(batch // BLOCK,),
        in_specs=[
            full((T, 1)), full((1, P)), full((1, S)), full((T, 1)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + [full(w.shape) for w in weights],
        out_specs=[
            pl.BlockSpec((8, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((8, batch), jnp.float32)],
        interpret=interpret,
    )(price_col, price_norm, rad_norm, solar_col, seed_arr, *weights)
    return stats

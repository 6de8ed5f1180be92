"""Pallas TPU kernels: fused day-schedule generation + RBC closed-loop rollout.

The benchmark's hot loop is "generate a fresh day, then roll it" (the
reference's ``reset(generate_new_initial_values=True)`` + 24 steps per episode,
envs/smart_nanogrid_environment.py:311-351, solvers/RL/ppo_train.py:94-102).
Profiling shows the XLA generation program — a 24-iteration ``lax.scan``
whose outputs are (B, N, L) tables with the tiny charger axis minor (8 of 128
lanes used) — costs ~10x the Pallas rollout itself.  These kernels remove that
program entirely: **the day schedule never exists in HBM**.

Two entry points share one day-step body (:func:`_gen_rbc_step` — the
generation recurrence of utils/charging_station.py:200-279 incl. the no-draw
departure branch (SURVEY.md Q5/Q6), the RBC policy of solvers/RBC/rbc.py, and
the charger/BESS/grid physics identical to ops/pallas_rollout.py); they differ
only in where the uniforms come from:

1. :func:`pallas_gen_rbc_day` — consumes an explicit uniform block
   ``u (T, 5, N, B)``, the same contract as
   ``core.generate.generate_schedule(uniforms=...)``.  Bit-compatible with the
   XLA engine driven from the same block, and runnable in interpret mode —
   this is the kernel the CPU test suite pins (tests/test_pallas.py).
2. :func:`pallas_gen_rbc_multiday` — generates uniforms from the in-kernel
   hardware PRNG and loops whole days inside the kernel: ONE launch per tens
   of thousands of days with zero per-day HBM traffic.  Semantics = the same
   shared step body; only the RNG source differs (distribution-exact, checked
   against the XLA engine's return statistics at runtime in bench.py).

HBM traffic per env-day: 4 KB of uniforms in + 96 B of rewards out for (1);
**nothing at all** for (2) — the compute-bound floor of the closed-loop
benchmark.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import NanogridConfig, PenaltyMode
from ..core.params import NanogridParams
from .param_guard import check_baked_params

LANES = 128


def _pick_block(batch: int, maximum: int = 1024) -> int:
    """Widest lane block (multiple of 128, <= maximum) dividing the batch.

    The multiday kernels are semantically block-width-independent (everything
    is element-wise over lanes; the PRNG is seeded per program id, so width
    only re-partitions the stream across blocks).  Wider blocks pack more
    128-lane tiles per VPU/MXU instruction — at (8, 128) tiles the RBC kernel
    is instruction-issue-bound, and the MLP kernel's (64, k)x(k, lanes)
    matmuls leave the 128x128 MXU mostly idle at 128 lanes.  Measured on v5e
    (batch 4096): RBC 5.31B -> 6.10B steps/s, MLP policy 321M -> 1.78B steps/s
    going 128 -> 1024 lanes; VMEM per block stays well under 2 MB."""
    block = maximum
    while block > LANES and batch % block:
        block -= LANES
    return block if batch % block == 0 else LANES

# RBC threshold (solvers/RBC/rbc.py:14): normalized departure < 0.16667.
DEPARTURE_SOON_THRESHOLD = 0.16667

# reference constants (charger.py:20-23, central_management_system.py:35,
# penaliser.py:7,79,177-181, accountant.py:6,35, charging_station.py:214,257-269)
_MAX_P, _EFF = 22.0, 0.95
_BATT_DOD, _MARGIN, _GAIN = 0.15, 0.05, 10.0
_W_BATT, _W_VEH, _GRID_W, _SELL = 0.8, 1.0, 0.75, 0.8
_ARRIVAL_THRESHOLD = 0.6
_SOC_LOW, _SOC_SPAN = 0.1, 0.8
_CAP_LOW, _CAP_SPAN, _DEFAULT_CAP = 15.0, 105.0, 40.0


def _fresh_carry(N, BB, diff_caps=True, req_soc=True):
    """Day-start recurrence state: all-zero generation + rollout carries
    (reset(), envs/smart_nanogrid_environment.py:311-351; the (t-1) mod L
    reads hit the zero pad column at t=0 — SURVEY.md Q2).

    With the static flags off, capacity/requested-SoC need no carry at all:
    every occupied charger holds exactly ``_DEFAULT_CAP`` / requested-SoC 1.0
    (charging_station.py:220-229 with the toggles off), so the per-step
    columns collapse to ``occ_f * const`` and the previous requested column is
    exactly the carried ``present`` row — dropping 4 lanes-wide selects per
    step from both fused kernels."""
    zero_nb = jnp.zeros((N, BB), jnp.float32)
    carry = {
        # generation (charging_station.py:200-279)
        "present": zero_nb,   # occupied at the previous step (frees on departure)
        "dep": zero_nb,       # departure timestep of the current vehicle
        # rollout (core/rollout.py): previously-written SoC column, previous
        # departure column, trailing-observe penalty mask
        "prev_col": zero_nb,
        "prev_depcol": zero_nb,
        "pmask": zero_nb,
    }
    if diff_caps:
        carry["cap"] = zero_nb
        carry["prev_capcol"] = zero_nb
    if req_soc:
        carry["req"] = zero_nb
        carry["prev_reqcol"] = zero_nb
    return carry


def _generate_column(
    t, u5, c, *, T, penalty_mode, diff_caps, req_soc, k4, k10, k1,
):
    """Schedule-generation recurrence at timestep t (the streaming form of
    utils/charging_station.py:200-279 incl. the no-draw departure branch,
    SURVEY.md Q5/Q6; bit-identical to ``generate_schedule(uniforms=...)``).

    ``u5``: the 5 uniform draws at t, each ``(N, BB)``; ``c``: carry dict with
    generation keys ``present/dep/cap/req`` (see :func:`_fresh_carry`).
    Returns ``(cols, gen)``: the schedule columns at t and the generation-carry
    updates.  Shared by the RBC and MLP-policy fused kernels.
    """
    f32 = jnp.float32
    u_arr, u_soc, u_cap, u_req, u_dep = u5
    zero_nb = jnp.zeros_like(u_arr)

    arrives = (c["present"] == 0.0) & (u_arr > _ARRIVAL_THRESHOLD)
    soc_t = _SOC_LOW + _SOC_SPAN * u_soc

    low_t = t + k4
    high_t = min(t + k10, T + k1)
    if low_t >= high_t:  # no-draw branch (charging_station.py:271-279, Q6)
        dep_new = jnp.full_like(u_dep, float(low_t))
    else:
        dep_new = low_t + jnp.floor(u_dep * float(high_t - low_t))

    present = jnp.maximum(c["present"], arrives.astype(f32))
    dep = jnp.where(arrives, dep_new, c["dep"])
    occupied = (present > 0.0) & (float(t) < dep)
    occ_f = occupied.astype(f32)

    # carried as "present": a charger departed at t frees at t+1
    gen = {"present": occ_f, "dep": dep}
    if diff_caps:
        cap_new = _CAP_LOW + jnp.floor(u_cap * _CAP_SPAN)
        cap = jnp.where(arrives, cap_new, c["cap"])
        cap_col = jnp.where(occupied, cap, 0.0)
        gen["cap"] = cap
    else:
        # every vehicle holds the fixed 40 kWh (charging_station.py:220-222
        # with the toggle off): occupied ⇒ cap == _DEFAULT_CAP exactly
        cap_col = occ_f * _DEFAULT_CAP
    if req_soc:
        soc_prime = jnp.minimum(soc_t + 0.1, 1.0)
        req_new = soc_prime + (1.0 - soc_prime) * u_req
        req = jnp.where(arrives, req_new, c["req"])
        req_col = jnp.where(occupied, req, 0.0)
        gen["req"] = req
    else:
        # requested SoC is 1.0 for every vehicle (charging_station.py:227-229
        # with the toggle off): the column is exactly the occupancy row
        req_col = occ_f

    dep_col = jnp.where(occupied, dep - float(t), 0.0)
    if penalty_mode == PenaltyMode.NO_PENALTY:
        mask_col = zero_nb
    elif penalty_mode == PenaltyMode.ON_DEPARTURE:
        mask_col = jnp.where(occupied & (dep == float(t + 1)), 1.0, 0.0)
    elif penalty_mode == PenaltyMode.SPARSE:
        mask_col = jnp.where(occupied & (dep <= float(t + 3)), 1.0, 0.0)
    else:  # DENSE
        mask_col = occ_f

    cols = {
        "arrives": arrives,
        "occupied": occupied,
        "occ_f": occ_f,
        "cap_col": cap_col,
        "req_col": req_col,
        # the SoC *column* at t is where(arrives, soc_t, 0): arrival implies
        # occupancy (dep_new > t always), so consumers rebuild any masked form
        # bit-identically from ``soc_t``/``arrives``/``occupied`` without the
        # extra lane-wide select every step
        "soc_t": soc_t,
        "dep_col": dep_col,
        "mask_col": mask_col,
    }
    return cols, gen


def _gen_rbc_step(
    t, u5, c, rad_norm_ref, pv_shift,
    *, T, dt, pv, penalty_mode, diff_caps, req_soc, k4, k10, k1,
    reduce_pen=True,
):
    """One timestep: generate schedule column t, run the RBC policy on the
    step-(t-1) observation, apply charger physics + the penalty reduction.

    ``u5``: the 5 uniform draws at t, each ``(N, BB)``.  ``c``: carry dict from
    :func:`_fresh_carry`.  Returns ``(charging_row (1, BB), pen, carry)`` —
    the grid/cost arithmetic has no cross-step dependency, so the kernels
    batch it over all T steps at once (:func:`_day_rewards`), using every
    sublane instead of 1 of 8 per step.  ``pen`` is the (1, BB) reduced
    penalty row when ``reduce_pen`` (the per-step-reward kernels), or the raw
    (N, BB) per-charger contributions when not: the penalty enters the reward
    linearly, so day-return-only kernels accumulate the (N, BB) terms and do
    ONE sublane reduction per day instead of one per step.
    """
    f32 = jnp.float32
    cols, gen = _generate_column(
        t, u5, c, T=T, penalty_mode=penalty_mode, diff_caps=diff_caps,
        req_soc=req_soc, k4=k4, k10=k10, k1=k1,
    )
    arrives, occupied, occ_f = cols["arrives"], cols["occupied"], cols["occ_f"]
    cap_col, req_col = cols["cap_col"], cols["req_col"]
    soc_t, dep_col, mask_col = cols["soc_t"], cols["dep_col"], cols["mask_col"]

    if t == 0:
        # reset's trailing observe computes the step-0 check set (§3.1)
        pmask = mask_col
        dep_o = dep_col
    else:
        pmask = c["pmask"]
        dep_o = c["prev_depcol"]

    # ---- RBC policy in-kernel (solvers/RBC/rbc.py:6-29); the policy sees the
    # observation returned by step t-1 (envs/smart_nanogrid_environment.py:173-174)
    o = max(t - 1, 0)
    if pv:
        rad_now = rad_norm_ref[0, o] * pv_shift
        rad_next = rad_norm_ref[0, o + 1] * pv_shift
        fallback = (rad_now + rad_next) * 0.5
    else:
        fallback = jnp.zeros_like(pv_shift)
    soon = dep_o < (24.0 * DEPARTURE_SOON_THRESHOLD)
    actions = jnp.where(dep_o == 0.0, 0.0, jnp.where(soon, 1.0, fallback))

    # ---- charger physics, charge branch only (RBC actions >= 0) ----
    # soc_col_t == where(arrives, soc_t, 0), so where(arrives, soc_col_t, x)
    # == where(arrives, soc_t, x) bit-for-bit
    soc_eff = jnp.where(arrives, soc_t, c["prev_col"])
    p_raw = actions * (_MAX_P * _EFF)
    if diff_caps:
        cap_eff = jnp.where(arrives, cap_col, c["prev_capcol"])
        safe_cap = jnp.where(cap_eff > 0, cap_eff, 1.0)
    else:
        # occupied ⇒ capacity is exactly _DEFAULT_CAP; unoccupied lanes are
        # masked out of new_col/power below, so the scalar divisor is
        # bit-identical to the safe_cap select on every lane that flows out
        safe_cap = _DEFAULT_CAP
    calc = soc_eff + (p_raw * dt) / safe_cap
    active = occupied & (actions > 0)
    power = jnp.where(active, p_raw, 0.0)
    soc_new = jnp.where(actions > 0, jnp.minimum(calc, 1.0), soc_eff)
    # ¬occupied ⇒ ¬arrives ⇒ soc_col_t == 0: the fallback lane is always 0
    new_col = jnp.where(occupied, soc_new, 0.0)

    total_charging = jnp.sum(power, axis=0, keepdims=True)  # (1, BB)

    # ---- vehicle insufficiency penalty (trailing-observe mask; Q2 reads) ----
    # without requested-SoC, the previous requested column ≡ the carried
    # occupancy row (see _fresh_carry)
    req_p = c["prev_reqcol"] if req_soc else c["present"]
    lower = _MARGIN * req_p
    insufficient = c["prev_col"] < req_p - lower
    diff = (req_p - c["prev_col"]) * _GAIN
    veh_pen = jnp.where((pmask > 0) & insufficient, diff * diff, 0.0)
    if reduce_pen:
        veh_pen = jnp.sum(veh_pen, axis=0, keepdims=True)

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
    return total_charging, veh_pen, carry


def _day_rewards(charging, veh_pen, price_col, solar_col, pv_shift, dod_pen,
                 *, dt, pv):
    """Grid energy + cost + reward for a whole day at once (accountant.py:26-36).

    ``charging``/``veh_pen``: (T, BB) per-step rows stacked over sublanes;
    ``price_col``/``solar_col``: (T, 1) per-timestep scalars.  Elementwise
    arithmetic is identical to the former per-step form — each (t, env) value
    is bit-equal — only the instruction shape changes (T sublanes at a time
    instead of 1).  ``veh_pen=None`` omits the vehicle-penalty term: the
    day-return-only kernels fold a once-per-day reduced penalty total into the
    return instead (the penalty is linear in the reward)."""
    if pv:
        solar = solar_col * pv_shift
        grid_power = charging - solar
    else:
        grid_power = charging
    grid_energy = grid_power * dt
    g_cost = jnp.where(grid_energy < 0, grid_energy * (_SELL * price_col),
                       grid_energy * price_col)
    total_cost = _GRID_W * jnp.abs(g_cost) + _W_BATT * dod_pen
    if veh_pen is not None:
        total_cost = total_cost + _W_VEH * veh_pen
    return -total_cost


def _idle_battery_dod_penalty(batt, batt_soc):
    """The BESS is idle under RBC (action 0), so the DoD penalty is the same
    constant every step (penaliser.py:104-111)."""
    if not batt:
        return jnp.zeros_like(batt_soc)
    dod_gap = (_BATT_DOD - batt_soc) * _GAIN
    return jnp.where(batt_soc < _BATT_DOD, dod_gap * dod_gap, 0.0)


def _gen_rbc_kernel(
    # per-timestep scalar columns (T, 1); radiation trace full (1, S)
    price_col_ref, rad_norm_ref, solar_col_ref,
    # uniform block (T*5, N, BB): row t*5+k = draw-kind k at timestep t
    u_ref,
    # per-env scalar rows (8, BB): 0=batt_soc 1=pv_shift
    scal_ref,
    # outputs
    rew_ref,        # (T, BB)
    soc_final_ref,  # (N, BB) last written SoC column
    *,
    T: int,
    N: int,
    batt: bool,
    **step_kw,
):
    batt_soc = scal_ref[0:1, :]   # (1, BB)
    pv_shift = scal_ref[1:2, :]
    dod_pen = _idle_battery_dod_penalty(batt, batt_soc)

    BB = scal_ref.shape[-1]
    carry = _fresh_carry(N, BB, step_kw["diff_caps"], step_kw["req_soc"])
    charging_rows, pen_rows = [], []
    for t in range(T):
        u5 = tuple(u_ref[t * 5 + k] for k in range(5))
        charging, pen, carry = _gen_rbc_step(
            t, u5, carry, rad_norm_ref, pv_shift, T=T, **step_kw,
        )
        charging_rows.append(charging)
        pen_rows.append(pen)

    rew_ref[:, :] = _day_rewards(
        jnp.concatenate(charging_rows, axis=0), jnp.concatenate(pen_rows, axis=0),
        price_col_ref[:, :], solar_col_ref[:, :], pv_shift, dod_pen,
        dt=step_kw["dt"], pv=step_kw["pv"],
    )
    soc_final_ref[:, :] = carry["prev_col"]


def _draw_step_uniforms(draw_rows, t, *, T, diff_caps, req_soc, k4, k1):
    """Draw ONLY the uniform kinds the generation recurrence consumes at step t.

    The explicit-uniform kernels take the full 5-kind block (the
    ``generate_schedule(uniforms=·)`` contract, which mirrors the reference's
    draw order incl. its discarded draw — SURVEY.md Q5).  The multiday kernels
    are *distribution*-exact, so unused kinds need not be generated: the
    capacity draw only exists with different-capacities, the requested-SoC draw
    only with requested-SoC, and the departure draw hits the no-draw branch for
    every t with ``t + k4 >= T + k1`` (charging_station.py:271-279).  For the
    default bench config this trims 5N to 4N (3N late-day) draws per step.
    ``_generate_column`` never reads the aliased placeholder kinds, so aliasing
    them to ``u_arr`` adds no ops.

    ``draw_rows(kinds)`` must return ``kinds`` independent uniform rows of
    shape ``(N, BB)`` (see :func:`_uniform16_rows`).
    """
    need_dep = t + k4 < T + k1
    kinds = 2 + int(diff_caps) + int(req_soc) + int(need_dep)
    rows = draw_rows(kinds)
    u_arr, u_soc = rows[0], rows[1]
    idx = 2
    if diff_caps:
        u_cap = rows[idx]
        idx += 1
    else:
        u_cap = u_arr
    if req_soc:
        u_req = rows[idx]
        idx += 1
    else:
        u_req = u_arr
    u_dep = rows[idx] if need_dep else u_arr
    return u_arr, u_soc, u_cap, u_req, u_dep


def _uniform16_rows(N, BB, kinds):
    """``kinds`` uniform rows, two 16-bit draws per hardware PRNG word.

    The multiday kernels are distribution-exact (not bit-pinned), and a 16-bit
    uniform ``b * 2^-16`` is statistically indistinguishable at their <1%
    contract: means/thresholds shift by O(2^-17) ≈ 8e-6 (the arrival test
    ``u > 0.6`` flips probability by 1.5e-5).  Packing two draws per word
    halves the random bits generated per step — the PRNG is a meaningful
    slice of the issue-bound kernel's per-step budget.
    """
    f32 = jnp.float32
    inv16 = f32(1.0 / (1 << 16))
    words = (kinds + 1) // 2
    bits = pltpu.bitcast(pltpu.prng_random_bits((words * N, BB)), jnp.uint32)
    rows = []
    for w in range(words):
        word = bits[w * N : (w + 1) * N]
        # mosaic can't cast uint32->f32; both halves fit in int32 after masking
        rows.append(pltpu.bitcast(word & jnp.uint32(0xFFFF), jnp.int32).astype(f32) * inv16)
        rows.append(pltpu.bitcast(word >> 16, jnp.int32).astype(f32) * inv16)
    return rows[:kinds]


def _gen_rbc_multiday_kernel(
    price_col_ref, rad_norm_ref, solar_col_ref,
    # seed, SMEM (1, 1) int32
    seed_ref,
    # outputs
    stats_ref,  # (8, BB): row 0 = Σ rewards over all days, row 1 = Σ (day return)²
    *,
    T: int,
    num_days: int,
    N: int,
    batt: bool,
    **step_kw,
):
    """Whole-benchmark kernel: ``num_days`` fresh days per env, uniforms from
    the in-kernel PRNG, one launch, no per-day HBM traffic at all."""
    f32 = jnp.float32
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))

    BB = stats_ref.shape[-1]
    inv24 = f32(1.0 / (1 << 24))

    def uniform(shape):
        # prng_random_bits returns *signed* int32 — bitcast before the shift so
        # it is logical, then keep the top 24 bits (uniform [0,1), f32-exact);
        # mosaic can't cast uint32->f32, but after >>8 the value fits in int32.
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        return pltpu.bitcast(bits >> 8, jnp.int32).astype(f32) * inv24

    draw_u5 = functools.partial(
        _draw_step_uniforms, functools.partial(_uniform16_rows, N, BB), T=T,
        diff_caps=step_kw["diff_caps"], req_soc=step_kw["req_soc"],
        k4=step_kw["k4"], k1=step_kw["k1"],
    )

    # reference BESS init SoC 0.5 (central_management_system.py:35)
    batt_soc = jnp.full((1, BB), 0.5, f32)
    dod_pen = _idle_battery_dod_penalty(batt, batt_soc)

    def day_body(_, stats):
        rew_total, sq_total = stats
        # reset(): fresh carries + new PV shift randint(0,180)/100
        # (envs/smart_nanogrid_environment.py:311-351,349)
        pv_shift = jnp.floor(uniform((1, BB)) * 181.0) / 100.0
        carry = _fresh_carry(N, BB, step_kw["diff_caps"], step_kw["req_soc"])

        # the penalty is linear in the reward: accumulate the raw (N, BB)
        # contributions and reduce over sublanes ONCE per day (one 3-op
        # log-reduction per day instead of per step)
        pen_acc = jnp.zeros((N, BB), f32)
        charging_rows = []
        for t in range(T):
            charging, pen_nb, carry = _gen_rbc_step(
                t, draw_u5(t), carry, rad_norm_ref, pv_shift, T=T,
                reduce_pen=False, **step_kw,
            )
            charging_rows.append(charging)
            pen_acc = pen_acc + pen_nb

        rewards = _day_rewards(
            jnp.concatenate(charging_rows, axis=0), None,
            price_col_ref[:, :], solar_col_ref[:, :], pv_shift, dod_pen,
            dt=step_kw["dt"], pv=step_kw["pv"],
        )
        pen_total = jnp.sum(pen_acc, axis=0, keepdims=True)
        day_return = (jnp.sum(rewards, axis=0, keepdims=True)
                      - _W_VEH * pen_total)
        return (rew_total + day_return, sq_total + day_return * day_return)

    zero_row = jnp.zeros((1, BB), f32)
    rew_total, sq_total = jax.lax.fori_loop(
        0, num_days, day_body, (zero_row, zero_row)
    )
    stats_ref[0:1, :] = rew_total
    stats_ref[1:2, :] = sq_total
    stats_ref[2:8, :] = jnp.zeros((6, BB), f32)


def _step_kwargs(config: NanogridConfig) -> dict:
    return dict(
        dt=config.time_interval,
        pv=config.pv_system,
        penalty_mode=int(config.penalty_mode),
        diff_caps=config.different_battery_capacities,
        req_soc=config.requested_state_of_charge,
        k4=int(4 / config.time_interval),
        k10=int(10 / config.time_interval),
        k1=int(1 / config.time_interval),
    )


def _traces(params: NanogridParams):
    def trace(x):  # params may be batched (B, P) or unbatched (P,)
        return (x[0] if x.ndim == 2 else x).reshape(1, -1).astype(jnp.float32)

    return trace(params.price), trace(params.rad_norm), trace(params.solar_power)


def pallas_gen_rbc_day(
    config: NanogridConfig,
    params: NanogridParams,
    uniforms: jnp.ndarray,
    pv_shift: jnp.ndarray,
    batt_soc: jnp.ndarray | None = None,
    interpret: bool = False,
):
    """Generate a fresh day AND roll the RBC policy over it in one kernel.

    ``uniforms``: ``(T, 5, N, B)`` f32 block — same contract as
    ``generate_schedule(uniforms=...)`` per env (draw kinds: arrival, SoC,
    capacity, requested-SoC, departure).  ``pv_shift``: ``(B,)``.
    ``batt_soc``: ``(B,)`` initial BESS SoC (defaults to the reference's 0.5).
    Returns ``(rewards (T, B), soc_final (N, B))``.

    Requirements: non-v2x config, batch divisible by 128, homogeneous params
    (traces taken from env 0 when params are batched).
    """
    assert not config.vehicle_to_everything, "RBC kernel covers non-v2x configs"
    check_baked_params(config, params, "pallas_gen_rbc_day", generation=True)
    T, N = config.steps_per_day, config.num_chargers
    B = pv_shift.shape[0]
    assert B % LANES == 0, f"batch {B} must be divisible by {LANES}"
    assert uniforms.shape == (T, 5, N, B), uniforms.shape

    price, rad_norm, solar = _traces(params)
    price_col = price[0, :T].reshape(T, 1)
    solar_col = solar[0, :T].reshape(T, 1)

    scal = jnp.zeros((8, B), jnp.float32)
    if batt_soc is None:
        batt_soc = jnp.broadcast_to(
            params.batt_init_soc[0] if params.batt_init_soc.ndim else params.batt_init_soc, (B,)
        )
    scal = scal.at[0].set(batt_soc.astype(jnp.float32))
    scal = scal.at[1].set(pv_shift.astype(jnp.float32))

    u = uniforms.reshape(T * 5, N, B).astype(jnp.float32)

    kernel = functools.partial(
        _gen_rbc_kernel,
        T=T, N=N, batt=config.battery_system, **_step_kwargs(config),
    )

    S = rad_norm.shape[1]
    rewards, soc_final = pl.pallas_call(
        kernel,
        grid=(B // LANES,),
        in_specs=[
            pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T * 5, N, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B), jnp.float32),
            jax.ShapeDtypeStruct((N, B), jnp.float32),
        ],
        interpret=interpret,
    )(price_col, rad_norm, solar_col, u, scal)
    return rewards, soc_final


def pallas_gen_rbc_multiday(
    config: NanogridConfig,
    params: NanogridParams,
    num_days: int,
    seed: jnp.ndarray | int,
    batch: int,
    interpret: bool = False,
    check_params: bool = True,
):
    """Run ``num_days`` fresh generated days × ``batch`` envs of the RBC
    closed-loop in ONE kernel launch (in-kernel PRNG, no per-day HBM traffic).

    Returns ``stats (8, batch)``: row 0 = Σ rewards per env over all days,
    row 1 = Σ (day return)² per env (for distribution checks).

    The in-kernel PRNG is per (seed, env-block); uniforms use the 24-bit
    mantissa conversion, reproducing the reference's draw *distributions* —
    bit-parity with ``jax.random`` is pinned by :func:`pallas_gen_rbc_day`,
    which shares the full step body.  Requires a real TPU (the hardware PRNG
    has no interpret-mode lowering on CPU).
    """
    assert not config.vehicle_to_everything, "RBC kernel covers non-v2x configs"
    if check_params:  # callers may pre-check eagerly and pass traced params
        check_baked_params(config, params, "pallas_gen_rbc_multiday",
                           generation=True, battery_init=True)
    T, N = config.steps_per_day, config.num_chargers
    assert batch % LANES == 0, f"batch {batch} must be divisible by {LANES}"

    price, rad_norm, solar = _traces(params)
    price_col = price[0, :T].reshape(T, 1)
    solar_col = solar[0, :T].reshape(T, 1)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    kernel = functools.partial(
        _gen_rbc_multiday_kernel,
        T=T, num_days=num_days, N=N, batt=config.battery_system,
        **_step_kwargs(config),
    )

    S = rad_norm.shape[1]
    # wide lane blocks amortize instruction issue; with the slimmed carries the
    # kernel is width-insensitive past 2048 on v5e (6.80/6.81/6.82 B steps/s at
    # 1024/2048/4096 lanes, batch 4096) — take the widest block that divides
    BLOCK = _pick_block(batch, 4096)
    (stats,) = pl.pallas_call(
        kernel,
        grid=(batch // BLOCK,),
        in_specs=[
            pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((8, batch), jnp.float32)],
        interpret=interpret,
    )(price_col, rad_norm, solar_col, seed_arr)
    return stats

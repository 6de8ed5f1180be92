"""Trajectory-emitting PPO collection kernel: generation + stochastic actor +
value head + physics in ONE launch, writing the whole (T, ·, B) rollout.

Round-4 profiling (docs/PERFORMANCE.md §5) left the PPO update's rollout
phase at ~1.5 ms on the fused XLA day scan — generation, the actor forward,
Gaussian sampling, log-probs, the value head, and physics each dispatched as
separate XLA ops per step.  This kernel is the training twin of
:mod:`.pallas_gen_policy_rollout`'s evaluation kernels: the same fused
generation + physics step body (bit-pinned against the XLA engine), plus

- the stochastic actor: ``a_raw = mean + exp(log_std)·normal`` with the env
  consuming the CLIPPED action while the trajectory records the RAW action
  and its Gaussian log-prob (solvers/ppo.py::_rollout's exact semantics);
- the value head (``vf`` torso of ActorCritic) evaluated on the same
  observation block;
- per-step trajectory writes: obs (T, F, B), raw actions (T, A, B), log-prob
  / value / reward (T, B), final battery SoC (1, B) — layouts that feed the
  whole-sweep kernel's feature-lane streaming with ZERO transposes or
  gathers anywhere in the update.

Two entry points share the step body, following the repo's twin-kernel
pattern (pallas_gen_rollout.py):

1. :func:`pallas_ppo_collect_day` — explicit generation uniforms ``(T, 5, N,
   B)``, explicit standard normals ``(T, A, B)``, explicit pv_shift:
   interpret-runnable on CPU, pinned bit-compatible against
   ``fused_day_rollout`` + the XLA policy with the same injected noise
   (tests/test_collect_kernel.py).
2. :func:`pallas_ppo_collect_day_seeded` — uniforms AND normals (Box-Muller)
   from the in-kernel hardware PRNG, pv_shift drawn like a fresh reset:
   the whole reset+rollout of one training update in one launch (TPU-only;
   statistically pinned on chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import NanogridConfig
from ..core.params import NanogridParams
from .param_guard import check_baked_params
from .pallas_gen_policy_rollout import (
    _full_traces,
    _gen_policy_step,
    _policy_day_rewards,
    _policy_step_kwargs,
    _stack_rows,
)
from .pallas_gen_rollout import (
    LANES,
    _draw_step_uniforms,
    _fresh_carry,
    _pick_block,
    _uniform16_rows,
)

_LOG_2PI = float(np.log(2.0 * np.pi))


def _ac_blocks(config: NanogridConfig, net_params):
    """ActorCritic params -> lanes-layout blocks: pi torso, log_std, vf
    torso, action bounds.  All f32 (the collection forward is part of the
    training data path — no mixed precision here)."""
    p = net_params["params"]
    blocks = []
    for head in ("pi", "vf"):
        torso = p[head]
        for i in range(3):
            d = torso[f"Dense_{i}"]
            blocks.append(jnp.transpose(d["kernel"]).astype(jnp.float32))
            blocks.append(d["bias"].reshape(-1, 1).astype(jnp.float32))
    blocks.append(p["log_std"].reshape(-1, 1).astype(jnp.float32))
    low, high = config.action_bounds()
    blocks.append(jnp.asarray(low, jnp.float32).reshape(-1, 1))
    blocks.append(jnp.asarray(high, jnp.float32).reshape(-1, 1))
    return blocks


def _collect_policy(obs, normal_t, weight_refs, record):
    """Stochastic ActorCritic evaluation on an (F, BB) obs block.

    Returns the CLIPPED actions for the env; records (raw action, logp,
    value) into ``record`` (a per-step dict the kernel body collects)."""
    f32 = jnp.float32
    (pw1, pb1, pw2, pb2, pw3, pb3,
     vw1, vb1, vw2, vb2, vw3, vb3, ls, low, high) = [
        r[:, :] for r in weight_refs]
    dot = functools.partial(jnp.dot, preferred_element_type=f32)

    h1 = jnp.tanh(dot(pw1, obs) + pb1)
    h2 = jnp.tanh(dot(pw2, h1) + pb2)
    mean = dot(pw3, h2) + pb3                   # (A, BB)

    g1 = jnp.tanh(dot(vw1, obs) + vb1)
    g2 = jnp.tanh(dot(vw2, g1) + vb2)
    value = dot(vw3, g2) + vb3                  # (1, BB)

    std = jnp.exp(ls)                           # (A, 1)
    a_raw = mean + std * normal_t               # (A, BB)
    diff = a_raw - mean
    var = std * std
    logp = jnp.sum(
        -0.5 * (diff * diff / var + 2.0 * ls + f32(_LOG_2PI)),
        axis=0, keepdims=True,
    )                                           # (1, BB)
    record["act"] = a_raw
    record["logp"] = logp
    record["value"] = value
    record["obs"] = obs
    return jnp.clip(a_raw, low, high)


def _ddpg_blocks(config: NanogridConfig, net_params):
    """DDPGActor params -> lanes-layout blocks: mu torso + action bounds."""
    p = net_params["params"]["mu"]
    blocks = []
    for i in range(3):
        d = p[f"Dense_{i}"]
        blocks.append(jnp.transpose(d["kernel"]).astype(jnp.float32))
        blocks.append(d["bias"].reshape(-1, 1).astype(jnp.float32))
    low, high = config.action_bounds()
    blocks.append(jnp.asarray(low, jnp.float32).reshape(-1, 1))
    blocks.append(jnp.asarray(high, jnp.float32).reshape(-1, 1))
    return blocks


def _ddpg_policy(obs, ou_t, weight_refs, record):
    """Deterministic DDPG actor + OU exploration noise on an (F, BB) block:
    ``a = clip(squash(mu(obs)) + ou_t, low, high)`` — exactly
    solvers/ddpg.py::_collect's policy_step.  Records obs and the CLIPPED
    action (the stored replay action)."""
    f32 = jnp.float32
    (w1, b1, w2, b2, w3, b3, low, high) = [r[:, :] for r in weight_refs]
    dot = functools.partial(jnp.dot, preferred_element_type=f32)
    h1 = jax.nn.relu(dot(w1, obs) + b1)
    h2 = jax.nn.relu(dot(w2, h1) + b2)
    mu = dot(w3, h2) + b3
    squashed = jnp.tanh(mu)
    det = low + (squashed + 1.0) * 0.5 * (high - low)
    a = jnp.clip(det + ou_t, low, high)
    record["obs"] = obs
    record["act"] = a
    return a


def _final_observe(carry, batt_soc, price_norm_ref, rad_norm_ref, pv_shift,
                   *, T, pv, batt):
    """The trailing day-end observation (t = T): the reference's observe after
    the last step — same row assembly as _gen_policy_step's t>0 branch with
    o = T-1 and the post-step carries."""
    o = T - 1
    rows = []
    if pv:
        rows.append(rad_norm_ref[0, o] * pv_shift)
        rows.append(jnp.broadcast_to(price_norm_ref[0:1, o], pv_shift.shape))
        for i in range(1, 4):
            rows.append(rad_norm_ref[0, o + i] * pv_shift)
        for i in range(1, 4):
            rows.append(jnp.broadcast_to(price_norm_ref[0:1, o + i],
                                         pv_shift.shape))
    else:
        rows.append(jnp.broadcast_to(price_norm_ref[0:1, o], pv_shift.shape))
        for i in range(1, 4):
            rows.append(jnp.broadcast_to(price_norm_ref[0:1, o + i],
                                         pv_shift.shape))
    return jnp.concatenate(
        rows + [carry["prev_col"], carry["prev_depcol"] / 24.0]
        + ([batt_soc] if batt else []), axis=0
    ).astype(jnp.float32)


def _ddpg_collect_kernel(
    price_col_ref, price_norm_ref, rad_norm_ref, solar_col_ref,
    u_or_seed_ref, ou_ref, scal_ref,
    *refs,
    T: int, N: int, A: int, F: int, seeded: bool, **step_kw,
):
    weight_refs = refs[0:8]
    (obs_out, act_out, rew_out, next_out, batt_out) = refs[8:13]

    f32 = jnp.float32
    BB = scal_ref.shape[-1]
    batt_soc = scal_ref[0:1, :]
    if seeded:
        pltpu.prng_seed(u_or_seed_ref[0, 0] + pl.program_id(0))
        inv24 = f32(1.0 / (1 << 24))

        def uniform(shape):
            bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            return pltpu.bitcast(bits >> 8, jnp.int32).astype(f32) * inv24

        draw_u5 = functools.partial(
            _draw_step_uniforms, functools.partial(_uniform16_rows, N, BB),
            T=T, diff_caps=step_kw["diff_caps"], req_soc=step_kw["req_soc"],
            k4=step_kw["k4"], k1=step_kw["k1"],
        )
        pv_shift = jnp.floor(uniform((1, BB)) * 181.0) / 100.0
    else:
        pv_shift = scal_ref[1:2, :]

    carry = _fresh_carry(N, BB, step_kw["diff_caps"], step_kw["req_soc"])
    step_rows, recs = [], []
    for t in range(T):
        u5 = (draw_u5(t) if seeded
              else tuple(u_or_seed_ref[t * 5 + k] for k in range(5)))
        rec = {}
        rows, _, carry, batt_soc = _gen_policy_step(
            t, u5, carry, batt_soc,
            price_norm_ref, rad_norm_ref, pv_shift,
            None, None, None, None, None, None, None, None,
            T=T, N=N,
            policy_override=functools.partial(
                _ddpg_policy, ou_t=ou_ref[t], weight_refs=weight_refs,
                record=rec),
            **step_kw,
        )
        step_rows.append(rows)
        recs.append(rec)

    rew_out[:, :] = _policy_day_rewards(
        _stack_rows(step_rows), price_col_ref[:, :], solar_col_ref[:, :],
        pv_shift, dt=step_kw["dt"], pv=step_kw["pv"], batt=step_kw["batt"],
    )
    obs_out[...] = jnp.concatenate(
        [r["obs"] for r in recs], axis=0).reshape(T, F, BB)
    act_out[...] = jnp.concatenate(
        [r["act"] for r in recs], axis=0).reshape(T, A, BB)
    final_obs = _final_observe(
        carry, batt_soc, price_norm_ref, rad_norm_ref, pv_shift,
        T=T, pv=step_kw["pv"], batt=step_kw["batt"])
    next_out[...] = jnp.concatenate(
        [r["obs"] for r in recs[1:]] + [final_obs], axis=0).reshape(T, F, BB)
    batt_out[:, :] = batt_soc


def _collect_kernel(
    price_col_ref, price_norm_ref, rad_norm_ref, solar_col_ref,
    u_or_seed_ref, normals_ref, scal_ref,
    *refs,
    T: int, N: int, A: int, F: int, seeded: bool, **step_kw,
):
    weight_refs = refs[0:15]
    (obs_out, act_out, logp_out, val_out, rew_out, batt_out) = refs[15:21]

    f32 = jnp.float32
    BB = scal_ref.shape[-1]
    batt_soc = scal_ref[0:1, :]
    if seeded:
        pltpu.prng_seed(u_or_seed_ref[0, 0] + pl.program_id(0))
        inv24 = f32(1.0 / (1 << 24))

        def uniform(shape):
            bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            return pltpu.bitcast(bits >> 8, jnp.int32).astype(f32) * inv24

        def normal(shape):
            # Box-Muller from two 24-bit uniforms; 1-u1 ∈ (0, 1] guards the
            # log, truncating the tail at ~5.8σ (u -> 2^-24)
            u1 = uniform(shape)
            u2 = uniform(shape)
            r = jnp.sqrt(-2.0 * jnp.log(1.0 - u1))
            return r * jnp.cos(f32(2.0 * np.pi) * u2)

        draw_u5 = functools.partial(
            _draw_step_uniforms, functools.partial(_uniform16_rows, N, BB),
            T=T, diff_caps=step_kw["diff_caps"], req_soc=step_kw["req_soc"],
            k4=step_kw["k4"], k1=step_kw["k1"],
        )
        # fresh reset: new PV shift randint(0,181)/100 (core reset semantics)
        pv_shift = jnp.floor(uniform((1, BB)) * 181.0) / 100.0
    else:
        pv_shift = scal_ref[1:2, :]

    carry = _fresh_carry(N, BB, step_kw["diff_caps"], step_kw["req_soc"])
    step_rows, recs = [], []
    for t in range(T):
        u5 = (draw_u5(t) if seeded
              else tuple(u_or_seed_ref[t * 5 + k] for k in range(5)))
        normal_t = normal((A, BB)) if seeded else normals_ref[t]
        rec = {}
        rows, _, carry, batt_soc = _gen_policy_step(
            t, u5, carry, batt_soc,
            price_norm_ref, rad_norm_ref, pv_shift,
            None, None, None, None, None, None, None, None,
            T=T, N=N,
            policy_override=functools.partial(
                _collect_policy, normal_t=normal_t,
                weight_refs=weight_refs, record=rec),
            **step_kw,
        )
        step_rows.append(rows)
        recs.append(rec)

    rew_out[:, :] = _policy_day_rewards(
        _stack_rows(step_rows), price_col_ref[:, :], solar_col_ref[:, :],
        pv_shift, dt=step_kw["dt"], pv=step_kw["pv"], batt=step_kw["batt"],
    )
    obs_out[...] = jnp.concatenate(
        [r["obs"] for r in recs], axis=0).reshape(T, F, BB)
    act_out[...] = jnp.concatenate(
        [r["act"] for r in recs], axis=0).reshape(T, A, BB)
    logp_out[:, :] = jnp.concatenate([r["logp"] for r in recs], axis=0)
    val_out[:, :] = jnp.concatenate([r["value"] for r in recs], axis=0)
    batt_out[:, :] = batt_soc


def _collect_call(config, params, net_params, batch, block, u_or_seed,
                  normals, scal, interpret):
    T, N, A, F = (config.steps_per_day, config.num_chargers,
                  config.num_actions, config.obs_dim)
    price, price_norm, rad_norm, solar = _full_traces(params)
    price_col = price[0, :T].reshape(T, 1)
    solar_col = solar[0, :T].reshape(T, 1)
    weights = _ac_blocks(config, net_params)
    seeded = normals is None

    kw = _policy_step_kwargs(config)  # includes N
    kernel = functools.partial(
        _collect_kernel, T=T, A=A, F=F, seeded=seeded, **kw)

    P, S = price.shape[1], rad_norm.shape[1]
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    env_block = lambda rows: pl.BlockSpec(
        (rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    env_block3 = lambda a, b: pl.BlockSpec(
        (a, b, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    if seeded:
        u_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)
        n_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)
        normals = jnp.zeros((1, 1), jnp.float32)  # unused placeholder
    else:
        u_spec = env_block3(T * 5, N)
        n_spec = env_block3(T, A)

    outs = pl.pallas_call(
        kernel,
        grid=(batch // block,),
        # XLA:TPU places the whole trajectory-output tuple (14.5 MB at 4096
        # envs) in scoped vmem alongside the kernel's working set, tripping
        # the default 16 MB limit — raise it for this kernel (v5e has ample
        # physical VMEM; measured need ~18 MB at 4096 envs, block 1024)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[full((T, 1)), full((1, P)), full((1, S)), full((T, 1)),
                  u_spec, n_spec, env_block(8)]
        + [full(w.shape) for w in weights],
        out_specs=[env_block3(T, F), env_block3(T, A), env_block(T),
                   env_block(T), env_block(T), env_block(1)],
        out_shape=[
            jax.ShapeDtypeStruct((T, F, batch), jnp.float32),
            jax.ShapeDtypeStruct((T, A, batch), jnp.float32),
            jax.ShapeDtypeStruct((T, batch), jnp.float32),
            jax.ShapeDtypeStruct((T, batch), jnp.float32),
            jax.ShapeDtypeStruct((T, batch), jnp.float32),
            jax.ShapeDtypeStruct((1, batch), jnp.float32),
        ],
        interpret=interpret,
    )(price_col, price_norm, rad_norm, solar_col, u_or_seed, normals, scal,
      *weights)
    obs, act, logp, val, rew, batt = outs
    return obs, act, logp, val, rew, batt[0]


def _ddpg_collect_call(config, params, net_params, batch, block, u_or_seed,
                       ou_seq, scal, interpret):
    T, N, A, F = (config.steps_per_day, config.num_chargers,
                  config.num_actions, config.obs_dim)
    price, price_norm, rad_norm, solar = _full_traces(params)
    price_col = price[0, :T].reshape(T, 1)
    solar_col = solar[0, :T].reshape(T, 1)
    weights = _ddpg_blocks(config, net_params)
    seeded = u_or_seed.ndim == 2 and u_or_seed.shape == (1, 1)

    kw = _policy_step_kwargs(config)  # includes N
    kernel = functools.partial(
        _ddpg_collect_kernel, T=T, A=A, F=F, seeded=seeded, **kw)

    P, S = price.shape[1], rad_norm.shape[1]
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    env_block = lambda rows: pl.BlockSpec(
        (rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    env_block3 = lambda a, b: pl.BlockSpec(
        (a, b, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    u_spec = (pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
              if seeded else env_block3(T * 5, N))

    outs = pl.pallas_call(
        kernel,
        grid=(batch // block,),
        # same scoped-vmem story as the PPO collect: the (T, F, B) trajectory
        # outputs land in vmem next to the kernel working set
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[full((T, 1)), full((1, P)), full((1, S)), full((T, 1)),
                  u_spec, env_block3(T, A), env_block(8)]
        + [full(w.shape) for w in weights],
        out_specs=[env_block3(T, F), env_block3(T, A), env_block(T),
                   env_block3(T, F), env_block(1)],
        out_shape=[
            jax.ShapeDtypeStruct((T, F, batch), jnp.float32),
            jax.ShapeDtypeStruct((T, A, batch), jnp.float32),
            jax.ShapeDtypeStruct((T, batch), jnp.float32),
            jax.ShapeDtypeStruct((T, F, batch), jnp.float32),
            jax.ShapeDtypeStruct((1, batch), jnp.float32),
        ],
        interpret=interpret,
    )(price_col, price_norm, rad_norm, solar_col, u_or_seed,
      ou_seq.astype(jnp.float32), scal, *weights)
    obs, act, rew, nxt, batt = outs
    return obs, act, rew, nxt, batt[0]


def pallas_ddpg_collect_day(
    config: NanogridConfig,
    params: NanogridParams,
    net_params,
    uniforms: jnp.ndarray,
    ou_seq: jnp.ndarray,
    pv_shift: jnp.ndarray,
    batt_soc: jnp.ndarray,
    interpret: bool = False,
):
    """Explicit-uniforms DDPG collection day (CPU-testable twin).

    ``ou_seq``: (T, A, B) Ornstein-Uhlenbeck noise sequence (precomputed in
    XLA — the OU recurrence is trajectory-independent, solvers/ddpg.py).
    Returns ``(obs (T, F, B), act (T, A, B) clipped, rewards (T, B),
    next_obs (T, F, B), batt_final (B,))``.
    """
    check_baked_params(config, params, "pallas_ddpg_collect_day",
                       generation=True)
    if config.lookahead != 3:  # correctness guard — must survive python -O
        raise ValueError(
            "collection kernel bakes the reference 3-step obs lookahead; "
            "use the XLA rollout for other k")
    T, N, A = config.steps_per_day, config.num_chargers, config.num_actions
    B = pv_shift.shape[0]
    assert B % LANES == 0, f"batch {B} must be divisible by {LANES}"
    assert uniforms.shape == (T, 5, N, B), uniforms.shape
    assert ou_seq.shape == (T, A, B), ou_seq.shape
    scal = jnp.zeros((8, B), jnp.float32)
    scal = scal.at[0].set(batt_soc.astype(jnp.float32))
    scal = scal.at[1].set(pv_shift.astype(jnp.float32))
    u = uniforms.reshape(T * 5, N, B).astype(jnp.float32)
    block = _pick_block(B, 512)
    return _ddpg_collect_call(config, params, net_params, B, block, u,
                              ou_seq, scal, interpret)


def pallas_ddpg_collect_day_seeded(
    config: NanogridConfig,
    params: NanogridParams,
    net_params,
    seed,
    ou_seq: jnp.ndarray,
    batt_soc: jnp.ndarray,
    batch: int,
    interpret: bool = False,
    check_params: bool = True,
):
    """DDPG collection with in-kernel generation (uniforms + fresh-day PV
    shift from the hardware PRNG) and the EXPLICIT OU noise sequence — the
    exploration stream stays bitwise the XLA learner's.  TPU-only.
    """
    if check_params:
        check_baked_params(config, params, "pallas_ddpg_collect_day_seeded",
                           generation=True)
    if config.lookahead != 3:  # correctness guard — must survive python -O
        raise ValueError(
            "collection kernel bakes the reference 3-step obs lookahead; "
            "use the XLA rollout for other k")
    B = batch
    assert B % LANES == 0, f"batch {B} must be divisible by {LANES}"
    assert ou_seq.shape == (config.steps_per_day, config.num_actions, B)
    scal = jnp.zeros((8, B), jnp.float32)
    scal = scal.at[0].set(jnp.broadcast_to(
        jnp.asarray(batt_soc, jnp.float32), (B,)))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    # DDPG's 400+300 torso keeps larger activations live per step than the
    # PPO collect; 512 lanes fits the scoped budget comfortably
    block = _pick_block(B, 512)
    return _ddpg_collect_call(config, params, net_params, B, block, seed_arr,
                              ou_seq, scal, interpret)


def pallas_ppo_collect_day(
    config: NanogridConfig,
    params: NanogridParams,
    net_params,
    uniforms: jnp.ndarray,
    normals: jnp.ndarray,
    pv_shift: jnp.ndarray,
    batt_soc: jnp.ndarray,
    interpret: bool = False,
):
    """Explicit-noise collection day (the CPU-testable twin).

    ``uniforms``: (T, 5, N, B) generation block (``generate_schedule``
    contract); ``normals``: (T, A, B) standard normals (the action-noise
    stream).  Returns ``(obs (T, F, B), act_raw (T, A, B), logp (T, B),
    value (T, B), rewards (T, B), batt_final (B,))``.
    """
    check_baked_params(config, params, "pallas_ppo_collect_day",
                       generation=True)
    if config.lookahead != 3:  # correctness guard — must survive python -O
        raise ValueError(
            "collection kernel bakes the reference 3-step obs lookahead; "
            "use the XLA rollout for other k")
    T, N, A = config.steps_per_day, config.num_chargers, config.num_actions
    B = pv_shift.shape[0]
    assert B % LANES == 0, f"batch {B} must be divisible by {LANES}"
    assert uniforms.shape == (T, 5, N, B), uniforms.shape
    assert normals.shape == (T, A, B), normals.shape

    scal = jnp.zeros((8, B), jnp.float32)
    scal = scal.at[0].set(batt_soc.astype(jnp.float32))
    scal = scal.at[1].set(pv_shift.astype(jnp.float32))
    u = uniforms.reshape(T * 5, N, B).astype(jnp.float32)
    block = _pick_block(B, 1024)
    return _collect_call(config, params, net_params, B, block, u,
                         normals.astype(jnp.float32), scal, interpret)


def pallas_ppo_collect_day_seeded(
    config: NanogridConfig,
    params: NanogridParams,
    net_params,
    seed,
    batt_soc: jnp.ndarray,
    batch: int,
    interpret: bool = False,
    check_params: bool = True,
):
    """Whole reset+rollout of one training update in one launch: generation
    uniforms, the fresh-day PV shift, and the action-noise normals all come
    from the in-kernel hardware PRNG (per (seed, env-block) streams).
    TPU-only; statistically pinned against the XLA rollout on chip
    (tests/test_tpu_kernels.py) and structurally by the explicit twin.

    Returns the same tuple as :func:`pallas_ppo_collect_day`.
    """
    if check_params:
        check_baked_params(config, params, "pallas_ppo_collect_day_seeded",
                           generation=True)
    if config.lookahead != 3:  # correctness guard — must survive python -O
        raise ValueError(
            "collection kernel bakes the reference 3-step obs lookahead; "
            "use the XLA rollout for other k")
    B = batch
    assert B % LANES == 0, f"batch {B} must be divisible by {LANES}"
    scal = jnp.zeros((8, B), jnp.float32)
    scal = scal.at[0].set(jnp.broadcast_to(
        jnp.asarray(batt_soc, jnp.float32), (B,)))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    # VMEM: the unrolled day's trajectory records AND the out blocks live in
    # scoped vmem together — 2048 lanes measured 19.2 MB vs the 16 MB limit
    # on v5e at the default config; 1024 fits with headroom
    block = _pick_block(B, 1024)
    return _collect_call(config, params, net_params, B, block, seed_arr,
                         None, scal, interpret)

"""Whole-sweep PPO update kernel: every gradient step of an update in ONE
Pallas launch.

Why this exists (docs/PERFORMANCE.md §5): the reference's headline workload is
PPO *training* (solvers/RL/ppo_train.py:94-102 — 1.02M sequential env steps
per run), and after round 4 both learners sat at XLA's ~100 µs-per-sequential-
grad-step floor — each of the 40 epoch×minibatch steps pays a fixed chain of
gather + forward + backward + Adam kernel launches regardless of useful FLOPs
(the whole 10-epoch sweep is ~4.3 ms of a 5.8 ms update at 4096 envs).  This
kernel removes the floor structurally:

- **params + Adam moments resident in VMEM** for the whole sweep: 13 tensors
  (~12k floats each for params/mu/nu at the SB3 64×64 torso) live in output
  blocks with constant index maps — fetched from HBM once, written back once,
  zero per-step optimizer traffic;
- **grid = (grad steps, row chunks)**, sequential on TPU: the minibatch
  samples stream through double-buffered VMEM chunks (Pallas pipelines the
  next chunk's DMA behind the current chunk's compute), gradients accumulate
  in VMEM scratch, and the clip+Adam update runs at each step's last chunk;
- **activations live lanes-packed** ((feat, M): samples in the lane axis —
  the same layout rule as the fused rollout kernels) while obs/act STREAM in
  sample-major ``(CHUNK, feat)`` blocks: the HBM side is then a pure reshape
  of the gathered rollout (a feature-major HBM layout needs a 5-axis XLA
  transpose of the 10-epoch gather — measured ~4 ms/update on v5e, 1.5× the
  whole kernel) and the MXU absorbs the orientation via dot_general
  dimension numbers;
- **hand-written backward** for the tanh actor-critic and the clipped PPO
  loss (the tanh derivative is recomputed from saved activations, 1 - y²,
  so no pre-activations are stored).

The per-epoch env permutations and the per-minibatch advantage normalization
are *data-only* transforms (independent of params), so they are precomputed
in XLA and handed to the kernel as ``(G, M, feat)`` arrays — ONE leading-axis
row gather per epoch plus reshapes (µs-scale, measured round 4), and the
kernel itself contains no data-dependent indexing.

Exact-parity contract with the XLA path (solvers/ppo.py::_shard_train_step):

- loss: the clipped PPO surrogate + 0.5·MSE value loss + entropy bonus with
  a state-independent log-std Gaussian policy, minibatch means — identical
  math, including the balanced-tie gradient of ``jnp.minimum`` at
  ``pg1 == pg2`` (0.5/0.5 split, which reduces to the plain advantage inside
  the clip region) and the clip-region indicator of ``jnp.clip``;
- optimizer: optax ``chain(clip_by_global_norm(max_norm), adam(lr))`` —
  trigger = (global_norm < max_norm), else (g/norm)·max_norm; Adam with
  mu/nu moments, ``count_inc`` bias correction ``1 - b^t``, eps outside the
  sqrt (optax._src.transform.scale_by_adam, eps_root=0);
- parity pinned by tests/test_ppo_sweep_kernel.py: interpret-mode param
  trajectories vs jax.grad + optax at rtol ≤1e-5, plus bit-stable reruns.

TPU-only assumptions: none — the kernel uses no hardware PRNG, so
``interpret=True`` runs it on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class SweepHypers(NamedTuple):
    """Static hyperparameters baked into the compiled kernel."""

    lr: float
    clip_eps: float
    vf_coef: float
    ent_coef: float
    max_grad_norm: float
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    # Matmul OPERAND dtype for the in-kernel fwd/bwd passes (accumulation and
    # everything else stays f32 — standard mixed precision with f32 master
    # params).  At the kernel's K-starved shapes (K=25/64 per matmul) the MXU
    # runs f32 operands as a 3-pass bf16 decomposition, so bf16 operands cut
    # MXU passes ~3x.  None = exact f32 (the parity-tested default).
    matmul_dtype: object = None


# parameter layout: [W1 b1 W2 b2 W3 b3] for pi, then vf, then log_std — the
# 13-leaf flat form of the ActorCritic flax tree (solvers/networks.py), with
# kernels TRANSPOSED to (out, in) and biases/log_std as (n, 1) columns so the
# kernel's sample-lanes layout broadcasts them for free.
N_PARAMS = 13


def _pick_chunk(M: int, F: int, A: int, H1: int, H2: int,
                budget_bytes: int = 9 * 2 ** 20) -> int:
    """Largest divisor of the minibatch sample count that keeps the chunk's
    VMEM working set under budget.  Per-sample cost model (f32 bytes): the
    sample-major obs/act blocks pad features to full 128-lane tiles and are
    double-buffered; the four lanes-packed activations, the act transpose,
    and ~3 live backward temporaries are single-buffered."""
    padlane = lambda n: -(-n // 128) * 128
    per_sample = 4 * (
        2 * (padlane(F) + padlane(A))          # obs/act blocks, double-buffered
        + 6 * 8                                # (1, CHUNK) scalar rows
        + 2 * (H1 + H2)                        # y1/y2 for both nets
        + 3 * 16 + (H1 + H2)                   # act_t/diff/g_mean + g1/g2 live
    )
    target = max(1, budget_bytes // per_sample)
    for c in range(min(M, target), 0, -1):
        if M % c == 0:
            return c
    return M


def _metric_row(vals):
    """Build a (1, W) lane vector whose first len(vals) columns hold the given
    scalars (scalar→vector construction via iota-select, Mosaic-friendly)."""
    W = 8
    col = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    row = jnp.zeros((1, W), jnp.float32)
    for i, v in enumerate(vals):
        row = jnp.where(col == i, v.astype(jnp.float32), row)
    return row


def _sweep_kernel(hp: SweepHypers, n_chunks: int, m_rows: int, streamed: bool,
                  featlane: bool, *all_refs):
    if streamed:
        # PrefetchScalarGridSpec prepends the scalar-prefetch refs: the
        # per-(g, c) block indices and the per-minibatch advantage stats
        bidx_ref, stats_ref = all_refs[0], all_refs[1]
        (obs_ref, act_ref, logp_ref, nadv_ref, ret_ref,
         count_ref) = all_refs[2:8]
        refs = all_refs[8:]
    else:
        bidx_ref = stats_ref = None
        (obs_ref, act_ref, logp_ref, nadv_ref, ret_ref,
         count_ref) = all_refs[0:6]
        refs = all_refs[6:]
    params_in = refs[0:13]
    mu_in = refs[13:26]
    nu_in = refs[26:39]
    params_out = refs[39:52]
    mu_out = refs[52:65]
    nu_out = refs[65:78]
    metrics_ref = refs[78]
    grads = refs[79:92]
    acc_ref = refs[92]

    g = pl.program_id(0)
    c = pl.program_id(1)
    f32 = jnp.float32
    inv_m = f32(1.0 / m_rows)

    @pl.when((g == 0) & (c == 0))
    def _load_state():
        for i in range(N_PARAMS):
            params_out[i][...] = params_in[i][...]
            mu_out[i][...] = mu_in[i][...]
            nu_out[i][...] = nu_in[i][...]

    @pl.when(c == 0)
    def _zero_accumulators():
        for i in range(N_PARAMS):
            grads[i][...] = jnp.zeros_like(grads[i])
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # ------------------------------------------------------------- forward --
    # weights (out, in), biases (out, 1); activations/per-sample rows are
    # lanes-packed (feat, CHUNK).  obs/act stream in SAMPLE-major (CHUNK, F)
    # blocks — pure reshapes of the gathered rollout in HBM (a feature-major
    # HBM layout would need a 5-axis XLA transpose of the whole 10-epoch
    # gather, measured at ~4 ms/update on v5e, 1.5× the kernel itself).  The
    # MXU absorbs the orientation for free via dot_general dimension numbers;
    # only `act` (which feeds ELEMENTWISE math against (A, CHUNK) tensors) is
    # transposed in-kernel, by an exact identity matmul.
    (pW1, pb1, pW2, pb2, pW3, pb3,
     vW1, vb1, vW2, vb2, vW3, vb3, log_std) = [r[...] for r in params_out]

    old_logp = logp_ref[0]    # (1, CHUNK)
    ret = ret_ref[0]          # (1, CHUNK)
    if streamed:
        # raw advantages stream by block; normalize with the minibatch stats
        # (precomputed from block sums — same formula as the XLA path's
        # (adv - mean)/(std + 1e-8) up to f32 reduction order)
        mean_g = stats_ref[0, g]
        std_g = stats_ref[1, g]
        nadv = (nadv_ref[0] - mean_g) / (std_g + f32(1e-8))
    else:
        nadv = nadv_ref[0]    # (1, CHUNK), pre-normalized

    mm_cast = (lambda x: x) if hp.matmul_dtype is None else (
        lambda x: x.astype(hp.matmul_dtype))
    dot = lambda a, b: jnp.dot(mm_cast(a), mm_cast(b),
                               preferred_element_type=f32)
    # contract the lane (sample) axis of both operands: (P, M)·(Q, M) -> (P, Q)
    lanedot = lambda a, b: jax.lax.dot_general(
        mm_cast(a), mm_cast(b), (((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    # contract the sublane axis of both operands: (K, P)·(K, M) -> (P, M)
    subdot = lambda a, b: jax.lax.dot_general(
        mm_cast(a), mm_cast(b), (((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    # (out, in) weight × (CHUNK, in) sample-major data -> (out, CHUNK)
    featdot = lambda W, x: jax.lax.dot_general(
        mm_cast(W), mm_cast(x), (((1,), (1,)), ((), ())),
        preferred_element_type=f32)

    if featlane:
        # data already lanes-packed ((feat, CHUNK): the collection kernel's
        # native trajectory layout) — no transposes of any kind
        obs_fl = obs_ref[0]                    # (F, CHUNK)
        act = act_ref[0]                       # (A, CHUNK)
        in1 = lambda W: dot(W, obs_fl)
        gw1 = lambda g1: lanedot(g1, obs_fl)   # (H1, F)
    else:
        obs_sm = obs_ref[0]                    # (CHUNK, F) sample-major
        act_sm = act_ref[0]                    # (CHUNK, A) sample-major
        in1 = lambda W: featdot(W, obs_sm)
        gw1 = lambda g1: dot(g1, obs_sm)       # (H1, F)
        # exact lanes-packing transpose of act: eye(A) @ act_smᵀ via the
        # MXU — always f32 operands (a DATA transpose, not a network
        # matmul; it must stay exact under matmul_dtype mixed precision)
        eye_a = (jax.lax.broadcasted_iota(jnp.int32, act_sm.shape[1:] * 2, 0)
                 == jax.lax.broadcasted_iota(jnp.int32, act_sm.shape[1:] * 2, 1)
                 ).astype(f32)
        act = jax.lax.dot_general(eye_a, act_sm, (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)  # (A, CHUNK)

    y1p = jnp.tanh(in1(pW1) + pb1)             # (H1, CHUNK)
    y2p = jnp.tanh(dot(pW2, y1p) + pb2)        # (H2, CHUNK)
    mean = dot(pW3, y2p) + pb3                 # (A, CHUNK)

    y1v = jnp.tanh(in1(vW1) + vb1)
    y2v = jnp.tanh(dot(vW2, y1v) + vb2)
    value = dot(vW3, y2v) + vb3                # (1, CHUNK)

    # Gaussian log-prob with state-independent log-std (ppo.py::_gaussian_logp)
    var = jnp.exp(2.0 * log_std)               # (A, 1)
    diff = act - mean                          # (A, CHUNK)
    logp = jnp.sum(
        -0.5 * (diff * diff / var + 2.0 * log_std + f32(np.log(2 * np.pi))),
        axis=0, keepdims=True,
    )                                          # (1, CHUNK)

    ratio = jnp.exp(logp - old_logp)
    lo, hi = f32(1.0 - hp.clip_eps), f32(1.0 + hp.clip_eps)
    pg1 = ratio * nadv
    pg2 = jnp.clip(ratio, lo, hi) * nadv
    min_pg = jnp.minimum(pg1, pg2)
    verr = value - ret                         # (1, CHUNK)

    # ------------------------------------------------------------ backward --
    # d total/d ratio through -mean(min(pg1, pg2)): jnp.minimum's balanced-tie
    # rule (0.5/0.5 at pg1 == pg2 — the common in-clip-region case, where both
    # branch derivatives equal nadv) and jnp.clip's in-region indicator.
    in_region = ((ratio > lo) & (ratio < hi)).astype(f32)
    d_pg1 = nadv
    d_pg2 = nadv * in_region
    tie = 0.5 * (d_pg1 + d_pg2)
    d_ratio = jnp.where(pg1 < pg2, d_pg1, jnp.where(pg1 > pg2, d_pg2, tie))
    dL_dlogp = (-inv_m) * d_ratio * ratio      # (1, CHUNK)

    g_mean = dL_dlogp * (diff / var)           # (A, CHUNK)
    # d logp/d log_std_j = diff²/var - 1 per dim; the entropy bonus adds a
    # constant -ent_coef per dim at the update (total loss subtracts
    # ent_coef·sum(log_std + const))
    g_log_std = jnp.sum(dL_dlogp * (diff * diff / var - 1.0),
                        axis=1, keepdims=True)  # (A, 1)

    g_value = (hp.vf_coef * inv_m) * verr      # (1, CHUNK)  d(0.5·vf·MSE)/dv

    def mlp_backward(y1, y2, W2, W3, g_out, grad_slot):
        """Accumulate transposed-layout grads of a 2-hidden-layer tanh MLP
        (the input-layer weight grad uses the layout-matched ``gw1``)."""
        gW3 = lanedot(g_out, y2)                       # (A, H2)
        gb3 = jnp.sum(g_out, axis=1, keepdims=True)    # (A, 1)
        g2 = subdot(W3, g_out) * (1.0 - y2 * y2)       # (H2, CHUNK)
        gW2 = lanedot(g2, y1)
        gb2 = jnp.sum(g2, axis=1, keepdims=True)
        g1 = subdot(W2, g2) * (1.0 - y1 * y1)          # (H1, CHUNK)
        gW1 = gw1(g1)                                  # (H1, F)
        gb1 = jnp.sum(g1, axis=1, keepdims=True)
        for slot, val in zip(grad_slot, (gW1, gb1, gW2, gb2, gW3, gb3)):
            slot[...] += val

    mlp_backward(y1p, y2p, pW2, pW3, g_mean, grads[0:6])
    mlp_backward(y1v, y2v, vW2, vW3, g_value, grads[6:12])
    grads[12][...] += g_log_std

    # ------------------------------------------------- loss/metric tallies --
    acc_ref[...] += _metric_row([
        -jnp.sum(min_pg),                         # policy loss ·M
        0.5 * jnp.sum(verr * verr),               # value loss ·M
        jnp.sum((ratio - 1.0) - jnp.log(ratio)),  # approx KL ·M
    ])

    # --------------------------------------------- clip + Adam (last chunk) --
    @pl.when(c == n_chunks - 1)
    def _apply_update():
        # entropy term: state-independent, exact scalar (ppo.py::_loss)
        entropy = jnp.sum(log_std + f32(0.5 * np.log(2 * np.pi * np.e)))
        # finalize the per-dim log_std grad with the entropy bonus
        grads[12][...] += f32(-hp.ent_coef)

        sq = f32(0.0)
        for i in range(N_PARAMS):
            sq += jnp.sum(grads[i][...] * grads[i][...])
        g_norm = jnp.sqrt(sq)
        trigger = g_norm < f32(hp.max_grad_norm)

        # optax bias correction with count_inc = count + (g steps so far) + 1
        t = (count_ref[0, 0] + g + 1).astype(f32)
        bc1 = 1.0 - jnp.exp(t * f32(np.log(hp.adam_b1)))
        bc2 = 1.0 - jnp.exp(t * f32(np.log(hp.adam_b2)))

        for i in range(N_PARAMS):
            gi = grads[i][...]
            gi = jnp.where(trigger, gi, (gi / g_norm) * f32(hp.max_grad_norm))
            m = hp.adam_b1 * mu_out[i][...] + (1.0 - hp.adam_b1) * gi
            v = hp.adam_b2 * nu_out[i][...] + (1.0 - hp.adam_b2) * gi * gi
            mu_out[i][...] = m
            nu_out[i][...] = v
            upd = (m / bc1) / (jnp.sqrt(v / bc2) + f32(hp.adam_eps))
            params_out[i][...] = params_out[i][...] - f32(hp.lr) * upd

        sums = acc_ref[...]
        metrics_ref[0] = _metric_row([
            sums[0, 0] * inv_m,     # policy loss
            sums[0, 1] * inv_m,     # value loss
            entropy,                # entropy (scalar, not a mean)
            sums[0, 2] * inv_m,     # approx KL
        ])


def _flatten_actor_critic(tree):
    """ActorCritic flax tree -> the kernel's transposed 13-leaf order.

    Kernels become (out, in); biases and log_std become (n, 1) columns."""
    p = tree["params"]
    leaves = []
    for net in ("pi", "vf"):
        sub = p[net]
        expected = {f"Dense_{i}" for i in range(3)}
        if set(sub.keys()) != expected:
            raise ValueError(
                f"sweep kernel supports exactly 2 hidden layers; {net} has "
                f"{sorted(sub.keys())} — use the XLA sweep (sweep_impl='xla')")
        for i in range(3):
            d = sub[f"Dense_{i}"]
            leaves.append(jnp.transpose(d["kernel"]))
            leaves.append(d["bias"].reshape(-1, 1))
    leaves.append(p["log_std"].reshape(-1, 1))
    return leaves


def _unflatten_actor_critic(template, leaves):
    """Inverse of _flatten_actor_critic onto the template's structure (path-
    keyed so it works for dicts and FrozenDicts alike)."""
    sem = {}
    for n, net in enumerate(("pi", "vf")):
        for i in range(3):
            sem[(net, f"Dense_{i}", "kernel")] = jnp.transpose(
                leaves[n * 6 + 2 * i])
            sem[(net, f"Dense_{i}", "bias")] = leaves[n * 6 + 2 * i + 1]
    sem[("log_std",)] = leaves[12]

    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, ref in flat:
        keys = tuple(getattr(k, "key", str(k)) for k in path)[1:]  # drop 'params'
        new_leaves.append(sem[keys].reshape(ref.shape).astype(ref.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def ppo_sweep_pallas(
    params,
    adam_count,
    adam_mu,
    adam_nu,
    obs_g,
    act_g,
    logp_g,
    nadv_g,
    ret_g,
    hypers: SweepHypers,
    interpret: bool = False,
    chunk_override: int | None = None,
):
    """Run the whole epoch×minibatch sweep in one Pallas launch.

    Arguments
    ---------
    params / adam_mu / adam_nu : ActorCritic flax trees (f32)
    adam_count : int32 scalar — optax ScaleByAdamState.count BEFORE the sweep
    obs_g, act_g : pre-permuted minibatch tensors of shape (G, M, feat)
        (sample-major — a pure reshape of the gathered env-major rollout)
    logp_g, nadv_g, ret_g : (G, M) with per-minibatch-normalized advantages
        in ``nadv_g``
    hypers : SweepHypers (static — baked into the compiled kernel)

    Returns ``(new_params, new_count, new_mu, new_nu, metrics)`` with
    ``metrics`` of shape (G, 4): policy_loss, value_loss, entropy, approx_kl
    per gradient step.
    """
    G, M = logp_g.shape[0], logp_g.shape[1]
    F, A = obs_g.shape[2], act_g.shape[2]
    p_leaves = _flatten_actor_critic(params)
    mu_leaves = _flatten_actor_critic(adam_mu)
    nu_leaves = _flatten_actor_critic(adam_nu)
    H1, H2 = p_leaves[0].shape[0], p_leaves[2].shape[0]

    chunk = chunk_override or _pick_chunk(M, F, A, H1, H2)
    if M % chunk:
        raise ValueError(f"chunk {chunk} must divide the minibatch size {M}")
    n_chunks = M // chunk

    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda g, c: (0,) * len(shape), memory_space=pltpu.VMEM)
    feat_spec = lambda feat: pl.BlockSpec(
        (1, chunk, feat), lambda g, c: (g, c, 0), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, chunk), lambda g, c: (g, 0, c),
                            memory_space=pltpu.VMEM)

    in_specs = (
        [feat_spec(F), feat_spec(A), row_spec, row_spec, row_spec]
        + [pl.BlockSpec((1, 1), lambda g, c: (0, 0), memory_space=pltpu.SMEM)]
        + [const_spec(x.shape) for x in p_leaves]
        + [const_spec(x.shape) for x in mu_leaves]
        + [const_spec(x.shape) for x in nu_leaves]
    )
    out_specs = (
        [const_spec(x.shape) for x in p_leaves] * 3
        + [pl.BlockSpec((1, 1, 8), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM)]
    )
    out_shape = (
        [jax.ShapeDtypeStruct(x.shape, jnp.float32) for x in p_leaves] * 3
        + [jax.ShapeDtypeStruct((G, 1, 8), jnp.float32)]
    )
    scratch_shapes = (
        [pltpu.VMEM(x.shape, jnp.float32) for x in p_leaves]
        + [pltpu.VMEM((1, 8), jnp.float32)]
    )

    kernel = functools.partial(_sweep_kernel, hypers, n_chunks, M, False, False)
    outs = pl.pallas_call(
        kernel,
        grid=(G, n_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(
        obs_g.astype(jnp.float32),
        act_g.astype(jnp.float32),
        logp_g.astype(jnp.float32).reshape(G, 1, M),
        nadv_g.astype(jnp.float32).reshape(G, 1, M),
        ret_g.astype(jnp.float32).reshape(G, 1, M),
        jnp.asarray(adam_count, jnp.int32).reshape(1, 1),
        *[x.astype(jnp.float32) for x in p_leaves],
        *[x.astype(jnp.float32) for x in mu_leaves],
        *[x.astype(jnp.float32) for x in nu_leaves],
    )

    new_p = _unflatten_actor_critic(params, outs[0:13])
    new_mu = _unflatten_actor_critic(adam_mu, outs[13:26])
    new_nu = _unflatten_actor_critic(adam_nu, outs[26:39])
    metrics = outs[39][:, 0, :4]
    new_count = jnp.asarray(adam_count, jnp.int32) + jnp.int32(G)
    return new_p, new_count, new_mu, new_nu, metrics


def ppo_sweep_pallas_streamed(
    params,
    adam_count,
    adam_mu,
    adam_nu,
    obs_flat,
    act_flat,
    logp_flat,
    adv_flat,
    ret_flat,
    block_perm,
    granule: int,
    hypers: SweepHypers,
    interpret: bool = False,
    data_layout: str = "sample",
):
    """Zero-copy variant of :func:`ppo_sweep_pallas` for the "block"
    minibatch scheme: the kernel reads the FLAT trajectory arrays directly,
    with the per-(grad-step, chunk) sample-block index fed through Pallas
    scalar prefetch into the data index maps.

    Why: materializing the shuffled ``(G, M, feat)`` minibatch tensors costs
    ~1.5 ms/update of HBM gather traffic at SB3 defaults (each sample copied
    ``num_epochs`` times); here nothing is copied — the shuffle IS the index
    map, and each block is DMA'd straight from the rollout layout as it
    streams through the grid.  Per-minibatch advantage normalization moves
    in-kernel, from stats precomputed out of per-block sums (algebraically
    the XLA path's ``(adv-mean)/(std+1e-8)``; f32 reduction order differs).

    Arguments
    ---------
    obs_flat .. ret_flat : env-major flat trajectory arrays, leading axis
        S = n_blocks·granule samples
    block_perm : (G, M // granule) int32 — for each gradient step, the
        sample-block indices composing its minibatch (the "block" scheme's
        per-epoch permutation, reshaped)
    granule : the sample-block size; MUST equal the kernel streaming chunk
        (callers use :func:`_pick_chunk`) so DMA blocks and shuffle blocks
        coincide
    data_layout : "sample" — flat env-major ``(S, feat)`` arrays (blocks are
        contiguous sample runs); "featlane" — the collection kernel's native
        ``(T, feat, B)`` trajectory layout (blocks are (timestep, lane-slab)
        tiles of ``granule`` samples; flat block id = t·(B//granule) + slab).
        Identical update math either way — only the DMA decomposition and the
        shuffle partition differ.
    """
    G, K = block_perm.shape
    M = K * granule
    p_leaves = _flatten_actor_critic(params)
    mu_leaves = _flatten_actor_critic(adam_mu)
    nu_leaves = _flatten_actor_critic(adam_nu)
    f32c = lambda x: x.astype(jnp.float32)

    if data_layout == "featlane":
        T_, F, B = obs_flat.shape
        A = act_flat.shape[1]
        if B % granule:
            raise ValueError(
                f"lane count {B} not divisible by slab granule {granule}")
        nslab = B // granule
        n_bl = T_ * nslab
        obs_b = f32c(obs_flat)
        act_b = f32c(act_flat)
        logp_b = f32c(logp_flat).reshape(T_, 1, B)
        adv_b = f32c(adv_flat).reshape(T_, 1, B)
        ret_b = f32c(ret_flat).reshape(T_, 1, B)
        bsum = adv_b.reshape(T_, nslab, granule).sum(axis=2).reshape(-1)
        bsq = (adv_b * adv_b).reshape(T_, nslab, granule).sum(axis=2).reshape(-1)

        def data_spec(blk):
            return pl.BlockSpec(
                blk,
                lambda g, c, b, s: (b[g, c] // nslab, 0, b[g, c] % nslab),
                memory_space=pltpu.VMEM)

        data_specs = [data_spec((1, F, granule)), data_spec((1, A, granule)),
                      data_spec((1, 1, granule)), data_spec((1, 1, granule)),
                      data_spec((1, 1, granule))]
    else:
        S, F = obs_flat.shape
        A = act_flat.shape[1]
        if S % granule:
            raise ValueError(
                f"flat sample count {S} not divisible by granule {granule}")
        n_bl = S // granule
        obs_b = f32c(obs_flat).reshape(n_bl, granule, F)
        act_b = f32c(act_flat).reshape(n_bl, granule, A)
        logp_b = f32c(logp_flat).reshape(n_bl, 1, granule)
        adv_b = f32c(adv_flat).reshape(n_bl, 1, granule)
        ret_b = f32c(ret_flat).reshape(n_bl, 1, granule)
        bsum = adv_b.sum(axis=(1, 2))
        bsq = (adv_b * adv_b).sum(axis=(1, 2))

        def data_spec(blk):
            return pl.BlockSpec(
                blk, lambda g, c, b, s: (b[g, c], 0, 0),
                memory_space=pltpu.VMEM)

        data_specs = [data_spec((1, granule, F)), data_spec((1, granule, A)),
                      data_spec((1, 1, granule)), data_spec((1, 1, granule)),
                      data_spec((1, 1, granule))]

    # per-minibatch advantage stats from per-block sums (gathers n_bl-sized
    # scalar rows — trivial — instead of minibatch tensors)
    msum = bsum[block_perm].sum(axis=1)
    msq = bsq[block_perm].sum(axis=1)
    mean = msum / M
    std = jnp.sqrt(jnp.maximum(msq / M - mean * mean, 0.0))
    stats = jnp.stack([mean, std]).astype(jnp.float32)      # (2, G)
    bidx = block_perm.astype(jnp.int32)                     # (G, K)

    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda g, c, b, s: (0,) * len(shape), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G, K),
        in_specs=(
            data_specs
            + [pl.BlockSpec((1, 1), lambda g, c, b, s: (0, 0),
                            memory_space=pltpu.SMEM)]
            + [const_spec(x.shape) for x in p_leaves]
            + [const_spec(x.shape) for x in mu_leaves]
            + [const_spec(x.shape) for x in nu_leaves]
        ),
        out_specs=(
            [const_spec(x.shape) for x in p_leaves] * 3
            + [pl.BlockSpec((1, 1, 8), lambda g, c, b, s: (g, 0, 0),
                            memory_space=pltpu.VMEM)]
        ),
        scratch_shapes=(
            [pltpu.VMEM(x.shape, jnp.float32) for x in p_leaves]
            + [pltpu.VMEM((1, 8), jnp.float32)]
        ),
    )
    out_shape = (
        [jax.ShapeDtypeStruct(x.shape, jnp.float32) for x in p_leaves] * 3
        + [jax.ShapeDtypeStruct((G, 1, 8), jnp.float32)]
    )

    kernel = functools.partial(_sweep_kernel, hypers, K, M, True,
                               data_layout == "featlane")
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        bidx, stats,
        obs_b, act_b, logp_b, adv_b, ret_b,
        jnp.asarray(adam_count, jnp.int32).reshape(1, 1),
        *[f32c(x) for x in p_leaves],
        *[f32c(x) for x in mu_leaves],
        *[f32c(x) for x in nu_leaves],
    )

    new_p = _unflatten_actor_critic(params, outs[0:13])
    new_mu = _unflatten_actor_critic(adam_mu, outs[13:26])
    new_nu = _unflatten_actor_critic(adam_nu, outs[26:39])
    metrics = outs[39][:, 0, :4]
    new_count = jnp.asarray(adam_count, jnp.int32) + jnp.int32(G)
    return new_p, new_count, new_mu, new_nu, metrics

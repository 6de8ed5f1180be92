"""Whole-sweep DDPG update kernel: all gradient steps of an update in ONE
Pallas launch.

The DDPG twin of ops/pallas_ppo_sweep.py (see its module docstring for the
why): after round 4 the DDPG learner paid XLA's ~100 µs-per-sequential-grad-
step floor across its 24 critic+actor steps (~2.4 ms of a ~4.3 ms update at
4096 envs, docs/PERFORMANCE.md §5).  This kernel keeps BOTH networks, their
target copies, and both Adam states resident in VMEM for the whole sweep and
runs every step — target bootstrap, critic update, actor update through the
fresh critic, polyak averaging — inside one launch.

Layout: **sample-major** ``(B, feat)`` blocks, weights in their native flax
``(in, out)`` orientation.  Unlike the PPO kernel (4096-sample chunks, where
features-in-lanes was forced by VMEM), DDPG's 256-sample minibatches make
(B, feat) tiles cheap — biases stay (1, out) rows that broadcast over the
sample sublanes for free, and no transposes exist anywhere in the kernel.

Replay sampling stays in XLA and is BITWISE the scan path's stream: the
caller pre-draws the 24×(t_idx, b_idx) batches with the same fold/split key
schedule and gathers them into ``(G, B, feat)`` tensors — sampling is
data-only, so the kernel has no data-dependent indexing and no PRNG
(interpret mode covers the full body on CPU).

Exact-parity contract with solvers/ddpg.py::gradient_step:

- target bootstrap ``r + γ(1-d)·Q_target(s', μ_target(s'))`` with the
  tanh-squashed, box-scaled actor (networks.py::DDPGActor);
- critic MSE step, then the actor step through the UPDATED critic (the scan
  path's ordering), each with its own optax Adam state (no grad clip —
  ddpg.py uses bare ``optax.adam``);
- ReLU backward uses jax.nn.relu's exact subgradient (0 at 0);
- polyak target updates ``(1-τ)·t + τ·p`` after both updates.

Pinned by tests/test_ddpg_sweep_kernel.py: interpret-mode param trajectories
vs the XLA scan at rtol ≤1e-5 per step, bit-stable reruns.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class DDPGSweepHypers(NamedTuple):
    """Static hyperparameters baked into the compiled kernel."""

    lr: float
    gamma: float
    tau: float
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    # matmul OPERAND dtype for fwd/bwd (f32 accumulation + f32 master params;
    # see pallas_ppo_sweep.SweepHypers.matmul_dtype).  None = exact f32.
    matmul_dtype: object = None


N_LEAVES = 6  # W1 b1 W2 b2 W3 b3 per network


def _metric_row(vals):
    W = 8
    col = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    row = jnp.zeros((1, W), jnp.float32)
    for i, v in enumerate(vals):
        row = jnp.where(col == i, v.astype(jnp.float32), row)
    return row


def _flatten_mlp(tree, head):
    """{'params': {head: {'Dense_0'..'Dense_2'}}} -> [W1 b1 W2 b2 W3 b3]
    with biases reshaped to (1, out) rows."""
    sub = tree["params"][head]
    expected = {f"Dense_{i}" for i in range(3)}
    if set(sub.keys()) != expected:
        raise ValueError(
            f"DDPG sweep kernel supports exactly 2 hidden layers; {head} has "
            f"{sorted(sub.keys())} — use the XLA sweep (sweep_impl='xla')")
    leaves = []
    for i in range(3):
        d = sub[f"Dense_{i}"]
        leaves.append(d["kernel"])
        leaves.append(d["bias"].reshape(1, -1))
    return leaves


def _unflatten_mlp(template, leaves):
    sem = {}
    for i in range(3):
        sem[(f"Dense_{i}", "kernel")] = leaves[2 * i]
        sem[(f"Dense_{i}", "bias")] = leaves[2 * i + 1]
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, ref in flat:
        keys = tuple(getattr(k, "key", str(k)) for k in path)[-2:]
        new_leaves.append(sem[keys].reshape(ref.shape).astype(ref.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _mlp_fwd(leaves, x, act=jax.nn.relu, mm_cast=lambda x: x):
    """(B, in) -> (B, out) through the 2-hidden-layer MLP; returns saved
    activations for the backward pass."""
    W1, b1, W2, b2, W3, b3 = leaves
    dot = lambda a, b: jnp.dot(mm_cast(a), mm_cast(b),
                               preferred_element_type=jnp.float32)
    y1 = act(dot(x, W1) + b1)
    y2 = act(dot(y1, W2) + b2)
    out = dot(y2, W3) + b3
    return out, (y1, y2)


def _mlp_bwd(leaves, x, y1, y2, g_out, mm_cast=lambda x: x):
    """ReLU-MLP backward: returns ([gW1 gb1 gW2 gb2 gW3 gb3], g_x)."""
    W1, b1, W2, b2, W3, b3 = leaves
    tdot = lambda a, b: jax.lax.dot_general(
        mm_cast(a), mm_cast(b), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    rdot = lambda a, b: jax.lax.dot_general(
        mm_cast(a), mm_cast(b), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    gW3 = tdot(y2, g_out)
    gb3 = jnp.sum(g_out, axis=0, keepdims=True)
    g2 = rdot(g_out, W3) * (y2 > 0).astype(jnp.float32)
    gW2 = tdot(y1, g2)
    gb2 = jnp.sum(g2, axis=0, keepdims=True)
    g1 = rdot(g2, W2) * (y1 > 0).astype(jnp.float32)
    gW1 = tdot(x, g1)
    gb1 = jnp.sum(g1, axis=0, keepdims=True)
    g_x = rdot(g1, W1)
    return [gW1, gb1, gW2, gb2, gW3, gb3], g_x


def _sweep_kernel(hp: DDPGSweepHypers, batch: int, obs_dim: int,
                  obs_ref, act_ref, rew_ref, next_ref, done_ref,
                  acount_ref, ccount_ref, low_ref, high_ref, *refs):
    a_in, c_in, ta_in, tc_in = (refs[0:6], refs[6:12], refs[12:18], refs[18:24])
    amu_in, anu_in, cmu_in, cnu_in = (refs[24:30], refs[30:36],
                                      refs[36:42], refs[42:48])
    a_out, c_out, ta_out, tc_out = (refs[48:54], refs[54:60],
                                    refs[60:66], refs[66:72])
    amu_out, anu_out, cmu_out, cnu_out = (refs[72:78], refs[78:84],
                                          refs[84:90], refs[90:96])
    metrics_ref = refs[96]

    g = pl.program_id(0)
    f32 = jnp.float32
    inv_b = f32(1.0 / batch)
    mm_cast = (lambda x: x) if hp.matmul_dtype is None else (
        lambda x: x.astype(hp.matmul_dtype))

    @pl.when(g == 0)
    def _load_state():
        for src, dst in ((a_in, a_out), (c_in, c_out), (ta_in, ta_out),
                         (tc_in, tc_out), (amu_in, amu_out), (anu_in, anu_out),
                         (cmu_in, cmu_out), (cnu_in, cnu_out)):
            for i in range(N_LEAVES):
                dst[i][...] = src[i][...]

    obs = obs_ref[0]           # (B, F)
    act = act_ref[0]           # (B, A)
    rew = rew_ref[0]           # (B, 1)
    nxt = next_ref[0]          # (B, F)
    done = done_ref[0]         # (B, 1)
    low = low_ref[...]         # (1, A)
    high = high_ref[...]       # (1, A)
    half_span = 0.5 * (high - low)

    def squash(u):
        return low + (jnp.tanh(u) + 1.0) * half_span

    def read(slots):
        return [s[...] for s in slots]

    def adam_update(p_slots, mu_slots, nu_slots, grads, count0):
        t = (count0 + g + 1).astype(f32)
        bc1 = 1.0 - jnp.exp(t * f32(jnp.log(hp.adam_b1)))
        bc2 = 1.0 - jnp.exp(t * f32(jnp.log(hp.adam_b2)))
        for i in range(N_LEAVES):
            gi = grads[i]
            m = hp.adam_b1 * mu_slots[i][...] + (1.0 - hp.adam_b1) * gi
            v = hp.adam_b2 * nu_slots[i][...] + (1.0 - hp.adam_b2) * gi * gi
            mu_slots[i][...] = m
            nu_slots[i][...] = v
            upd = (m / bc1) / (jnp.sqrt(v / bc2) + f32(hp.adam_eps))
            p_slots[i][...] = p_slots[i][...] - f32(hp.lr) * upd

    # ------------------------------------------------- target bootstrap --
    na_raw, _ = _mlp_fwd(read(ta_out), nxt, mm_cast=mm_cast)
    next_action = squash(na_raw)
    nxa = jnp.concatenate([nxt, next_action], axis=1)
    tq_raw, _ = _mlp_fwd(read(tc_out), nxa, mm_cast=mm_cast)
    target_q = rew + f32(hp.gamma) * (1.0 - done) * tq_raw   # (B, 1)

    # ------------------------------------------------------ critic step --
    c_leaves = read(c_out)
    xa = jnp.concatenate([obs, act], axis=1)
    q, (cy1, cy2) = _mlp_fwd(c_leaves, xa, mm_cast=mm_cast)
    cerr = q - target_q
    c_loss = jnp.sum(cerr * cerr) * inv_b
    g_q = (2.0 * inv_b) * cerr
    c_grads, _ = _mlp_bwd(c_leaves, xa, cy1, cy2, g_q, mm_cast=mm_cast)
    adam_update(c_out, cmu_out, cnu_out, c_grads, ccount_ref[0, 0])

    # ------------------------------------------------------- actor step --
    # through the UPDATED critic, exactly like the XLA scan's ordering
    a_leaves = read(a_out)
    u_raw, (ay1, ay2) = _mlp_fwd(a_leaves, obs, mm_cast=mm_cast)
    tanh_u = jnp.tanh(u_raw)
    a_pi = low + (tanh_u + 1.0) * half_span
    c_new = read(c_out)
    xa2 = jnp.concatenate([obs, a_pi], axis=1)
    q2, (qy1, qy2) = _mlp_fwd(c_new, xa2, mm_cast=mm_cast)
    a_loss = -jnp.sum(q2) * inv_b
    g_q2 = jnp.full_like(q2, -inv_b)
    _, g_xa = _mlp_bwd(c_new, xa2, qy1, qy2, g_q2, mm_cast=mm_cast)
    g_a = g_xa[:, obs_dim:]                     # (B, A) — action columns
    g_u = g_a * half_span * (1.0 - tanh_u * tanh_u)
    a_grads, _ = _mlp_bwd(a_leaves, obs, ay1, ay2, g_u, mm_cast=mm_cast)
    adam_update(a_out, amu_out, anu_out, a_grads, acount_ref[0, 0])

    # ---------------------------------------------------------- polyak --
    tau = f32(hp.tau)
    for t_slots, p_slots in ((ta_out, a_out), (tc_out, c_out)):
        for i in range(N_LEAVES):
            t_slots[i][...] = (1.0 - tau) * t_slots[i][...] + tau * p_slots[i][...]

    metrics_ref[0] = _metric_row([c_loss, a_loss])


def ddpg_sweep_pallas(
    actor_params, critic_params, target_actor, target_critic,
    actor_count, actor_mu, actor_nu,
    critic_count, critic_mu, critic_nu,
    b_obs, b_act, b_rew, b_next, b_done,
    action_low, action_high,
    hypers: DDPGSweepHypers,
    interpret: bool = False,
):
    """Run the whole DDPG gradient sweep (G steps) in one Pallas launch.

    ``b_obs .. b_done`` are the pre-sampled replay minibatches with leading
    axes ``(G, B[, feat])`` (b_rew/b_done as (G, B)); sampling must use the
    XLA scan's key schedule for bitwise-equal batches.  Returns
    ``(actor, critic, t_actor, t_critic, (a_count, a_mu, a_nu),
    (c_count, c_mu, c_nu), metrics)`` with metrics (G, 2): critic/actor loss
    per step.
    """
    G, B = b_rew.shape[0], b_rew.shape[1]
    F, A = b_obs.shape[2], b_act.shape[2]
    a_leaves = _flatten_mlp(actor_params, "mu")
    c_leaves = _flatten_mlp(critic_params, "q")
    ta_leaves = _flatten_mlp(target_actor, "mu")
    tc_leaves = _flatten_mlp(target_critic, "q")
    amu_l = _flatten_mlp(actor_mu, "mu")
    anu_l = _flatten_mlp(actor_nu, "mu")
    cmu_l = _flatten_mlp(critic_mu, "q")
    cnu_l = _flatten_mlp(critic_nu, "q")

    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda g: (0,) * len(shape), memory_space=pltpu.VMEM)
    step_spec = lambda feat: pl.BlockSpec(
        (1, B, feat), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM)

    state_leaves = (a_leaves + c_leaves + ta_leaves + tc_leaves
                    + amu_l + anu_l + cmu_l + cnu_l)
    in_specs = (
        [step_spec(F), step_spec(A), step_spec(1), step_spec(F), step_spec(1),
         smem_spec, smem_spec, const_spec((1, A)), const_spec((1, A))]
        + [const_spec(x.shape) for x in state_leaves]
    )
    out_specs = (
        [const_spec(x.shape) for x in state_leaves]
        + [pl.BlockSpec((1, 1, 8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)]
    )
    out_shape = (
        [jax.ShapeDtypeStruct(x.shape, jnp.float32) for x in state_leaves]
        + [jax.ShapeDtypeStruct((G, 1, 8), jnp.float32)]
    )

    kernel = functools.partial(_sweep_kernel, hypers, B, F)
    f32 = lambda x: x.astype(jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(
        f32(b_obs), f32(b_act), f32(b_rew).reshape(G, B, 1),
        f32(b_next), f32(b_done).reshape(G, B, 1),
        jnp.asarray(actor_count, jnp.int32).reshape(1, 1),
        jnp.asarray(critic_count, jnp.int32).reshape(1, 1),
        jnp.asarray(action_low, jnp.float32).reshape(1, A),
        jnp.asarray(action_high, jnp.float32).reshape(1, A),
        *[f32(x) for x in state_leaves],
    )

    n = N_LEAVES
    new_actor = _unflatten_mlp(actor_params, outs[0:n])
    new_critic = _unflatten_mlp(critic_params, outs[n:2 * n])
    new_ta = _unflatten_mlp(target_actor, outs[2 * n:3 * n])
    new_tc = _unflatten_mlp(target_critic, outs[3 * n:4 * n])
    new_amu = _unflatten_mlp(actor_mu, outs[4 * n:5 * n])
    new_anu = _unflatten_mlp(actor_nu, outs[5 * n:6 * n])
    new_cmu = _unflatten_mlp(critic_mu, outs[6 * n:7 * n])
    new_cnu = _unflatten_mlp(critic_nu, outs[7 * n:8 * n])
    metrics = outs[8 * n][:, 0, :2]
    inc = jnp.int32(G)
    return (new_actor, new_critic, new_ta, new_tc,
            (jnp.asarray(actor_count, jnp.int32) + inc, new_amu, new_anu),
            (jnp.asarray(critic_count, jnp.int32) + inc, new_cmu, new_cnu),
            metrics)

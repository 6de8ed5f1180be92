"""Parity tests for the whole-sweep PPO update kernel (ops/pallas_ppo_sweep).

The kernel hand-writes the actor-critic backward pass and the optax
clip+Adam math; these tests pin it against the ground truth — jax.grad +
optax inside the XLA sweep (solvers/ppo.py) — in Pallas interpret mode on
CPU (the kernel uses no hardware PRNG, so interpret mode covers the full
body; the real-TPU launch runs the identical trace through Mosaic).

Tolerances: the kernel accumulates gradients feature-major with lane
reductions while XLA reduces sample-major, so gradients agree to f32
reduction-order rounding.  A single optimizer step (G=1) is compared at
rtol 1e-5 (VERDICT r4 item 1's bar); a full 2-epoch sweep compounds ~4
steps of that rounding through Adam and is compared at 1e-4.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_nanogrid_gym_tpu.core import NanogridConfig, make_params
from smart_nanogrid_gym_tpu.solvers.ppo import PPOConfig, PPOLearner

CFG = NanogridConfig(num_chargers=4, pv_system=True, battery_system=True)


def _learner_pair(**ppo_kwargs):
    # both learners pinned to the "block" minibatch scheme so compositions
    # match exactly (sweep_impl="pallas" defaults to block, xla to env)
    ppo_kwargs.setdefault("minibatch_scheme", "block")
    xla = PPOLearner(CFG, PPOConfig(sweep_impl="xla", **ppo_kwargs))
    pal = PPOLearner(
        CFG, PPOConfig(sweep_impl="pallas", sweep_interpret=True, **ppo_kwargs))
    params = make_params(CFG, dtype=jnp.float32)
    state = xla.init(jax.random.PRNGKey(0), params, batch_size=16)
    # the pallas learner shares the identical initial state (same seed path)
    state_p = pal.init(jax.random.PRNGKey(0), params, batch_size=16)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.params, state_p.params)
    return xla, pal, state


def _tree_allclose(a, b, rtol, atol=1e-7, msg=""):
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x, np.float64), np.asarray(y, np.float64),
            rtol=rtol, atol=atol, err_msg=msg),
        a, b)


def test_single_grad_step_matches_optax_at_1e5():
    """G=1 (one epoch, one minibatch): the kernel's hand-written backward +
    clip_by_global_norm + Adam must reproduce jax.grad + optax through one
    full optimizer step at rtol 1e-5 — gradient-level parity measured through
    the optimizer (the kernel does not expose raw gradients)."""
    xla, pal, state = _learner_pair(num_epochs=1, num_minibatches=1)
    sx, mx = xla.build_train_step()(state, xla.nanogrid_params_batched)
    sp, mp = pal.build_train_step()(state, pal.nanogrid_params_batched)
    _tree_allclose(sx.params, sp.params, rtol=1e-5, msg="params after 1 step")
    _tree_allclose(sx.opt_state, sp.opt_state, rtol=1e-5, atol=1e-9,
                   msg="adam state after 1 step")
    for name in ("policy_loss", "value_loss", "entropy", "approx_kl"):
        np.testing.assert_allclose(
            float(getattr(mx, name)), float(getattr(mp, name)),
            rtol=1e-5, atol=1e-6, err_msg=name)


def test_full_sweep_matches_xla_path():
    """A 2-epoch × 2-minibatch sweep (G=4 sequential grad steps, identical
    permutation stream) matches the XLA scan end-to-end."""
    xla, pal, state = _learner_pair(num_epochs=2, num_minibatches=2)
    sx, mx = xla.build_train_step()(state, xla.nanogrid_params_batched)
    sp, mp = pal.build_train_step()(state, pal.nanogrid_params_batched)
    _tree_allclose(sx.params, sp.params, rtol=1e-4, atol=1e-6,
                   msg="params after sweep")
    np.testing.assert_allclose(float(mx.mean_return), float(mp.mean_return),
                               rtol=1e-6)
    np.testing.assert_allclose(float(mx.approx_kl), float(mp.approx_kl),
                               rtol=1e-3, atol=1e-6)


def test_sweep_kernel_bit_stable():
    """Two identical invocations produce bitwise-identical params and metrics
    (deterministic kernel: no PRNG, fixed reduction order)."""
    _, pal, state = _learner_pair(num_epochs=2, num_minibatches=2)
    step = pal.build_train_step()
    s1, m1 = step(state, pal.nanogrid_params_batched)
    s2, m2 = step(state, pal.nanogrid_params_batched)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        (s1.params, s1.opt_state, m1), (s2.params, s2.opt_state, m2))


def test_chunked_streaming_matches_single_chunk():
    """Forcing multiple row chunks (gradient accumulation across streamed
    chunks) agrees with the single-chunk launch to f32 accumulation order."""
    from smart_nanogrid_gym_tpu.ops.pallas_ppo_sweep import (
        SweepHypers, _pick_chunk, ppo_sweep_pallas)

    key = jax.random.PRNGKey(3)
    F, A, M, G = 25, 9, 96, 3
    from smart_nanogrid_gym_tpu.solvers.networks import ActorCritic
    net = ActorCritic(action_dim=A)
    params = net.init(key, jnp.zeros((1, F), jnp.float32))
    zeros = jax.tree.map(jnp.zeros_like, params)
    ks = jax.random.split(key, 5)
    obs_g = jax.random.normal(ks[0], (G, M, F), jnp.float32)
    act_g = jax.random.normal(ks[1], (G, M, A), jnp.float32)
    logp_g = jax.random.normal(ks[2], (G, M), jnp.float32)
    adv_g = jax.random.normal(ks[3], (G, M), jnp.float32)
    ret_g = jax.random.normal(ks[4], (G, M), jnp.float32)
    nadv_g = (adv_g - adv_g.mean(axis=1, keepdims=True)) / (
        adv_g.std(axis=1, keepdims=True) + 1e-8)
    hp = SweepHypers(lr=3e-4, clip_eps=0.2, vf_coef=0.5, ent_coef=0.0,
                     max_grad_norm=0.5)

    run = functools.partial(
        ppo_sweep_pallas, params, jnp.int32(0), zeros, zeros,
        obs_g, act_g, logp_g, nadv_g, ret_g, hp, interpret=True)
    p1, c1, mu1, nu1, met1 = run()
    p2, c2, mu2, nu2, met2 = run(chunk_override=M // 4)
    assert int(c1) == int(c2) == G
    _tree_allclose(p1, p2, rtol=1e-5, atol=1e-7, msg="chunked params")
    _tree_allclose(met1, met2, rtol=1e-4, atol=1e-6, msg="chunked metrics")


def test_sweep_kernel_rejects_unsupported_shapes():
    """Nets that aren't 2-hidden-layer MLPs and multi-device meshes fall back
    loudly (trace-time ValueError) rather than computing the wrong thing."""
    from smart_nanogrid_gym_tpu.ops.pallas_ppo_sweep import _flatten_actor_critic

    bad = {"params": {
        "log_std": jnp.zeros((9,)),
        "pi": {f"Dense_{i}": {"kernel": jnp.zeros((4, 4)),
                              "bias": jnp.zeros((4,))} for i in range(4)},
        "vf": {f"Dense_{i}": {"kernel": jnp.zeros((4, 4)),
                              "bias": jnp.zeros((4,))} for i in range(3)},
    }}
    with pytest.raises(ValueError, match="2 hidden layers"):
        _flatten_actor_critic(bad)

    import numpy as _np
    from jax.sharding import Mesh
    cpus = jax.devices("cpu")
    if len(cpus) >= 2:
        mesh = Mesh(_np.asarray(cpus[:2]), ("envs",))
        learner = PPOLearner(
            CFG, PPOConfig(sweep_impl="pallas", sweep_interpret=True,
                           num_epochs=1, num_minibatches=1), mesh=mesh)
        params = make_params(CFG, dtype=jnp.float32)
        state = learner.init(jax.random.PRNGKey(0), params, batch_size=8)
        with pytest.raises(ValueError, match="single-device"):
            learner.build_train_step()(state, learner.nanogrid_params_batched)


def test_block_scheme_learns_like_env_scheme():
    """The "block" minibatch scheme (contiguous sample blocks — the kernel
    path's default, chosen for TPU row-gather economics) is an equally
    unbiased partition of i.i.d. envs: training with it reaches comparable
    returns to the round-4 env-wise scheme on the same seeds."""
    params = make_params(CFG, dtype=jnp.float32)
    outs = {}
    for scheme in ("env", "block"):
        learner = PPOLearner(CFG, PPOConfig(num_epochs=4, num_minibatches=2,
                                            minibatch_scheme=scheme))
        state = learner.init(jax.random.PRNGKey(0), params, batch_size=32)
        state, hist = learner.train(state, 15, log_every=14)
        outs[scheme] = hist[-1].mean_return
    assert np.isfinite(outs["env"]) and np.isfinite(outs["block"])
    # both improved from the ~-320 init to the same neighbourhood
    assert outs["block"] > -280.0, outs
    assert abs(outs["block"] - outs["env"]) < 60.0, outs


def test_streamed_matches_materialized_kernel():
    """ppo_sweep_pallas_streamed (scalar-prefetch block index maps + in-kernel
    advantage normalization) equals the materialized-kernel launch on the same
    block permutation — the normalization stats differ only in f32 reduction
    order (block sums vs row reduction)."""
    from smart_nanogrid_gym_tpu.ops.pallas_ppo_sweep import (
        SweepHypers, ppo_sweep_pallas, ppo_sweep_pallas_streamed)
    from smart_nanogrid_gym_tpu.solvers.networks import ActorCritic

    key = jax.random.PRNGKey(9)
    F, A = 25, 9
    granule, K, G = 32, 3, 4          # M = 96 samples per minibatch
    n_bl = 12
    S = n_bl * granule
    net = ActorCritic(action_dim=A)
    params = net.init(key, jnp.zeros((1, F), jnp.float32))
    zeros = jax.tree.map(jnp.zeros_like, params)
    ks = jax.random.split(key, 6)
    obs_f = jax.random.normal(ks[0], (S, F), jnp.float32)
    act_f = jax.random.normal(ks[1], (S, A), jnp.float32)
    logp_f = jax.random.normal(ks[2], (S,), jnp.float32)
    adv_f = jax.random.normal(ks[3], (S,), jnp.float32)
    ret_f = jax.random.normal(ks[4], (S,), jnp.float32)
    block_perm = jax.vmap(
        lambda k: jax.random.permutation(k, n_bl)
    )(jax.random.split(ks[5], G))[:, :K].astype(jnp.int32)  # (G, K)

    hp = SweepHypers(lr=3e-4, clip_eps=0.2, vf_coef=0.5, ent_coef=0.0,
                     max_grad_norm=0.5)
    p_s, c_s, mu_s, nu_s, met_s = ppo_sweep_pallas_streamed(
        params, jnp.int32(0), zeros, zeros,
        obs_f, act_f, logp_f, adv_f, ret_f, block_perm, granule, hp,
        interpret=True)

    # materialize the identical minibatches by hand
    M = K * granule
    take = lambda x: x.reshape((n_bl, granule) + x.shape[1:])[block_perm]\
        .reshape((G, M) + x.shape[1:])
    adv_g = take(adv_f)
    nadv_g = (adv_g - adv_g.mean(axis=1, keepdims=True)) / (
        adv_g.std(axis=1, keepdims=True) + 1e-8)
    p_m, c_m, mu_m, nu_m, met_m = ppo_sweep_pallas(
        params, jnp.int32(0), zeros, zeros,
        take(obs_f), take(act_f), take(logp_f), nadv_g, take(ret_f), hp,
        interpret=True, chunk_override=granule)

    assert int(c_s) == int(c_m) == G
    _tree_allclose(p_s, p_m, rtol=1e-5, atol=1e-6, msg="streamed params")
    _tree_allclose(met_s, met_m, rtol=1e-4, atol=1e-5, msg="streamed metrics")


def test_featlane_streamed_matches_materialized_kernel():
    """data_layout="featlane" (the collection kernel's (T, F, B) trajectory
    layout, blocks = (timestep, lane-slab) tiles) produces the same update as
    hand-materializing those exact minibatches for the sample-major kernel."""
    from smart_nanogrid_gym_tpu.ops.pallas_ppo_sweep import (
        SweepHypers, ppo_sweep_pallas, ppo_sweep_pallas_streamed)
    from smart_nanogrid_gym_tpu.solvers.networks import ActorCritic

    key = jax.random.PRNGKey(17)
    F, A, T, B = 25, 9, 6, 64
    slab, G = 32, 4
    nslab = B // slab
    n_bl = T * nslab                      # 12 blocks
    K = 3
    M = K * slab
    net = ActorCritic(action_dim=A)
    params = net.init(key, jnp.zeros((1, F), jnp.float32))
    zeros = jax.tree.map(jnp.zeros_like, params)
    ks = jax.random.split(key, 6)
    obs_tfb = jax.random.normal(ks[0], (T, F, B), jnp.float32)
    act_tab = jax.random.normal(ks[1], (T, A, B), jnp.float32)
    logp_tb = jax.random.normal(ks[2], (T, B), jnp.float32)
    adv_tb = jax.random.normal(ks[3], (T, B), jnp.float32)
    ret_tb = jax.random.normal(ks[4], (T, B), jnp.float32)
    block_perm = jax.vmap(lambda k: jax.random.permutation(k, n_bl))(
        jax.random.split(ks[5], G))[:, :K].astype(jnp.int32)

    hp = SweepHypers(lr=3e-4, clip_eps=0.2, vf_coef=0.5, ent_coef=0.0,
                     max_grad_norm=0.5)
    p_s, c_s, *_, met_s = ppo_sweep_pallas_streamed(
        params, jnp.int32(0), zeros, zeros,
        obs_tfb, act_tab, logp_tb, adv_tb, ret_tb, block_perm, slab, hp,
        interpret=True, data_layout="featlane")

    # materialize the identical (t, slab) minibatch composition by hand:
    # block b = (t = b // nslab, s = b % nslab), samples sample-major
    def take(x_tb):                     # (T, feat, B) -> (G, M, feat)
        feat = x_tb.shape[1]
        tiles = x_tb.reshape(T, feat, nslab, slab).transpose(0, 2, 3, 1)
        flat = tiles.reshape(n_bl, slab, feat)
        return flat[block_perm].reshape(G, M, feat)

    def take_row(x_tb):                 # (T, B) -> (G, M)
        tiles = x_tb.reshape(T, nslab, slab)
        return tiles.reshape(n_bl, slab)[block_perm].reshape(G, M)

    adv_g = take_row(adv_tb)
    nadv_g = (adv_g - adv_g.mean(axis=1, keepdims=True)) / (
        adv_g.std(axis=1, keepdims=True) + 1e-8)
    p_m, c_m, *_, met_m = ppo_sweep_pallas(
        params, jnp.int32(0), zeros, zeros,
        take(obs_tfb), take(act_tab), take_row(logp_tb), nadv_g,
        take_row(ret_tb), hp, interpret=True, chunk_override=slab)

    assert int(c_s) == int(c_m) == G
    _tree_allclose(p_s, p_m, rtol=1e-5, atol=1e-6, msg="featlane params")
    _tree_allclose(met_s, met_m, rtol=1e-4, atol=1e-5, msg="featlane metrics")


def test_env_scheme_pallas_sweep_matches_xla():
    """The materialized (env-scheme) kernel path — supported when a user pins
    minibatch_scheme='env' with sweep_impl='pallas' — matches the XLA sweep
    on the identical env permutation stream."""
    xla, pal, state = _learner_pair(num_epochs=2, num_minibatches=2,
                                    minibatch_scheme="env")
    sx, _ = xla.build_train_step()(state, xla.nanogrid_params_batched)
    sp, _ = pal.build_train_step()(state, pal.nanogrid_params_batched)
    _tree_allclose(sx.params, sp.params, rtol=1e-4, atol=1e-6,
                   msg="env-scheme params after sweep")

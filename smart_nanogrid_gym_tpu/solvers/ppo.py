"""Sharded on-device PPO (the BASELINE config-5 north-star learner).

The reference trains SB3 PPO against a single Python env — 1.02M sequential
``env.step`` calls per script run (solvers/RL/ppo_train.py:94-102).  Here the
whole actor-learner loop is one jitted, shard_map-ped device program
("Anakin"-style):

- every device rolls out its shard of the env batch for one day (24 steps)
  with the current policy (replicated params),
- GAE and the clipped PPO loss are computed on device,
- gradients are ``psum``-ed over the ``envs`` mesh axis — the only collective
  in the whole framework — and applied with optax.Adam,
- the outer Python loop only orchestrates update counts and metrics fetches.

Hyperparameters default to SB3's PPO defaults (lr 3e-4, γ 0.99, λ 0.95,
clip 0.2, 10 epochs, entropy 0.0, vf 0.5) for comparability with the
reference's training setup.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import NanogridConfig
from ..core.params import NanogridParams
from ..core.rollout import fused_day_rollout
from ..core.transition import reset as core_reset
from ..parallel.mesh import ENV_AXIS
from .networks import ActorCritic


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    learning_rate: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    entropy_coef: float = 0.0
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    num_epochs: int = 10
    num_minibatches: int = 4
    rollout_days: int = 1  # days of rollout per update (T = 24·days steps)
    # Matmul operand dtype for the update sweep's fwd/bwd passes (mixed
    # precision: master params, optimizer state, and all loss/advantage math
    # stay f32; only the network apply inside the loss casts params+inputs).
    # None/f32 = full precision.  Measured on v5e at the SB3-default 64x64
    # torso, bf16 LOSES (6.18 vs 5.87 ms/update at 4096 envs) — the same
    # not-MXU-bound result as the rollout kernel's mlp_dtype option
    # (docs/PERFORMANCE.md §4): casts cost more than the one-pass matmul
    # saves.  The option exists for large custom torsos, where the §4
    # crossover measurement shows bf16 winning.
    update_matmul_dtype: object | None = None
    # The epoch×minibatch gradient sweep implementation:
    #   "xla"    — the lax.scan sweep (jax.grad + optax per minibatch); the
    #              default, required for multi-device meshes (per-step grad
    #              pmean) and for torsos the kernel doesn't support;
    #   "pallas" — ops/pallas_ppo_sweep.py: ALL grad steps in one kernel
    #              launch, params+Adam resident in VMEM, hand-written
    #              backward.  Removes XLA's ~100 µs-per-grad-step floor
    #              (docs/PERFORMANCE.md §5).  Same minibatch composition
    #              (identical permutation stream) and optimizer math; param
    #              trajectories match the XLA sweep to f32 reduction-order
    #              rounding (tests/test_ppo_sweep_kernel.py).
    sweep_impl: str = "xla"
    # run the sweep kernel in Pallas interpret mode (CPU tests only)
    sweep_interpret: bool = False
    # Minibatch composition scheme:
    #   "env"   — per-epoch permutation of ENVS (SB3-RecurrentPPO sequence
    #             minibatches; round-4 scheme).  Costs one (E·B)-row TPU
    #             gather per update: ~4 ms at 4096 envs × 10 epochs — fine
    #             for the XLA sweep (XLA fuses the gather into consumers),
    #             ruinous for the kernel path (materialized);
    #   "block" — per-epoch permutation of contiguous SAMPLE BLOCKS (granule
    #             = the sweep kernel's streaming chunk, ~85 envs at SB3
    #             defaults).  Envs are i.i.d. by construction (independent
    #             PRNG streams), so any exchangeable partition is an equally
    #             unbiased minibatch scheme; the coarse granule turns the
    #             TPU gather into ~48 bandwidth-speed 200 KB rows per epoch
    #             (row-gather cost is per-ROW on TPU — same economics that
    #             motivated env-wise over sample-wise shuffling in round 4);
    #   "auto"  — "block" for sweep_impl="pallas", "env" otherwise.
    minibatch_scheme: str = "auto"
    # Rollout/collection implementation:
    #   "xla"    — fused_day_rollout (reset + policy + physics as XLA ops);
    #   "pallas" — ops/pallas_collect.py: the whole reset+rollout (day
    #              generation, stochastic actor, log-probs, value head,
    #              physics, trajectory writes) in ONE kernel launch with
    #              in-kernel PRNG.  TPU-only (no CPU lowering for the
    #              hardware PRNG); requires sweep_impl="pallas" (the
    #              trajectories stream to the sweep kernel in its featlane
    #              layout, zero transposes/gathers end to end) and
    #              rollout_days=1.  Noise/generation streams differ from the
    #              XLA path (statistically pinned, not bitwise — the
    #              explicit-noise twin is bit-pinned on CPU by
    #              tests/test_collect_kernel.py).
    collect_impl: str = "xla"


class PPOTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    env_states: object       # batched EnvState (sharded)
    last_obs: jnp.ndarray    # (B, obs_dim) (sharded)
    key: jnp.ndarray
    update_step: jnp.ndarray


class PPOMetrics(NamedTuple):
    policy_loss: jnp.ndarray
    value_loss: jnp.ndarray
    entropy: jnp.ndarray
    approx_kl: jnp.ndarray
    mean_return: jnp.ndarray  # mean per-day return across the rollout batch


def _gaussian_logp(mean, log_std, action):
    var = jnp.exp(2 * log_std)
    return jnp.sum(
        -0.5 * ((action - mean) ** 2 / var + 2 * log_std + jnp.log(2 * np.pi)), axis=-1
    )


def _find_adam_state(state):
    """Locate the ScaleByAdamState inside an optax chain state.

    Returns ``(adam_state, rebuild)`` where ``rebuild(new_adam_state)``
    reconstructs the full opt-state tree with the leaf replaced, or ``None``
    if no Adam state exists (the sweep kernel owns the optimizer math, so it
    must read/write optax's own count/mu/nu rather than shadow state)."""
    if isinstance(state, optax.ScaleByAdamState):
        return state, lambda new: new
    if isinstance(state, (tuple, list)) and not hasattr(state, "shape"):
        for i, sub in enumerate(state):
            found = _find_adam_state(sub)
            if found is not None:
                inner, rebuild = found

                def rb(new, i=i, state=state, rebuild=rebuild):
                    items = list(state)
                    items[i] = rebuild(new)
                    if hasattr(state, "_fields"):
                        return type(state)(*items)
                    return type(state)(items)

                return inner, rb
    return None


class PPOLearner:
    """Builds the jitted sharded train step for a given env config + mesh."""

    def __init__(
        self,
        env_config: NanogridConfig,
        ppo_config: PPOConfig | None = None,
        mesh: Mesh | None = None,
        dtype=jnp.float32,
    ):
        self.env_config = env_config
        self.ppo = ppo_config or PPOConfig()
        self.mesh = mesh
        self.dtype = dtype
        self.network = ActorCritic(action_dim=env_config.num_actions)
        low, high = env_config.action_bounds()
        self._action_low = jnp.asarray(low, dtype)
        self._action_high = jnp.asarray(high, dtype)
        self._train_step = None

    # ------------------------------------------------------------------ init --

    def init(self, key, nanogrid_params: NanogridParams, batch_size: int) -> PPOTrainState:
        """Initialise network, optimiser, and the sharded env batch."""
        k_net, k_env, k_loop = jax.random.split(key, 3)
        obs_dim = self.env_config.obs_dim
        params = self.network.init(k_net, jnp.zeros((1, obs_dim), self.dtype))
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.ppo.max_grad_norm),
            optax.adam(self.ppo.learning_rate),
        )
        opt_state = self.tx.init(params)

        env_keys = jax.random.split(k_env, batch_size)
        bparams = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch_size,) + x.shape), nanogrid_params
        )
        reset_fn = jax.jit(jax.vmap(functools.partial(core_reset, self.env_config)))
        env_states, obs = reset_fn(bparams, env_keys, None, None)
        self.nanogrid_params_batched = bparams

        if self.mesh is not None:
            shard = NamedSharding(self.mesh, P(ENV_AXIS))
            repl = NamedSharding(self.mesh, P())
            self.nanogrid_params_batched = jax.device_put(bparams, shard)
            env_states = jax.device_put(env_states, shard)
            obs = jax.device_put(obs, shard)
            params = jax.device_put(params, repl)
            opt_state = jax.device_put(opt_state, repl)

        return PPOTrainState(
            params=params,
            opt_state=opt_state,
            env_states=env_states,
            last_obs=obs.astype(self.dtype),
            key=k_loop,
            update_step=jnp.zeros((), jnp.int32),
        )

    def init_distributed(self, key, nanogrid_params: NanogridParams,
                         global_batch: int, seed: int = 0) -> PPOTrainState:
        """Multi-host init: host-local env-shard construction over a mesh that
        may span non-addressable devices (parallel/distributed.py).

        Each process generates only its own shard of the global env batch
        (schedules keyed by *global* env index, so they are process-count-
        invariant); learner params/optimizer are replicated from the shared
        ``key``.  Single-process this is equivalent to :meth:`init` modulo env
        key derivation."""
        if self.mesh is None:
            raise ValueError("init_distributed requires a mesh")
        from ..parallel.distributed import distributed_reset, replicate_global

        k_net, k_loop = jax.random.split(key)
        params = self.network.init(k_net, jnp.zeros((1, self.env_config.obs_dim), self.dtype))
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.ppo.max_grad_norm),
            optax.adam(self.ppo.learning_rate),
        )
        opt_state = self.tx.init(params)

        bparams, env_states, obs = distributed_reset(
            self.env_config, nanogrid_params, self.mesh, global_batch, seed=seed
        )
        self.nanogrid_params_batched = bparams
        params = replicate_global(params, self.mesh)
        opt_state = replicate_global(opt_state, self.mesh)
        return PPOTrainState(
            params=params,
            opt_state=opt_state,
            env_states=env_states,
            last_obs=obs.astype(self.dtype),
            key=k_loop,
            update_step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------- train step --

    def _rollout(self, params, env_params, env_states, obs, key):
        """On-device rollout of ``rollout_days`` full days via the fused day
        kernel (no per-step gathers; see core/rollout.py).

        Every day starts with a *freshly generated* schedule — the reference
        training loop resets at each episode end, which regenerates the day
        (SURVEY.md Q8/§3.4) — while the BESS state of charge carries across
        resets like the reference's persistent battery object."""
        reset_fn = jax.vmap(functools.partial(core_reset, self.env_config))
        batch = obs.shape[0]

        def policy_step(ob, key_t):
            mean, log_std, value = self.network.apply(params, ob)
            noise = jax.random.normal(key_t, mean.shape, self.dtype)
            action = mean + jnp.exp(log_std) * noise
            logp = _gaussian_logp(mean, log_std, action)
            clipped = jnp.clip(action, self._action_low, self._action_high)
            return clipped, (ob, action, logp, value)

        pieces = []
        for d in range(self.ppo.rollout_days):
            key, k_day, k_steps = jax.random.split(key, 3)
            if self.mesh is not None:
                # decorrelate both day generation and action-sampling noise
                # across shards; state.key itself stays replicated
                shard = jax.lax.axis_index(ENV_AXIS)
                k_day = jax.random.fold_in(k_day, shard)
                k_steps = jax.random.fold_in(k_steps, shard)
            env_keys = jax.random.split(k_day, batch)
            env_states, obs = reset_fn(env_params, env_keys, env_states.batt_soc, None)
            env_states, (obs_traj, rewards, dones, aux) = fused_day_rollout(
                self.env_config, env_params, env_states, policy_step, k_steps, policy_aux=True
            )
            ob_t, act_t, logp_t, val_t = aux
            obs = obs_traj[-1].astype(self.dtype)
            pieces.append((ob_t, act_t, logp_t, val_t, rewards.astype(self.dtype), dones))

        traj = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *pieces)
        return env_states, obs, traj

    def _gae(self, rewards, values, dones, last_value):
        """Generalised advantage estimation over the (T, B) rollout."""
        gamma, lam = self.ppo.gamma, self.ppo.gae_lambda

        def body(carry, xs):
            gae, next_value = carry
            reward, value, done = xs
            nonterminal = 1.0 - done.astype(self.dtype)
            delta = reward + gamma * next_value * nonterminal - value
            gae = delta + gamma * lam * nonterminal * gae
            return (gae, value), gae

        (_, _), advantages = jax.lax.scan(
            body,
            (jnp.zeros_like(last_value), last_value),
            (rewards, values, dones),
            reverse=True,
        )
        return advantages, advantages + values

    def _loss(self, params, obs, actions, old_logp, old_values, advantages, returns):
        mm = self.ppo.update_matmul_dtype
        if mm is not None and mm != jnp.float32:
            # mixed precision: cast params+obs for the apply only; grads flow
            # back through the cast and accumulate into the f32 master params
            p_mm = jax.tree.map(lambda x: x.astype(mm), params)
            mean, log_std, values = self.network.apply(p_mm, obs.astype(mm))
            mean = mean.astype(jnp.float32)
            log_std = log_std.astype(jnp.float32)
            values = values.astype(jnp.float32)
        else:
            mean, log_std, values = self.network.apply(params, obs)
        logp = _gaussian_logp(mean, log_std, actions)
        ratio = jnp.exp(logp - old_logp)
        norm_adv = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        pg1 = ratio * norm_adv
        pg2 = jnp.clip(ratio, 1 - self.ppo.clip_eps, 1 + self.ppo.clip_eps) * norm_adv
        policy_loss = -jnp.minimum(pg1, pg2).mean()
        value_loss = 0.5 * ((values - returns) ** 2).mean()
        entropy = jnp.sum(log_std + 0.5 * jnp.log(2 * np.pi * np.e)) * jnp.ones(())
        total = policy_loss + self.ppo.vf_coef * value_loss - self.ppo.entropy_coef * entropy
        approx_kl = ((ratio - 1) - jnp.log(ratio)).mean()
        return total, (policy_loss, value_loss, entropy, approx_kl)

    def _kernel_train_step(self, params, opt_state, env_params, env_states,
                           obs, k_roll, k_perm):
        """Fully-kernelized update: one collection-kernel launch (generation
        + stochastic actor + value head + physics, in-kernel PRNG) feeding
        the featlane streamed sweep kernel — zero gathers or transposes
        anywhere; XLA only runs GAE and the tiny stats/permutation math.

        The trajectory noise comes from the hardware PRNG, so this path is
        statistically (not bitwise) equivalent to the XLA rollout; the
        collection step body itself is bit-pinned by the explicit-noise twin
        (tests/test_collect_kernel.py)."""
        from ..ops.pallas_collect import pallas_ppo_collect_day_seeded
        from ..ops.pallas_ppo_sweep import (SweepHypers, _pick_chunk,
                                            ppo_sweep_pallas_streamed)

        if self.mesh is not None and self.mesh.size > 1:
            raise ValueError("collect_impl='pallas' supports single-device "
                             "training only (see sweep_impl)")
        if self.ppo.rollout_days != 1:
            raise ValueError("collect_impl='pallas' collects exactly one day "
                             "per update (rollout_days=1)")
        if self.ppo.sweep_impl != "pallas":
            raise ValueError("collect_impl='pallas' requires "
                             "sweep_impl='pallas' (featlane trajectories)")
        B = obs.shape[0]
        T = self.env_config.steps_per_day
        env0 = jax.tree.map(lambda x: x[0], env_params)
        seed = jax.random.randint(k_roll, (), 0, jnp.iinfo(jnp.int32).max)
        obs_tfb, act_tab, logp_tb, val_tb, rew_tb, batt_fin = (
            pallas_ppo_collect_day_seeded(
                self.env_config, env0, params, seed,
                env_states.batt_soc, B, check_params=False))

        # episode ends at t = T-1 (day end), like the env's done flag; GAE's
        # bootstrap value is multiplied by (1 - done) = 0 there, so no
        # last_value evaluation is needed
        dones = jnp.zeros((T, B), bool).at[-1].set(True)
        advantages, returns = self._gae(rew_tb, val_tb, dones,
                                        jnp.zeros((B,), self.dtype))

        # featlane streamed sweep straight off the trajectory layout
        n_envs = B
        num_mb = min(self.ppo.num_minibatches, n_envs)
        E = self.ppo.num_epochs
        M = (n_envs // num_mb) * T
        hidden = tuple(self.network.hidden)
        chunk = _pick_chunk(M, self.env_config.obs_dim,
                            self.env_config.num_actions, hidden[0], hidden[1])
        # slab must divide the lane count; K blocks per minibatch
        slab = next(c for c in range(min(chunk, B), 0, -1) if B % c == 0)
        nslab = B // slab
        n_bl = T * nslab
        if n_bl % num_mb:
            raise ValueError(
                f"featlane blocks {n_bl} not divisible into {num_mb} "
                "minibatches — pick num_minibatches dividing steps_per_day")
        K = n_bl // num_mb
        keys = jax.random.split(k_perm, E)
        perms = jax.vmap(lambda k: jax.random.permutation(k, n_bl))(keys)
        block_perm = perms.reshape(E, num_mb, K).reshape(E * num_mb, K)

        found = _find_adam_state(opt_state)
        if found is None:
            raise ValueError("sweep_impl='pallas' requires an optax Adam state")
        adam, rebuild = found
        mm = self.ppo.update_matmul_dtype
        hp = SweepHypers(
            lr=self.ppo.learning_rate, clip_eps=self.ppo.clip_eps,
            vf_coef=self.ppo.vf_coef, ent_coef=self.ppo.entropy_coef,
            max_grad_norm=self.ppo.max_grad_norm,
            matmul_dtype=None if mm in (None, jnp.float32) else mm,
        )
        new_params, count, mu, nu, metrics_g = ppo_sweep_pallas_streamed(
            params, adam.count, adam.mu, adam.nu,
            obs_tfb, act_tab, logp_tb, advantages, returns,
            block_perm, slab, hp, interpret=self.ppo.sweep_interpret,
            data_layout="featlane",
        )
        opt_state = rebuild(optax.ScaleByAdamState(count=count, mu=mu, nu=nu))

        env_states = env_states._replace(batt_soc=batt_fin.astype(
            env_states.batt_soc.dtype))
        day_returns = rew_tb.sum(axis=0)
        metrics = PPOMetrics(
            policy_loss=metrics_g[:, 0].mean(),
            value_loss=metrics_g[:, 1].mean(),
            entropy=metrics_g[:, 2].mean(),
            approx_kl=metrics_g[:, 3].mean(),
            mean_return=day_returns.mean(),
        )
        return new_params, opt_state, env_states, obs, metrics

    def _shard_train_step(self, params, opt_state, env_params, env_states, obs, key):
        """Body executed per device shard; grads are psum-ed over the mesh."""
        k_roll, k_perm = jax.random.split(key)
        if self.ppo.collect_impl == "pallas":
            return self._kernel_train_step(
                params, opt_state, env_params, env_states, obs, k_roll, k_perm)
        env_states, obs, traj = self._rollout(params, env_params, env_states, obs, k_roll)
        t_obs, t_act, t_logp, t_val, t_rew, t_done = traj
        _, _, last_value = self.network.apply(params, obs)
        advantages, returns = self._gae(t_rew, t_val, t_done, last_value)

        # Trajectory-wise minibatching: shuffle ENVS, not samples.  A uniform
        # sample-level permutation of the flattened (T·B) rollout costs ~33 ms
        # per update on TPU (row gathers of 98k×10-epoch random rows dominate
        # the whole training step — measured round 4), while permuting the env
        # axis gathers B rows of T·feat contiguous elements each: 24× fewer,
        # 24× larger granules, ~µs-scale.  Each minibatch is then every step of
        # a random env subset — the same unbiased minibatch scheme as SB3's
        # RecurrentPPO sequence minibatches — re-drawn every epoch.  (Not a
        # bitwise equivalent of sample-level shuffling: per-minibatch advantage
        # normalization and clipping are nonlinear in minibatch composition.)
        # (B, T, ...) env-major layout so the per-epoch gather is a leading-
        # axis row gather, then minibatches are contiguous reshaped blocks.
        def env_major(x):
            return jnp.swapaxes(x, 0, 1)

        batch = tuple(map(env_major, (t_obs, t_act, t_logp, t_val, advantages, returns)))
        n_envs = batch[0].shape[0]
        # a shard smaller than num_minibatches (tiny tests) degrades to fewer,
        # 1-env minibatches rather than empty ones
        num_mb = min(self.ppo.num_minibatches, n_envs)
        mb_envs = n_envs // num_mb

        if self.ppo.sweep_impl == "pallas":
            params, opt_state, metrics_g = self._pallas_sweep(
                params, opt_state, batch, num_mb, mb_envs, k_perm)
            steps_per_day = self.env_config.steps_per_day
            day_returns = t_rew.reshape(
                self.ppo.rollout_days, steps_per_day, -1).sum(axis=1)
            metrics = PPOMetrics(
                policy_loss=metrics_g[:, 0].mean(),
                value_loss=metrics_g[:, 1].mean(),
                entropy=metrics_g[:, 2].mean(),
                approx_kl=metrics_g[:, 3].mean(),
                mean_return=day_returns.mean(),
            )
            return params, opt_state, env_states, obs, metrics

        scheme = self._resolved_scheme()
        T = batch[0].shape[1]
        M = mb_envs * T
        if scheme == "block":
            granule = self._block_granule(M)
            n_used = mb_envs * num_mb
            n_bl = (n_used * T) // granule
            block_views = tuple(
                x[:n_used].reshape((n_bl, granule) + x.shape[2:])
                for x in batch
            )

        def epoch(carry, key_e):
            params, opt_state = carry
            if scheme == "block":
                # permute contiguous sample BLOCKS (see PPOConfig.
                # minibatch_scheme): ~n_bl big rows instead of n_envs
                perm = jax.random.permutation(key_e, n_bl)
                mbs = tuple(
                    x[perm].reshape((num_mb, M) + x.shape[2:])
                    for x in block_views
                )
            else:
                perm = jax.random.permutation(key_e, n_envs)[: mb_envs * num_mb]
                # one leading-axis gather per epoch, then split into minibatch
                # blocks of shape (mb_envs·T, feat...)
                mbs = tuple(
                    x[perm].reshape((num_mb, -1) + x.shape[2:])
                    for x in batch
                )

            def minibatch(carry, mb):
                params, opt_state = carry
                (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(params, *mb)
                if self.mesh is not None:
                    grads = jax.lax.pmean(grads, ENV_AXIS)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), aux

            (params, opt_state), auxs = jax.lax.scan(minibatch, (params, opt_state), mbs)
            return (params, opt_state), auxs

        keys = jax.random.split(k_perm, self.ppo.num_epochs)
        (params, opt_state), auxs = jax.lax.scan(epoch, (params, opt_state), keys)

        steps_per_day = self.env_config.steps_per_day
        day_returns = t_rew.reshape(self.ppo.rollout_days, steps_per_day, -1).sum(axis=1)
        metrics = PPOMetrics(
            policy_loss=auxs[0].mean(),
            value_loss=auxs[1].mean(),
            entropy=auxs[2].mean(),
            approx_kl=auxs[3].mean(),
            mean_return=day_returns.mean(),
        )
        if self.mesh is not None:
            metrics = jax.tree.map(lambda m: jax.lax.pmean(m, ENV_AXIS), metrics)
        return params, opt_state, env_states, obs, metrics

    def _resolved_scheme(self) -> str:
        s = self.ppo.minibatch_scheme
        if s == "auto":
            return "block" if self.ppo.sweep_impl == "pallas" else "env"
        if s not in ("env", "block"):
            raise ValueError(f"unknown minibatch_scheme {s!r}")
        return s

    def _block_granule(self, M: int) -> int:
        """Sample-block granule of the "block" scheme — defined as the sweep
        kernel's streaming chunk so both implementations (and the kernel's
        DMA blocks) agree on the partition for exact parity."""
        from ..ops.pallas_ppo_sweep import _pick_chunk

        hidden = tuple(self.network.hidden)
        return _pick_chunk(M, self.env_config.obs_dim,
                           self.env_config.num_actions, hidden[0], hidden[1])

    def _pallas_sweep(self, params, opt_state, batch, num_mb, mb_envs, k_perm):
        """Run the epoch×minibatch sweep via the whole-sweep Pallas kernel
        (ops/pallas_ppo_sweep.py): identical permutation stream and optimizer
        math as the XLA scan, all grad steps in one launch.

        The minibatch tensors are pre-gathered here in (G, feat, M) layout
        (samples in the kernel's lane axis) and advantages pre-normalized per
        minibatch — both data-only transforms.  Single-device only: the kernel
        applies Adam locally, so a >1-device mesh (which needs a per-step grad
        pmean) must use sweep_impl="xla"."""
        from ..ops.pallas_ppo_sweep import SweepHypers, ppo_sweep_pallas

        if self.mesh is not None and self.mesh.size > 1:
            raise ValueError(
                "sweep_impl='pallas' supports single-device training only "
                "(the kernel applies Adam locally; a multi-device mesh needs "
                "the per-step gradient pmean of the XLA sweep)")
        t_obs, t_act, t_logp, _t_val, advantages, returns = batch
        n_envs, T = t_obs.shape[0], t_obs.shape[1]
        E = self.ppo.num_epochs
        G, M = E * num_mb, mb_envs * T
        scheme = self._resolved_scheme()

        keys = jax.random.split(k_perm, E)
        if scheme == "block":
            # zero-copy streaming: the block shuffle becomes the kernel's
            # scalar-prefetched index map (ops/pallas_ppo_sweep.py::
            # ppo_sweep_pallas_streamed) — nothing is gathered in HBM at all
            # (materializing the (G, M, feat) minibatches measured
            # ~1.5 ms/update even at block granularity; the env-wise gather
            # ~4 ms — see PPOConfig.minibatch_scheme)
            from ..ops.pallas_ppo_sweep import ppo_sweep_pallas_streamed

            granule = self._block_granule(M)
            n_used = mb_envs * num_mb
            n_bl = (n_used * T) // granule
            K = M // granule
            perms = jax.vmap(lambda k: jax.random.permutation(k, n_bl))(keys)
            block_perm = perms.reshape(E, num_mb, K).reshape(G, K)

            flats = [
                x[:n_used].reshape((n_used * T,) + x.shape[2:])
                for x in (t_obs, t_act, t_logp, advantages, returns)
            ]
            found = _find_adam_state(opt_state)
            if found is None:
                raise ValueError(
                    "sweep_impl='pallas' requires an optax Adam state")
            adam, rebuild = found
            mm = self.ppo.update_matmul_dtype
            hp = SweepHypers(
                lr=self.ppo.learning_rate, clip_eps=self.ppo.clip_eps,
                vf_coef=self.ppo.vf_coef, ent_coef=self.ppo.entropy_coef,
                max_grad_norm=self.ppo.max_grad_norm,
                matmul_dtype=None if mm in (None, jnp.float32) else mm,
            )
            new_params, count, mu, nu, metrics_g = ppo_sweep_pallas_streamed(
                params, adam.count, adam.mu, adam.nu, *flats,
                block_perm, granule, hp,
                interpret=self.ppo.sweep_interpret,
            )
            new_opt = rebuild(
                optax.ScaleByAdamState(count=count, mu=mu, nu=nu))
            return new_params, new_opt, metrics_g
        else:
            perms = jax.vmap(
                lambda k: jax.random.permutation(k, n_envs)[: mb_envs * num_mb]
            )(keys)                                    # (E, mb_envs·num_mb)

            def gather_feat(x):                        # (B, T, F) -> (G, M, F)
                # one leading-axis row gather + pure reshape: the kernel
                # consumes sample-major blocks precisely so NO transpose
                # happens here (a feature-major HBM layout cost ~4 ms/update
                # of XLA transposes)
                F = x.shape[2]
                return x[perms].reshape(G, M, F)

            def gather_row(x):                         # (B, T) -> (G, M)
                return x[perms].reshape(E, num_mb, M).reshape(G, M)

        obs_g = gather_feat(t_obs)
        act_g = gather_feat(t_act)
        logp_g = gather_row(t_logp)
        adv_g = gather_row(advantages)
        ret_g = gather_row(returns)
        nadv_g = (adv_g - adv_g.mean(axis=1, keepdims=True)) / (
            adv_g.std(axis=1, keepdims=True) + 1e-8)

        found = _find_adam_state(opt_state)
        if found is None:
            raise ValueError("sweep_impl='pallas' requires an optax Adam state")
        adam, rebuild = found
        mm = self.ppo.update_matmul_dtype
        hp = SweepHypers(
            lr=self.ppo.learning_rate, clip_eps=self.ppo.clip_eps,
            vf_coef=self.ppo.vf_coef, ent_coef=self.ppo.entropy_coef,
            max_grad_norm=self.ppo.max_grad_norm,
            matmul_dtype=None if mm in (None, jnp.float32) else mm,
        )
        new_params, count, mu, nu, metrics_g = ppo_sweep_pallas(
            params, adam.count, adam.mu, adam.nu,
            obs_g, act_g, logp_g, nadv_g, ret_g, hp,
            interpret=self.ppo.sweep_interpret,
        )
        new_opt = rebuild(optax.ScaleByAdamState(count=count, mu=mu, nu=nu))
        return new_params, new_opt, metrics_g

    def build_train_step(self):
        """The jitted (optionally shard_map-ped) train step."""
        if self._train_step is not None:
            return self._train_step
        if (self.ppo.collect_impl == "pallas"
                and getattr(self, "nanogrid_params_batched", None) is not None):
            # the collection kernel bakes reference constants; check eagerly
            # here (params are traced inside the jitted step)
            from ..ops.param_guard import check_baked_params

            check_baked_params(
                self.env_config,
                jax.tree.map(lambda x: x[0], self.nanogrid_params_batched),
                "PPOConfig.collect_impl='pallas'", generation=True)
        self._train_step = jax.jit(self._make_train_step_body())
        return self._train_step

    def build_train_many(self, updates_per_call: int):
        """One jitted program running ``updates_per_call`` full PPO updates
        (rollout + GAE + the epoch×minibatch sweep each) via ``lax.scan``.

        The single-update program is latency-bound at this model size: one
        update is ~6 ms of device work behind a ~27 ms tunnel dispatch, so
        stepping update-by-update measures the host round-trip, not the
        learner.  Scanning updates inside one program amortizes dispatch the
        same way the multiday kernels amortize it over days — this is also the
        deployment shape (the reference's training run is 2,125 sequential
        updates, solvers/RL/ppo_train.py:94-102).  Returns
        ``train_many(state, env_params) -> (state, metrics)`` with metrics
        stacked over the call's updates."""

        def train_many(state: PPOTrainState, env_params):
            single = self._make_train_step_body()

            def body(state, _):
                return single(state, env_params)

            return jax.lax.scan(body, state, length=updates_per_call)

        return jax.jit(train_many)

    def _make_train_step_body(self):
        """The un-jitted single-update body shared by build_train_step and
        build_train_many."""

        def train_step(state: PPOTrainState, env_params) -> tuple[PPOTrainState, PPOMetrics]:
            key, sub = jax.random.split(state.key)
            if self.mesh is not None:
                spec = P(ENV_AXIS)
                body = jax.shard_map(
                    self._shard_train_step,
                    mesh=self.mesh,
                    in_specs=(P(), P(), spec, spec, spec, P()),
                    out_specs=(P(), P(), spec, spec, P()),
                    check_vma=False,
                )
            else:
                body = self._shard_train_step
            params, opt_state, env_states, obs, metrics = body(
                state.params, state.opt_state, env_params, state.env_states, state.last_obs, sub
            )
            return (
                PPOTrainState(params, opt_state, env_states, obs, key, state.update_step + 1),
                metrics,
            )

        return train_step

    # ---------------------------------------------------------------- driving --

    def train(self, state: PPOTrainState, num_updates: int, log_every: int = 0):
        """Run ``num_updates`` train steps; returns final state + metric history."""
        step_fn = self.build_train_step()
        history = []
        for i in range(num_updates):
            state, metrics = step_fn(state, self.nanogrid_params_batched)
            if log_every and (i % log_every == 0 or i == num_updates - 1):
                m = jax.tree.map(lambda x: float(x), metrics)
                history.append(m)
        return state, history

    def policy_fn(self, params, deterministic=True):
        """Policy callable ``(obs, key) -> clipped actions`` for evaluation."""

        def policy(obs, key=None):
            mean, log_std, _ = self.network.apply(params, obs)
            action = mean
            if not deterministic and key is not None:
                action = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape, self.dtype)
            return jnp.clip(action, self._action_low, self._action_high)

        return policy

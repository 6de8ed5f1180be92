"""Benchmark: aggregate env-steps/s of the TPU-native engine.

Measures the BASELINE.json headline metric — env-steps/s with 4096 vectorized
envs — on the default reference configuration (8 chargers, PV + battery, 1h,
sparse penalties; reference ctor defaults, envs/smart_nanogrid_environment.py:32-34)
running the RBC policy closed-loop fully on device.  Each simulated day
includes a fresh day-schedule generation + reset + a full 24-step day, matching
what the reference does per episode (generate_new_initial_values=True path).

Primary path: the whole-benchmark Pallas kernel
(ops/pallas_gen_rollout.pallas_gen_rbc_multiday) — schedule generation from the
in-kernel PRNG, RBC policy, and all charger/BESS/grid physics fused into ONE
kernel launch per tens of thousands of days, so neither schedules nor
observations ever exist in HBM.  Its return distribution is checked against
the XLA engine at runtime (tests pin the semantics: test_pallas.py drives the
same kernel physics bit-for-bit from a shared uniform block).  Falls back to
the fused XLA rollout path if Pallas is unavailable.

Baseline: the reference pure-Python env measured in this container at
1,699 steps/s (single env, 8ch b-pv, including its per-episode day generation
and JSON telemetry dumps — solvers/RL training drives exactly that loop).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import functools
import json
import sys
import time

import jax
import numpy as np

# Persistent compile cache: the fused multi-day program takes minutes to build
# over the tunneled-TPU toolchain on first compile; cached runs start in seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from smart_nanogrid_gym_tpu.core import NanogridConfig, make_params

REFERENCE_STEPS_PER_SEC = 1699.0  # measured in this container, see module docstring

BATCH = 4096
NUM_CALLS_TIMED = 3


def xla_day_return_stats(config, params, batch, num_calls, seed0=1000):
    """Day-return mean/std from the XLA engine (fresh generation + fused day
    rollout, RBC closed-loop) — the cross-check oracle for the Pallas multiday
    kernel's in-kernel-PRNG path.  Runs ``num_calls`` × 50 days × ``batch``
    envs; statistics over all day returns."""
    import functools as _ft

    import jax.numpy as jnp

    from smart_nanogrid_gym_tpu.core.rollout import fused_day_rollout
    from smart_nanogrid_gym_tpu.core.transition import reset as core_reset
    from smart_nanogrid_gym_tpu.solvers.rbc import rbc_policy

    DAYS_PER_CALL = 50
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), params)
    reset_fn = jax.vmap(_ft.partial(core_reset, config))
    policy = jax.vmap(_ft.partial(rbc_policy, config))

    @jax.jit
    def run_days(i):
        def day(carry, j):
            keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(2), i * 1000 + j), batch)
            states, _ = reset_fn(bparams, keys, None, None)
            _, (_, rewards, _) = fused_day_rollout(
                config, bparams, states, lambda ob, k: policy(ob),
                jax.random.fold_in(jax.random.PRNGKey(3), i * 1000 + j),
            )
            ret = rewards.sum(axis=0)  # (batch,) day returns
            return carry, (ret.sum(), (ret * ret).sum())

        _, (sums, sqs) = jax.lax.scan(day, 0, jnp.arange(DAYS_PER_CALL))
        return sums.sum(), sqs.sum()

    total = 0.0
    total_sq = 0.0
    n = 0
    for i in range(num_calls):
        s, sq = run_days(seed0 + i)
        total += float(s)
        total_sq += float(sq)
        n += DAYS_PER_CALL * batch
    mean = total / n
    var = max(total_sq / n - mean * mean, 0.0)
    return mean, var ** 0.5, n


def stats_bounds(ref_mean, ref_std, n_kernel, n_oracle, z=6.0):
    """Derived tolerance for the kernel-vs-oracle day-return cross-check
    (VERDICT r4 item 5: bounds from the measured distribution, not eyeballed).

    The mean difference of two independent sample means has standard error
    ``σ·sqrt(1/n_k + 1/n_o)``; the sample-std difference has (normal-theory)
    standard error ``σ·sqrt(1/(2n_k) + 1/(2n_o))``.  Bounds are ``z=6`` of
    those (false-trip probability ~1e-9 under normality), floored at the
    legacy 1%/3% relative tolerances so the check never becomes TIGHTER than
    what real distribution bugs were previously caught by — day returns are
    penalty-heavy-tailed, so the normal-theory std error is a lower bound.
    Returns ``(mean_tol, std_tol)`` as absolute tolerances."""
    se_mean = ref_std * (1.0 / n_kernel + 1.0 / n_oracle) ** 0.5
    se_std = ref_std * (0.5 / n_kernel + 0.5 / n_oracle) ** 0.5
    return max(z * se_mean, 0.01 * abs(ref_mean)), max(z * se_std, 0.03 * ref_std)


def check_multiday_stats(kernel_stats_fn, n_kernel, config, params, label,
                         max_attempts=3):
    """Cross-check a multiday kernel's day-return statistics against the XLA
    engine with derived bounds (:func:`stats_bounds`) and median-of-k retry:
    attempt 1 compares a single draw (the fast path); on failure both sides are
    re-drawn with DISTINCT seeds and the medians compared — a genuine
    distribution bug fails every draw, while a tunnel mis-measure (CLAUDE.md:
    impossibly-fast timings class) or a statistical tail cannot survive the
    median.  ``kernel_stats_fn(attempt) -> (mean, std)`` must use a fresh seed
    per attempt."""
    k_draws, o_draws = [], []
    for attempt in range(max_attempts):
        k_draws.append(kernel_stats_fn(attempt))
        o_draws.append(xla_day_return_stats(config, params, BATCH, num_calls=1,
                                            seed0=1000 + 100 * attempt)[:2])
        mean = float(np.median([m for m, _ in k_draws]))
        std = float(np.median([s for _, s in k_draws]))
        ref_mean = float(np.median([m for m, _ in o_draws]))
        ref_std = float(np.median([s for _, s in o_draws]))
        n_oracle = 50 * BATCH
        mean_tol, std_tol = stats_bounds(ref_mean, ref_std, n_kernel, n_oracle)
        if abs(mean - ref_mean) < mean_tol and abs(std - ref_std) < std_tol:
            return ref_mean, ref_std
        print(f"# {label}: attempt {attempt + 1}/{max_attempts} outside bounds "
              f"(mean {mean:.2f} vs {ref_mean:.2f} tol {mean_tol:.2f}; "
              f"std {std:.2f} vs {ref_std:.2f} tol {std_tol:.2f}) — redrawing",
              file=sys.stderr)
    raise AssertionError(
        f"{label}: day-return stats diverge from the XLA engine after "
        f"{max_attempts} median-combined draws: mean {mean:.2f} vs {ref_mean:.2f} "
        f"(tol {mean_tol:.2f}), std {std:.2f} vs {ref_std:.2f} (tol {std_tol:.2f})"
    )


def bench_pallas_multiday(config, params):
    """Whole-benchmark fused kernel: one launch per DAYS days, in-kernel PRNG."""
    from smart_nanogrid_gym_tpu.ops.pallas_gen_rollout import pallas_gen_rbc_multiday

    # amortize the dispatch round-trip like a long training run: at ~7.5B
    # steps/s a 400k-day call is ~5.2 s against the tunnel's ~27 ms dispatch
    # (~0.5% overhead).  f32 stat accumulators stay accurate: per-env day
    # returns ~-350 over 400k days total ~-1.4e8, rounding accumulates only
    # ~sqrt(n)·ulp/2 ≈ 0.003% on the mean.
    DAYS = 400_000

    @jax.jit
    def run_days(seed):
        stats = pallas_gen_rbc_multiday(config, params, DAYS, seed, BATCH)
        total = DAYS * BATCH
        mean = stats[0].sum() / total
        var = stats[1].sum() / total - mean * mean
        return mean, jnp.sqrt(jnp.maximum(var, 0.0))

    # Statistical cross-check vs the XLA engine (derived bounds + median-of-3
    # retry, see check_multiday_stats) — catches degenerate physics or PRNG in
    # the in-kernel-generation path; a fresh PRNG seed per attempt.
    def kernel_stats(attempt):
        return tuple(map(float, jax.block_until_ready(run_days(50_000 + attempt))))

    check_multiday_stats(kernel_stats, DAYS * BATCH, config, params,
                         "pallas_gen_rbc_multiday")

    t0 = time.perf_counter()
    for i in range(NUM_CALLS_TIMED):
        jax.block_until_ready(run_days(i))
    elapsed = time.perf_counter() - t0
    return BATCH * config.steps_per_day * DAYS * NUM_CALLS_TIMED / elapsed


def bench_xla_fused(config, params):
    """Fallback: generation + fused XLA day rollout (no Pallas)."""
    from smart_nanogrid_gym_tpu.core.rollout import fused_day_rollout
    from smart_nanogrid_gym_tpu.core.transition import reset as core_reset
    from smart_nanogrid_gym_tpu.solvers.rbc import rbc_policy

    DAYS_PER_CALL = 50
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (BATCH,) + x.shape), params)
    reset_fn = jax.vmap(functools.partial(core_reset, config))
    policy = jax.vmap(functools.partial(rbc_policy, config))

    @jax.jit
    def run_days(i):
        def day(carry, j):
            keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(0), i * 1000 + j), BATCH)
            states, _ = reset_fn(bparams, keys, None, None)
            _, (_, rewards, _) = fused_day_rollout(
                config, bparams, states, lambda ob, k: policy(ob),
                jax.random.fold_in(jax.random.PRNGKey(1), j),
            )
            return carry, rewards.sum(axis=0).mean()

        _, day_returns = jax.lax.scan(day, 0, jnp.arange(DAYS_PER_CALL))
        return day_returns.mean()

    run_days(0).block_until_ready()
    t0 = time.perf_counter()
    for i in range(NUM_CALLS_TIMED):
        run_days(i).block_until_ready()
    elapsed = time.perf_counter() - t0
    return BATCH * config.steps_per_day * DAYS_PER_CALL * NUM_CALLS_TIMED / elapsed


def bench_scaling(config, params, out_path="SCALING.json"):
    """Scaling-efficiency sweep (BASELINE.md ≥80% 1-chip→N north star).

    Runs the zero-collectives sharded rollout at fixed per-device batch over
    mesh sizes 1..N on whatever devices exist (the real chip count here is 1;
    the virtual 8-device CPU mesh validates the sharding machinery — its
    wall-clock "efficiency" is meaningless because virtual devices time-slice
    the same cores, so records are tagged ``virtual``).  Writes ``SCALING.json``
    and prints one JSON line per platform.
    """
    from smart_nanogrid_gym_tpu.parallel.distributed import (
        initialize_distributed, scaling_sweep, write_scaling_report)

    initialize_distributed()
    payload = {}
    real = [d for d in jax.devices() if d.platform != "cpu"]
    if real:
        # the sweep's unit is the flagship fused Pallas multiday kernel, one
        # instance per device (path="kernel"), with per-call work sized to
        # amortize the ~27 ms tunnel dispatch exactly like the headline bench;
        # XLA rollout is only the fallback where Pallas cannot run
        try:
            records = scaling_sweep(
                config, params, devices=real, batch_per_device=4096,
                num_days=100_000, path="kernel")
        except Exception:
            import traceback, sys

            print("# kernel scaling path failed, falling back to XLA:", file=sys.stderr)
            traceback.print_exc()
            records = scaling_sweep(
                config, params, devices=real, batch_per_device=4096, path="xla")
        payload["tpu"] = {"records": records, "virtual": False}
        print(json.dumps({"platform": "tpu", "records": records}))
    cpus = jax.devices("cpu")
    if len(cpus) > 1:
        records = scaling_sweep(
            config, params, devices=cpus, batch_per_device=256, num_days=4
        )
        payload["cpu_virtual"] = {"records": records, "virtual": True}
        print(json.dumps({"platform": "cpu_virtual", "records": records}))
    else:
        # the bench process itself sees one CPU device; spawn a child with 8
        # virtual CPU devices so SCALING.json always carries a measured
        # multi-device (xla-path) record.  Tagged virtual: the devices
        # time-slice the same physical cores, so "efficiency" validates the
        # sharding machinery, not hardware scaling.
        records = _virtual_cpu_scaling_records()
        if records:
            payload["cpu_virtual"] = {"records": records, "virtual": True}
            print(json.dumps({"platform": "cpu_virtual", "records": records}))
    write_scaling_report(
        payload.get("tpu", payload.get("cpu_virtual", {})).get("records", []),
        out_path,
        meta={"platforms": payload},
    )


def _virtual_cpu_scaling_records(n_devices: int = 8):
    """scaling_sweep(path="xla") on a child process with ``n_devices`` virtual
    CPU devices (xla_force_host_platform_device_count — same mechanism as
    tests/conftest.py and the driver's dryrun).  Returns the records list, or
    [] if the child fails (never breaks the bench)."""
    import os
    import subprocess
    import sys

    code = (
        "import json\n"
        "import jax\n"
        "jax.config.update('jax_default_device', jax.devices('cpu')[0])\n"
        "from smart_nanogrid_gym_tpu.core import NanogridConfig, make_params\n"
        "from smart_nanogrid_gym_tpu.parallel.distributed import scaling_sweep\n"
        "config = NanogridConfig()\n"
        "params = make_params(config)\n"
        "records = scaling_sweep(config, params, devices=jax.devices('cpu'),\n"
        "                        batch_per_device=256, num_days=4, path='xla')\n"
        "print('SCALING_RECORDS=' + json.dumps(records))\n"
    )
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count={n_devices}").strip()
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=1200, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in out.stdout.splitlines():
            if line.startswith("SCALING_RECORDS="):
                return json.loads(line.split("=", 1)[1])
        print("# virtual-CPU scaling child produced no records:",
              out.stderr[-500:], file=sys.stderr)
    except Exception as exc:  # pragma: no cover - defensive
        print(f"# virtual-CPU scaling child failed: {exc}", file=sys.stderr)
    return []


def _timeit(fn, work_steps, calls=3):
    fn(0)
    t0 = time.perf_counter()
    for i in range(calls):
        fn(i + 1)
    return work_steps * calls / (time.perf_counter() - t0)


def bench_all(config, params, out_path="BENCH_TABLE.json"):
    """Measure EVERY benchmark path in the README table; write one JSON."""
    import functools as _ft

    import jax.numpy as jnp

    from smart_nanogrid_gym_tpu.core.rollout import fused_day_rollout
    from smart_nanogrid_gym_tpu.core.transition import reset as core_reset
    from smart_nanogrid_gym_tpu.solvers.networks import ActorCritic
    from smart_nanogrid_gym_tpu.solvers.rbc import rbc_policy

    results = {}
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (BATCH,) + x.shape), params)
    reset_fn = jax.vmap(_ft.partial(core_reset, config))
    rbc = jax.vmap(_ft.partial(rbc_policy, config))
    net = ActorCritic(action_dim=config.num_actions)
    net_params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, config.obs_dim)))
    low, high = config.action_bounds()
    low, high = jnp.asarray(low), jnp.asarray(high)

    def policy(ob, key):
        mean, _, _ = net.apply(net_params, ob)
        return jnp.clip(mean, low, high)

    def day_loop(policy_fn, days):
        @jax.jit
        def run(i):
            def day(carry, j):
                keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(0), i * 997 + j), BATCH)
                states, _ = reset_fn(bparams, keys, None, None)
                _, (_, rewards, _) = fused_day_rollout(
                    config, bparams, states, policy_fn,
                    jax.random.fold_in(jax.random.PRNGKey(1), j),
                )
                return carry, rewards.sum(axis=0).mean()
            _, r = jax.lax.scan(day, 0, jnp.arange(days))
            return r.mean()

        return lambda i: run(i).block_until_ready()

    # 1. whole-benchmark fused RBC multiday kernel (the headline)
    from smart_nanogrid_gym_tpu.ops.pallas_gen_rollout import pallas_gen_rbc_multiday

    @jax.jit
    def rbc_multiday(seed):
        return pallas_gen_rbc_multiday(config, params, 40_000, seed, BATCH)

    results["pallas_gen_rbc_multiday"] = _timeit(
        lambda i: jax.block_until_ready(rbc_multiday(i)), BATCH * config.steps_per_day * 40_000)

    # 2. XLA generation + fused XLA day scan, RBC
    results["xla_gen_plus_fused_day"] = _timeit(
        day_loop(lambda ob, k: rbc(ob), 50), BATCH * config.steps_per_day * 50)

    # 3. XLA generation + Pallas RBC day kernel
    from smart_nanogrid_gym_tpu.ops.pallas_rollout import pallas_rbc_day_rollout

    @jax.jit
    def gen_plus_pallas_day(i):
        def day(carry, j):
            keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(0), i * 991 + j), BATCH)
            states, _ = reset_fn(bparams, keys, None, None)
            rewards, _ = pallas_rbc_day_rollout(config, bparams, states)
            return carry, rewards.sum(axis=0).mean()
        _, r = jax.lax.scan(day, 0, jnp.arange(50))
        return r.mean()

    results["xla_gen_plus_pallas_rbc_day"] = _timeit(
        lambda i: gen_plus_pallas_day(i).block_until_ready(), BATCH * config.steps_per_day * 50)

    # 4. policy-in-the-loop, fused XLA
    results["xla_policy_in_loop"] = _timeit(
        day_loop(policy, 50), BATCH * config.steps_per_day * 50)

    # 5. whole-benchmark fused gen+MLP multiday kernel
    from smart_nanogrid_gym_tpu.ops.pallas_gen_policy_rollout import pallas_gen_policy_multiday

    @jax.jit
    def pol_multiday(seed):
        return pallas_gen_policy_multiday(config, params, net_params, 2_500, seed, BATCH)

    results["pallas_gen_policy_multiday"] = _timeit(
        lambda i: jax.block_until_ready(pol_multiday(i)), BATCH * config.steps_per_day * 2_500)

    # 5b. the bf16-MXU crossover: at a 256x256 actor torso the matmuls dominate
    # and bf16 operands win (it LOSES at the default 64x64 — docs/PERFORMANCE.md
    # §4; crossover pinned by tests/test_tpu_kernels.py)
    big_net = ActorCritic(action_dim=config.num_actions, hidden=(256, 256))
    big_params = big_net.init(jax.random.PRNGKey(0), jnp.zeros((1, config.obs_dim)))
    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        run_big = jax.jit(_ft.partial(
            pallas_gen_policy_multiday, config, params, big_params, 1_000,
            batch=BATCH, mlp_dtype=dt))
        results[f"pallas_gen_policy_multiday_256x256_{tag}"] = _timeit(
            lambda i, r=run_big: jax.block_until_ready(r(i)),
            BATCH * config.steps_per_day * 1_000)

    # 6. training updates — the reference's ACTUAL workload (1.02M env steps
    # of PPO training per script run, solvers/RL/ppo_train.py:94-102).
    # Measured two ways: scanned (updates_per_call scanned inside one program,
    # the deployment shape — 2,125 sequential updates per reference run) and
    # unamortized (one dispatch per update, dominated by the ~27 ms tunnel
    # round-trip; reported so the dispatch overhead is visible, not hidden).
    from smart_nanogrid_gym_tpu.solvers.ppo import PPOConfig, PPOLearner

    learner = PPOLearner(config, PPOConfig())  # SB3 defaults: 10 epochs x 4 mb
    ppo_state = learner.init(jax.random.PRNGKey(0), params, batch_size=BATCH)
    steps_per_update = BATCH * config.steps_per_day

    PPO_UPDATES = 25
    train_many = learner.build_train_many(PPO_UPDATES)

    def ppo_many(i):
        jax.block_until_ready(train_many(ppo_state, learner.nanogrid_params_batched))

    results["ppo_train_update"] = _timeit(ppo_many, steps_per_update * PPO_UPDATES)

    train_one = learner.build_train_step()

    def ppo_one(i):
        jax.block_until_ready(train_one(ppo_state, learner.nanogrid_params_batched))

    results["ppo_train_update_unamortized"] = _timeit(ppo_one, steps_per_update)

    # 6b. fully-kernelized PPO training (round 5): ONE collection-kernel
    # launch (generation + stochastic actor + value head + physics, in-kernel
    # PRNG) feeding the whole-sweep kernel (all 40 grad steps, params+Adam in
    # VMEM) through featlane streaming — zero gathers/transposes; XLA runs
    # only GAE and the block-permutation math.  The sweep kernel runs at its
    # VPU compute bound (docs/PERFORMANCE.md §5).
    klearner = PPOLearner(config, PPOConfig(sweep_impl="pallas",
                                            collect_impl="pallas"))
    kppo_state = klearner.init(jax.random.PRNGKey(0), params, batch_size=BATCH)
    ktrain_many = klearner.build_train_many(PPO_UPDATES)

    def kppo_many(i):
        jax.block_until_ready(
            ktrain_many(kppo_state, klearner.nanogrid_params_batched))

    results["ppo_train_update_kernel"] = _timeit(
        kppo_many, steps_per_update * PPO_UPDATES)
    del kppo_state

    # DDPG: collect one day + 24 gradient steps (batch 256) per update
    from smart_nanogrid_gym_tpu.solvers.ddpg import DDPGConfig, DDPGLearner

    dlearner = DDPGLearner(config, DDPGConfig(buffer_days=10))
    ddpg_state = dlearner.init(jax.random.PRNGKey(1), params, batch_size=BATCH)
    DDPG_UPDATES = 25
    ddpg_many = dlearner.build_train_many(DDPG_UPDATES)

    def ddpg_call(i):
        jax.block_until_ready(ddpg_many(ddpg_state, dlearner.nanogrid_params_batched))

    results["ddpg_train_update"] = _timeit(ddpg_call, steps_per_update * DDPG_UPDATES)

    # 6c. fully-kernelized DDPG training: collection kernel (in-kernel
    # generation, explicit OU stream) + whole-sweep kernel with bf16 matmul
    # operands (a measured WIN at the 400-wide critic/actor, unlike PPO's
    # K<=64 shapes — docs/PERFORMANCE.md §5)
    kdlearner = DDPGLearner(config, DDPGConfig(
        buffer_days=10, sweep_impl="pallas", collect_impl="pallas",
        update_matmul_dtype=jnp.bfloat16))
    kddpg_state = kdlearner.init(jax.random.PRNGKey(1), params, batch_size=BATCH)
    kddpg_many = kdlearner.build_train_many(DDPG_UPDATES)

    def kddpg_call(i):
        jax.block_until_ready(
            kddpg_many(kddpg_state, kdlearner.nanogrid_params_batched))

    results["ddpg_train_update_kernel"] = _timeit(
        kddpg_call, steps_per_update * DDPG_UPDATES)
    del kddpg_state

    del ppo_state, ddpg_state  # free the replay buffer before the native runs

    # 7. native engines (CPU serving)
    import numpy as _np

    from smart_nanogrid_gym_tpu.native import (
        NativeBatchEngine, NativeEngine, generate_schedule_native)

    sched = generate_schedule_native(0, config.num_chargers, config.time_interval)
    eng = NativeEngine(config)
    eng.reset(sched, batt_soc=0.5)
    a1 = _np.full(config.num_actions, 0.3)
    t0 = time.perf_counter()
    for _ in range(20_000):
        eng.step(a1)
    results["native_single_env"] = 20_000 / (time.perf_counter() - t0)

    NB = 1024
    fleet = NativeBatchEngine(config, NB)
    fleet.reset([generate_schedule_native(i, config.num_chargers) for i in range(NB)])
    ab = _np.broadcast_to(a1, (NB, config.num_actions)).copy()
    for _ in range(24):
        fleet.step_batch(ab)
    t0 = time.perf_counter()
    for _ in range(10 * 24):
        fleet.step_batch(ab)
    results["native_batched_1024"] = NB * 10 * 24 / (time.perf_counter() - t0)

    results = {k: round(v, 1) for k, v in results.items()}
    with open(out_path, "w") as fp:
        json.dump({"batch": BATCH, "config": "8ch b-pv sparse 1h",
                   "unit": "env-steps/s", "paths": results}, fp, indent=2)
    for k, v in results.items():
        print(json.dumps({"path": k, "steps_per_sec": v}))


def bench_train_profile(config, params, out_path="TRAIN_PROFILE.json"):
    """Phase breakdown of the PPO training update (VERDICT r3 #2).

    Times three scanned programs over the same state — rollout only,
    rollout+GAE, and the full update (rollout+GAE+the 10-epoch×4-minibatch
    sweep) — and reports per-phase time by subtraction.  Every program scans
    REPS iterations so the ~27 ms dispatch round-trip amortizes out and the
    numbers are device time, not tunnel latency.
    """
    from smart_nanogrid_gym_tpu.solvers.ppo import PPOConfig, PPOLearner

    learner = PPOLearner(config, PPOConfig())
    state = learner.init(jax.random.PRNGKey(0), params, batch_size=BATCH)
    env_params = learner.nanogrid_params_batched
    REPS = 25
    steps = BATCH * config.steps_per_day * REPS

    def scanned(include_gae):
        @jax.jit
        def run(state):
            def body(carry, _):
                key, env_states, obs = carry
                key, k = jax.random.split(key)
                env_states, obs, traj = learner._rollout(
                    state.params, env_params, env_states, obs, k)
                t_obs, t_act, t_logp, t_val, t_rew, t_done = traj
                if include_gae:
                    _, _, last_value = learner.network.apply(state.params, obs)
                    adv, ret = learner._gae(t_rew, t_val, t_done, last_value)
                    out = adv.mean() + ret.mean()
                else:
                    out = t_rew.mean()
                return (key, env_states, obs), out

            _, outs = jax.lax.scan(
                body, (state.key, state.env_states, state.last_obs), length=REPS)
            return outs.mean()

        return lambda i: run(state).block_until_ready()

    full = learner.build_train_many(REPS)

    def timed(fn):
        fn(0)
        t0 = time.perf_counter()
        for i in range(NUM_CALLS_TIMED):
            fn(i + 1)
        return (time.perf_counter() - t0) / NUM_CALLS_TIMED

    t_rollout = timed(scanned(include_gae=False))
    t_gae = timed(scanned(include_gae=True))
    t_full = timed(lambda i: jax.block_until_ready(full(state, env_params)))

    # the fully-kernelized path (round 5): collection kernel + whole-sweep
    # kernel, two launches per update — reported as a total (its phases are
    # inside the kernels; see docs/PERFORMANCE.md §5b for the decomposition)
    klearner = PPOLearner(config, PPOConfig(sweep_impl="pallas",
                                            collect_impl="pallas"))
    kstate = klearner.init(jax.random.PRNGKey(0), params, batch_size=BATCH)
    kfull = klearner.build_train_many(REPS)
    t_kernel = timed(
        lambda i: jax.block_until_ready(kfull(kstate, klearner.nanogrid_params_batched)))

    report = {
        "batch": BATCH,
        "updates_per_call": REPS,
        "env_steps_per_call": steps,
        "phases_sec_per_update": {
            "rollout": round(t_rollout / REPS, 6),
            "gae": round(max(t_gae - t_rollout, 0.0) / REPS, 6),
            "update_sweep_10ep_x_4mb": round(max(t_full - t_gae, 0.0) / REPS, 6),
            "total": round(t_full / REPS, 6),
        },
        "kernel_path_sec_per_update": round(t_kernel / REPS, 6),
        "train_env_steps_per_sec": round(steps / t_full, 1),
        "kernel_train_env_steps_per_sec": round(steps / t_kernel, 1),
    }
    with open(out_path, "w") as fp:
        json.dump(report, fp, indent=2)
    print(json.dumps(report))


def main():
    import sys

    config = NanogridConfig(
        num_chargers=8,
        pv_system=True,
        battery_system=True,
        penalty_mode="sparse",
        time_interval=1.0,
    )
    params = make_params(config, dtype=jnp.float32)

    if "--scaling" in sys.argv:
        bench_scaling(config, params)
        return
    if "--all" in sys.argv:
        bench_all(config, params)
        return
    if "--train-profile" in sys.argv:
        bench_train_profile(config, params)
        return

    try:
        steps_per_sec = bench_pallas_multiday(config, params)
    except Exception:
        import traceback

        print("# pallas path failed, falling back to XLA:", file=sys.stderr)
        traceback.print_exc()
        steps_per_sec = bench_xla_fused(config, params)

    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip_4096envs",
                "value": round(steps_per_sec, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

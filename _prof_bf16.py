import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from smart_nanogrid_gym_tpu.core import NanogridConfig, make_params
from smart_nanogrid_gym_tpu.solvers.ppo import PPOConfig, PPOLearner
config = NanogridConfig(num_chargers=8, pv_system=True, battery_system=True,
                        penalty_mode="sparse", time_interval=1.0)
params = make_params(config, dtype=jnp.float32)
REPS = 25
for dt, tag in ((None, "f32"), (jnp.bfloat16, "bf16")):
    learner = PPOLearner(config, PPOConfig(update_matmul_dtype=dt))
    state = learner.init(jax.random.PRNGKey(0), params, batch_size=4096)
    full = learner.build_train_many(REPS)
    jax.block_until_ready(full(state, learner.nanogrid_params_batched))
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(full(state, learner.nanogrid_params_batched))
    per = (time.perf_counter() - t0) / 3 / REPS
    steps = 4096 * 24
    print(f"ppo update [{tag:4s}]: {per*1e3:6.2f} ms -> {steps/per/1e6:6.1f}M env-steps/s")

"""REAL multi-process distributed execution (parallel/multihost_demo.py).

Spawns two separate OS processes, each with 4 virtual CPU devices, wired by
jax.distributed + gloo collectives (standing in for DCN).  The global 1-D env
mesh spans both processes; each generates only its own env shard; the sharded
rollout and the PPO train step (cross-process gradient psum) run on global
arrays.  Pins:

- both processes report identical rollout/PPO returns (global arrays +
  replicated learner);
- a 1-process run of the SAME global batch produces the SAME rollout return —
  the process-count-invariance contract of host-local generation.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = 12411


def _run_worker(pid, nprocs, port, extra=()):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_NUM_PROCESSES", None)
    env.pop("JAX_PROCESS_ID", None)
    return subprocess.Popen(
        [sys.executable, "-m", "smart_nanogrid_gym_tpu.parallel.multihost_demo",
         "--process-id", str(pid), "--num-processes", str(nprocs),
         "--coordinator", f"localhost:{port}", *extra],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True,
    )


def _last_json(out):
    lines = [l for l in out.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON in output: {out!r}"
    return json.loads(lines[-1])


def test_two_process_distributed_run_matches_single_process():
    # subprocess communicate() carries its own 540 s timeout per worker
    procs = [_run_worker(i, 2, PORT) for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(_last_json(out))

    # both processes agree bit-for-bit on the global results
    assert outs[0]["global_devices"] == outs[1]["global_devices"] == 8
    assert outs[0]["local_devices"] == outs[1]["local_devices"] == 4
    assert outs[0]["rollout_mean_day_return"] == outs[1]["rollout_mean_day_return"]
    assert outs[0]["ppo_mean_return"] == outs[1]["ppo_mean_return"]
    assert np.isfinite(outs[0]["ppo_mean_return"])

    # process-count invariance: 1 process, same global batch -> same rollout
    single = _run_worker(0, 1, PORT + 1)
    out, err = single.communicate(timeout=540)
    assert single.returncode == 0, f"single-process run failed:\n{err[-3000:]}"
    solo = _last_json(out)
    assert solo["rollout_mean_day_return"] == pytest.approx(
        outs[0]["rollout_mean_day_return"], rel=1e-6
    )

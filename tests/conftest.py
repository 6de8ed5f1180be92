"""Test configuration.

Tests run on CPU with 8 virtual devices (multi-chip sharding is validated on a
virtual mesh; real TPU hardware is exercised by bench.py) and with x64 enabled
so oracle trajectory tests can match the reference's float64 numpy compute
(envs cast observations to float32 at the end, like the reference does at
smart_nanogrid_environment.py:224-229).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
# This image ships an always-on experimental TPU plugin ('axon') that ignores
# JAX_PLATFORMS; route default placement to CPU so tests are hermetic and fast
# (eager dispatch to the tunneled TPU costs ~1s/op) and f64 is available.
jax.config.update("jax_default_device", jax.devices("cpu")[0])

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

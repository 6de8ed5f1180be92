"""smart_nanogrid_gym_tpu — a TPU-native smart-nanogrid environment engine.

A from-scratch re-design of the capabilities of Dellintel98/smart-nanogrid-gym
(reference mounted read-only at /root/reference) as a pure-functional JAX
framework: one jittable step function vmapped over thousands of env instances,
counter-based PRNG schedules, device-mesh sharding for multi-host scale, and
actor-learner training (PPO/DDPG) fully on device.

See SURVEY.md at the repo root for the reference analysis this build follows.
"""

from .core import (
    NanogridConfig,
    NanogridParams,
    PenaltyMode,
    SmartNanogridTPU,
    make_params,
)

__version__ = "0.1.0"

__all__ = [
    "NanogridConfig",
    "NanogridParams",
    "PenaltyMode",
    "SmartNanogridTPU",
    "make_params",
]

"""Gymnasium-compatible env exports.

Mirrors the reference package layout (smart_nanogrid_gym/envs/__init__.py:1 and
the ``SmartNanogridEnv-v0`` registration in smart_nanogrid_gym/__init__.py:4-8)
so downstream code can do either::

    from smart_nanogrid_gym_tpu.envs import SmartNanogridEnv
    # or, with gymnasium installed:
    import smart_nanogrid_gym_tpu.envs  # registers SmartNanogridEnv-v0
    env = gymnasium.make("SmartNanogridEnv-v0", number_of_chargers=4, ...)
"""

from ..compat.gym_adapter import SmartNanogridEnv

__all__ = ["SmartNanogridEnv"]

try:
    import gymnasium as _gymnasium

    if "SmartNanogridEnv-v0" not in _gymnasium.registry:
        _gymnasium.register(
            id="SmartNanogridEnv-v0",
            entry_point="smart_nanogrid_gym_tpu.envs:SmartNanogridEnv",
            max_episode_steps=200,  # reference smart_nanogrid_gym/__init__.py:7
        )
except ImportError:  # pragma: no cover - gymnasium optional
    pass

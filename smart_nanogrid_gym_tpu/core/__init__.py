"""Core engine package.

Imports are lazy so that JAX-free paths (``..core.config``, ``..core.prices``,
``..core.solar`` — used by the native C++ serving runtime) never pull in JAX.
"""

_EXPORTS = {
    "NanogridConfig": ("config", "NanogridConfig"),
    "PenaltyMode": ("config", "PenaltyMode"),
    "parse_time_interval": ("config", "parse_time_interval"),
    "SmartNanogridTPU": ("env", "SmartNanogridTPU"),
    "NanogridParams": ("params", "NanogridParams"),
    "make_params": ("params", "make_params"),
    "DaySchedule": ("state", "DaySchedule"),
    "EnvState": ("state", "EnvState"),
    "StepInfo": ("state", "StepInfo"),
    "StepResult": ("transition", "StepResult"),
    "observe": ("transition", "observe"),
    "reset": ("transition", "reset"),
    "step": ("transition", "step"),
    "fused_day_rollout": ("rollout", "fused_day_rollout"),
    "generate_schedule": ("generate", "generate_schedule"),
    "schedule_from_arrays": ("generate", "schedule_from_arrays"),
    "schedule_to_json_dict": ("generate", "schedule_to_json_dict"),
    "load_initial_values_json": ("generate", "load_initial_values_json"),
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        module, attr = _EXPORTS[name]
        return getattr(importlib.import_module(f".{module}", __name__), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

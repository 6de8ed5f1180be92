from .config import NanogridConfig, PenaltyMode, parse_time_interval
from .env import SmartNanogridTPU
from .generate import (
    generate_schedule,
    load_initial_values_json,
    schedule_from_arrays,
    schedule_to_json_dict,
)
from .params import NanogridParams, make_params
from .state import DaySchedule, EnvState, StepInfo
from .step import StepResult, observe, reset, step

__all__ = [
    "NanogridConfig",
    "PenaltyMode",
    "parse_time_interval",
    "SmartNanogridTPU",
    "NanogridParams",
    "make_params",
    "DaySchedule",
    "EnvState",
    "StepInfo",
    "StepResult",
    "observe",
    "reset",
    "step",
    "generate_schedule",
    "schedule_from_arrays",
    "schedule_to_json_dict",
    "load_initial_values_json",
]

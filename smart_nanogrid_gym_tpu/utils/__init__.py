from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .profiling import PhaseTimer, ThroughputMeter, device_trace

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
    "device_trace",
    "PhaseTimer",
    "ThroughputMeter",
]

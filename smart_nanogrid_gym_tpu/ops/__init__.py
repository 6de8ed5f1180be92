from .pallas_rollout import pallas_rbc_day_rollout

__all__ = ["pallas_rbc_day_rollout"]

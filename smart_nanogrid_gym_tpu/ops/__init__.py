from .pallas_rollout import pallas_rbc_day_rollout
from .pallas_policy_rollout import pallas_policy_day_rollout

__all__ = ["pallas_rbc_day_rollout", "pallas_policy_day_rollout"]

from .ddpg import DDPGConfig, DDPGLearner
from .evaluator import evaluate_policies_same_days, predict_single_day
from .networks import ActorCritic, DDPGActor, DDPGCritic
from .ppo import PPOConfig, PPOLearner
from .rbc import make_rbc_policy_fn, rbc_policy

__all__ = [
    "PPOConfig",
    "PPOLearner",
    "DDPGConfig",
    "DDPGLearner",
    "ActorCritic",
    "DDPGActor",
    "DDPGCritic",
    "rbc_policy",
    "make_rbc_policy_fn",
    "evaluate_policies_same_days",
    "predict_single_day",
]

from .mesh import ENV_AXIS, make_mesh, replicate, shard_env_batch, sharded_rollout_fn

__all__ = ["ENV_AXIS", "make_mesh", "shard_env_batch", "sharded_rollout_fn", "replicate"]

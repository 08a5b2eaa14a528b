from .sharding import make_device_mesh, shard_equation, ShardedMomentumKernel

__all__ = ["make_device_mesh", "shard_equation", "ShardedMomentumKernel"]

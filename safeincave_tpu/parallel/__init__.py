from .sharding import make_device_mesh, shard_equation, ShardedMomentumKernel
from .halo import HaloPlan, HaloMomentumSolver

__all__ = ["make_device_mesh", "shard_equation", "ShardedMomentumKernel",
           "HaloPlan", "HaloMomentumSolver"]

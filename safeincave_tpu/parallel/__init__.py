from .sharding import (make_device_mesh, shard_equation, shard_tm,
                       ShardedMomentumKernel, ShardedHeatKernel)
from .halo import HaloPlan, HaloMomentumSolver

__all__ = ["make_device_mesh", "shard_equation", "shard_tm",
           "ShardedMomentumKernel", "ShardedHeatKernel",
           "HaloPlan", "HaloMomentumSolver"]

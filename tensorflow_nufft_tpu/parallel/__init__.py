"""Multi-chip sharding of NUFFT transforms (see sharded module)."""

from tensorflow_nufft_tpu.parallel.sharded import (
    ShardedPlannedNufft, sharded_nufft, sharded_nufft_grid,
    sharded_nufft_type3)

__all__ = ["ShardedPlannedNufft", "sharded_nufft", "sharded_nufft_grid",
           "sharded_nufft_type3"]

"""Multi-chip sharding of NUFFT transforms (see sharded module)."""

from tensorflow_nufft_tpu.parallel.sharded import (
    sharded_nufft, sharded_nufft_grid)

__all__ = ["sharded_nufft", "sharded_nufft_grid"]

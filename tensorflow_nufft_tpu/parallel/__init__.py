"""Multi-chip sharding of NUFFT transforms (see sharded module)."""

from tensorflow_nufft_tpu.parallel.sharded import sharded_nufft

__all__ = ["sharded_nufft"]

"""Public NUFFT operations."""

from tensorflow_nufft_tpu.ops.nufft_ops import (
    nufft,
    interp,
    spread,
    nudft,
)

__all__ = ["nufft", "interp", "spread", "nudft"]

"""Compute kernels: XLA reference path and Pallas TPU kernels.

``xla_ops`` is the portable, always-correct path built from XLA
scatter/gather; the Pallas modules provide the TPU speed-of-light path and
are selected by ``dispatch`` when profitable.
"""

from tensorflow_nufft_tpu.kernels.xla_ops import (
    fold_and_rescale,
    es_kernel,
    spread_geometry,
    spread_xla,
    interp_xla,
)

__all__ = [
    "fold_and_rescale",
    "es_kernel",
    "spread_geometry",
    "spread_xla",
    "interp_xla",
]

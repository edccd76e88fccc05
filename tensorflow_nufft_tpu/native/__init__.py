"""Native (C++/OpenMP) CPU engine: fp64 / high-precision NUFFT paths.

See ``tensorflow_nufft_tpu.native.nufft`` for the drop-in eager API and
``tensorflow_nufft_tpu.native.engine`` for the low-level bindings.
"""

from tensorflow_nufft_tpu.native.engine import available
from tensorflow_nufft_tpu.native.nufft_impl import nufft, interp, spread

__all__ = ["available", "nufft", "interp", "spread"]

"""TPU-native non-uniform fast Fourier transform for JAX.

A from-scratch re-design of the capabilities of mrphys/tensorflow-nufft
(reference exports: tensorflow_nufft/__init__.py:17-20) on the TPU stack:
jit-compiled XLA pipelines, Pallas kernels for the spread/interp hot loops,
custom-VJP autodiff, NumPy-style batching/broadcasting, and multi-chip
sharding via ``jax.sharding``.

Typical usage::

    import tensorflow_nufft_tpu as tfft
    target = tfft.nufft(source, points, transform_type='type_2')
"""

from tensorflow_nufft_tpu.__about__ import __version__
from tensorflow_nufft_tpu.ops.nufft_ops import nufft, interp, spread, nudft
from tensorflow_nufft_tpu.ops.type3 import (
    Type3Plan, nudft_type3, nufft_type3)
from tensorflow_nufft_tpu import planar
from tensorflow_nufft_tpu import parallel
from tensorflow_nufft_tpu.options.options import (
    Options,
    DebuggingOptions,
    FftwOptions,
    FftwPlanningRigor,
    PointsRange,
)

__all__ = [
    "planar",
    "nufft",
    "nufft_type3",
    "nudft_type3",
    "Type3Plan",
    "interp",
    "spread",
    "nudft",
    "Options",
    "DebuggingOptions",
    "FftwOptions",
    "FftwPlanningRigor",
    "PointsRange",
    "__version__",
]

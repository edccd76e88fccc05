"""User-facing options, mirroring the reference's `tfft.Options` surface."""

from tensorflow_nufft_tpu.options.options import (
    Options,
    DebuggingOptions,
    FftwOptions,
    FftwPlanningRigor,
    PointsRange,
)

__all__ = [
    "Options",
    "DebuggingOptions",
    "FftwOptions",
    "FftwPlanningRigor",
    "PointsRange",
]

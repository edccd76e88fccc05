"""Advanced options for the NUFFT ops.

API parity with the reference's pydantic options model
(reference: python/ops/nufft_options.py:25-273, proto/nufft_options.proto).
The FFTW options are accepted for drop-in compatibility but have no effect
on TPU (XLA's FFT needs no planning); they round-trip through serialization
unchanged.

TPU-specific extensions live on ``Options`` under clearly-named fields and
default to automatic behavior.
"""

from __future__ import annotations

import enum
from typing import Optional

import pydantic


class FftwPlanningRigor(enum.IntEnum):
    """Planning rigor of the FFTW library (compatibility only).

    On TPU the FFT is compiled by XLA and there is no planning stage, so
    this option has no effect. It is retained so that code written against
    the reference keeps working (reference: nufft_options.py:25-93).

    - **AUTO**: selects the planning rigor automatically.
    - **ESTIMATE**: use a simple heuristic instead of measurements.
    - **MEASURE**: find an optimized plan by measuring several transforms.
    - **PATIENT**: like MEASURE, with a wider search.
    - **EXHAUSTIVE**: like PATIENT, with an even wider search.
    """
    AUTO = 0
    ESTIMATE = 1
    MEASURE = 2
    PATIENT = 3
    EXHAUSTIVE = 4

    def to_proto(self) -> int:
        return int(self)

    @classmethod
    def from_proto(cls, pb) -> "FftwPlanningRigor":
        return cls(int(pb))


class PointsRange(enum.IntEnum):
    """Supported range of the nonuniform points (reference:
    nufft_options.py:95-158).

    - **STRICT**: only values in ``[-pi, pi]`` are supported.
    - **EXTENDED**: values in ``[-3*pi, 3*pi]`` are supported (default).
    - **INFINITE**: any value is supported.

    Narrower ranges may be faster: STRICT needs no folding, EXTENDED a
    single fold, INFINITE a full modulo reduction.
    """
    STRICT = 0
    EXTENDED = 1
    INFINITE = 2

    def to_proto(self) -> int:
        return int(self)

    @classmethod
    def from_proto(cls, pb) -> "PointsRange":
        return cls(int(pb))


class DebuggingOptions(pydantic.BaseModel):
    """Debugging options (reference: nufft_options.py:160-186).

    Attributes:
        check_points_range: If True, ``nufft`` asserts that the nonuniform
            points lie within the supported range (see
            ``Options.points_range``). Adds a device-side check; outputs
            for out-of-range points become NaN so the violation is
            detectable under jit.
    """
    model_config = pydantic.ConfigDict(validate_assignment=True)

    check_points_range: bool = False

    def to_proto(self):
        from tensorflow_nufft_tpu.proto import nufft_options_pb2
        pb = nufft_options_pb2.DebuggingOptions()
        pb.check_points_range = self.check_points_range
        return pb

    @classmethod
    def from_proto(cls, pb) -> "DebuggingOptions":
        return cls(check_points_range=pb.check_points_range)


class FftwOptions(pydantic.BaseModel):
    """FFTW library options, compatibility only (reference:
    nufft_options.py:189-219).

    Attributes:
        planning_rigor: Controls the rigor (and time) of the planning
            process. No effect on TPU.
    """
    model_config = pydantic.ConfigDict(validate_assignment=True)

    planning_rigor: FftwPlanningRigor = FftwPlanningRigor.AUTO

    def to_proto(self):
        from tensorflow_nufft_tpu.proto import nufft_options_pb2
        pb = nufft_options_pb2.FftwOptions()
        pb.planning_rigor = int(self.planning_rigor)
        return pb

    @classmethod
    def from_proto(cls, pb) -> "FftwOptions":
        return cls(planning_rigor=FftwPlanningRigor(int(pb.planning_rigor)))


class Options(pydantic.BaseModel):
    """Advanced options for `nufft` (reference: nufft_options.py:222-273).

    Attributes:
        debugging: Options for debugging. See ``DebuggingOptions``.
        fftw: Options for the FFTW library (no effect on TPU).
        max_batch_size: Optional int. Maximum number of transforms computed
            at once; larger batches are processed in chunks of this size to
            bound fine-grid memory.
        points_range: A ``PointsRange``. Supported range of the nonuniform
            points. Defaults to EXTENDED.
        backend: TPU extension. One of 'auto', 'xla', 'pallas', 'native'.
            Selects the spread/interp kernel implementation; 'auto' picks
            the fastest available for the device and problem. 'native'
            runs the C++/OpenMP host engine via a host callback (CPU
            only; forward pass under jit, gradients via the NUFFT-level
            custom VJP).
        upsampling_factor: TPU extension. Optional override of the fine-grid
            oversampling factor sigma (> 1.0); None selects automatically.
        show_warnings: bool. Emit Python warnings for silently adjusted
            parameters (e.g. a requested tolerance below machine
            precision being clamped). Mirrors the reference's
            show_warnings internal option (nufft_options.h:102-103).
        verbosity: int. 0 = silent (default); 1 logs a one-line plan
            summary (sigma, kernel width, fine grid) per transform call
            to stderr. Mirrors the reference's verbosity internal
            option (nufft_options.h:98-100); like the reference's, it
            is internal-only and not serialized to proto.
        kernel_evaluation_method: One of 'auto', 'direct', 'horner'.
            How the ES spreading kernel is evaluated. 'direct' is the
            exact ``exp(beta*sqrt(1-c*z^2))`` form; 'horner' a
            plan-time-fitted Chebyshev/power polynomial (float32 plans
            only — more accurate than direct f32 eval and
            transcendental-free). 'auto' (default) picks 'horner' for
            float32 plans and 'direct' for float64. Mirrors the
            reference's KernelEvaluationMethod internal option
            (nufft_options.h:62-70, dispatched at
            nufft_plan.cc:1291-1307); internal-only, not serialized.
    """
    model_config = pydantic.ConfigDict(validate_assignment=True)

    debugging: DebuggingOptions = pydantic.Field(
        default_factory=DebuggingOptions)
    fftw: FftwOptions = pydantic.Field(default_factory=FftwOptions)
    max_batch_size: Optional[int] = None
    points_range: PointsRange = PointsRange.EXTENDED
    backend: str = "auto"
    upsampling_factor: Optional[float] = None
    show_warnings: bool = True
    verbosity: int = 0
    kernel_evaluation_method: str = "auto"

    @pydantic.field_validator("verbosity")
    @classmethod
    def _check_verbosity(cls, v):
        if v < 0:
            raise ValueError(f"verbosity must be >= 0, got {v}")
        return v

    @pydantic.field_validator("kernel_evaluation_method")
    @classmethod
    def _check_kernel_eval(cls, v):
        if v not in ("auto", "direct", "horner"):
            raise ValueError(
                f"kernel_evaluation_method must be one of 'auto', "
                f"'direct', 'horner', got {v!r}")
        return v

    @pydantic.field_validator("max_batch_size")
    @classmethod
    def _check_max_batch_size(cls, v):
        if v is not None and v < 1:
            raise ValueError(f"max_batch_size must be >= 1, got {v}")
        return v

    @pydantic.field_validator("backend")
    @classmethod
    def _check_backend(cls, v):
        if v not in ("auto", "xla", "pallas", "native"):
            raise ValueError(
                f"backend must be one of 'auto', 'xla', 'pallas', "
                f"'native', got {v!r}")
        return v

    @pydantic.field_validator("upsampling_factor")
    @classmethod
    def _check_upsampling(cls, v):
        if v is not None and v <= 1.0:
            raise ValueError(f"upsampling_factor must be > 1.0, got {v}")
        return v

    def to_proto(self):
        from tensorflow_nufft_tpu.proto import nufft_options_pb2
        pb = nufft_options_pb2.Options()
        pb.debugging.CopyFrom(self.debugging.to_proto())
        pb.fftw.CopyFrom(self.fftw.to_proto())
        if self.max_batch_size is not None:
            pb.max_batch_size = self.max_batch_size
        pb.points_range = int(self.points_range)
        # TPU extension fields: only set when non-default, so payloads
        # that use only reference options stay byte-identical.
        if self.backend != "auto":
            pb.backend = self.backend
        if self.upsampling_factor is not None:
            pb.upsampling_factor = self.upsampling_factor
        return pb

    @classmethod
    def from_proto(cls, pb) -> "Options":
        return cls(
            debugging=DebuggingOptions.from_proto(pb.debugging),
            fftw=FftwOptions.from_proto(pb.fftw),
            max_batch_size=pb.max_batch_size or None,
            points_range=PointsRange(int(pb.points_range)),
            backend=pb.backend or "auto",
            upsampling_factor=pb.upsampling_factor or None,
        )

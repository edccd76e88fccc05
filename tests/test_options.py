"""Options model: validation and proto round-trip
(models nufft_options_test.py:24-48)."""

import pydantic
import pytest

import tensorflow_nufft_tpu as tfft


def test_defaults():
    opts = tfft.Options()
    assert opts.max_batch_size is None
    assert opts.points_range == tfft.PointsRange.EXTENDED
    assert opts.fftw.planning_rigor == tfft.FftwPlanningRigor.AUTO
    assert opts.debugging.check_points_range is False


def test_proto_roundtrip():
    opts = tfft.Options(
        max_batch_size=4,
        points_range=tfft.PointsRange.INFINITE,
        fftw=tfft.FftwOptions(
            planning_rigor=tfft.FftwPlanningRigor.MEASURE),
        debugging=tfft.DebuggingOptions(check_points_range=True),
    )
    pb = opts.to_proto()
    restored = tfft.Options.from_proto(pb)
    assert restored.max_batch_size == 4
    assert restored.points_range == tfft.PointsRange.INFINITE
    assert restored.fftw.planning_rigor == tfft.FftwPlanningRigor.MEASURE
    assert restored.debugging.check_points_range is True


def test_proto_wire_compat():
    """Serialized bytes use the reference's field numbers."""
    opts = tfft.Options(points_range=tfft.PointsRange.EXTENDED)
    data = opts.to_proto().SerializeToString()
    from tensorflow_nufft_tpu.proto import nufft_options_pb2
    pb = nufft_options_pb2.Options()
    pb.ParseFromString(data)
    assert pb.points_range == 1


def test_validation():
    with pytest.raises(pydantic.ValidationError):
        tfft.Options(max_batch_size=0)
    with pytest.raises(pydantic.ValidationError):
        tfft.Options(backend="cuda")
    with pytest.raises(pydantic.ValidationError):
        tfft.Options(upsampling_factor=0.9)


def test_assignment_validation():
    opts = tfft.Options()
    with pytest.raises(pydantic.ValidationError):
        opts.max_batch_size = -1
    opts.max_batch_size = 8
    assert opts.max_batch_size == 8

"""Native C++ CPU engine: build, correctness vs oracle, fp64 precision."""

import numpy as np
import pytest

import tensorflow_nufft_tpu as tfft
from tensorflow_nufft_tpu import native
from tests.conftest import random_complex, random_points

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable")


def _relerr(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) or 1.0)


@pytest.mark.parametrize("grid_shape", [(16,), (12, 16), (8, 10, 12)])
@pytest.mark.parametrize("transform_type", ["type_1", "type_2"])
@pytest.mark.parametrize("fft_direction", ["forward", "backward"])
def test_native_vs_oracle(rng, grid_shape, transform_type,
                          fft_direction):
    rank = len(grid_shape)
    m = 30
    points = random_points(rng, (m, rank), np.float64)
    if transform_type == "type_1":
        src = random_complex(rng, (m,), np.complex128)
        gs = grid_shape
    else:
        src = random_complex(rng, grid_shape, np.complex128)
        gs = None
    got = native.nufft(src, points, grid_shape=gs,
                       transform_type=transform_type,
                       fft_direction=fft_direction, tol=1e-12)
    want = tfft.nudft(src, points.astype(np.float64),
                      grid_shape=gs, transform_type=transform_type,
                      fft_direction=fft_direction)
    assert _relerr(got, np.asarray(want)) < 1e-10


def test_native_high_precision_fp64(rng):
    """tol=1e-14 (reference's complex128 floor) actually achieved."""
    grid_shape = (32, 32)
    m = 50
    points = random_points(rng, (m, 2), np.float64)
    src = random_complex(rng, grid_shape, np.complex128)
    got = native.nufft(src, points, tol=1e-14)
    want = np.asarray(tfft.nudft(src, points))
    assert _relerr(got, want) < 1e-12


def test_native_f32(rng):
    grid_shape = (16, 16)
    m = 25
    points = random_points(rng, (m, 2), np.float32)
    src = random_complex(rng, grid_shape, np.complex64)
    got = native.nufft(src, points, tol=1e-6)
    want = np.asarray(tfft.nudft(src, points))
    assert _relerr(got, want) < 1e-3


def test_native_batched_matches_single(rng):
    grid_shape = (16, 16)
    b, m = 3, 25
    points = random_points(rng, (m, 2), np.float64)
    src = random_complex(rng, (b,) + grid_shape, np.complex128)
    got = native.nufft(src, points)
    for i in range(b):
        single = native.nufft(src[i], points)
        np.testing.assert_allclose(got[i], single, rtol=1e-12)


def test_native_interp_spread_match_jax(rng):
    grid_shape = (16, 16)
    m = 20
    points = random_points(rng, (m, 2), np.float32)
    grid = random_complex(rng, grid_shape, np.complex64)
    c = random_complex(rng, (m,), np.complex64)
    np.testing.assert_allclose(
        native.interp(grid, points),
        np.asarray(tfft.interp(grid, points)), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        native.spread(c, points, grid_shape),
        np.asarray(tfft.spread(c, points, grid_shape)),
        rtol=1e-4, atol=1e-4)


def test_native_spread_deterministic(rng):
    """Slab-parallel spreading is bit-deterministic across runs."""
    grid_shape = (64, 64)
    m = 5000
    points = random_points(rng, (m, 2), np.float64)
    c = random_complex(rng, (m,), np.complex128)
    first = native.spread(c, points, grid_shape)
    for _ in range(3):
        np.testing.assert_array_equal(
            first, native.spread(c, points, grid_shape))

"""Semantics of the standalone interp/spread ops.

Models the reference's semantics tests (nufft_ops_test.py:224-417):
constant-grid interpolation, unit-strength spreading, per-batch-element
identity, and the spread-only grid constraints.
"""

import numpy as np
import pytest

import tensorflow_nufft_tpu as tfft
from tests.conftest import random_complex, random_points


@pytest.mark.parametrize("grid_shape", [(32,), (16, 16), (16, 20, 24)])
def test_interp_constant(rng, grid_shape):
    """Interpolating a constant grid returns (approximately) the constant
    everywhere (reference: nufft_ops_test.py:224-252)."""
    rank = len(grid_shape)
    const = 3.0 - 2.0j
    grid = np.full(grid_shape, const, np.complex64)
    points = random_points(rng, (40, rank), np.float32)
    vals = np.asarray(tfft.interp(grid, points))
    np.testing.assert_allclose(vals, np.full(40, const), rtol=1e-3)


@pytest.mark.parametrize("grid_shape", [(32,), (16, 16)])
def test_spread_unit_mean(rng, grid_shape):
    """Spreading unit strengths conserves mass: mean of the grid is
    M / N (reference: nufft_ops_test.py:255-284)."""
    rank = len(grid_shape)
    m = 25
    points = random_points(rng, (m, rank), np.float32)
    ones = np.ones(m, np.complex64)
    grid = np.asarray(tfft.spread(ones, points, grid_shape))
    expected = m / np.prod(grid_shape)
    np.testing.assert_allclose(np.mean(grid.real), expected, rtol=1e-3)
    np.testing.assert_allclose(np.mean(grid.imag), 0.0, atol=1e-5)


def test_batch_elements_independent(rng):
    """Each batch element matches the corresponding single transform
    (reference: nufft_ops_test.py:287-348)."""
    grid_shape = (16, 16)
    b, m = 3, 15
    points = random_points(rng, (b, m, 2), np.float32)
    grids = random_complex(rng, (b,) + grid_shape, np.complex64)
    batched = np.asarray(tfft.interp(grids, points))
    for i in range(b):
        single = np.asarray(tfft.interp(grids[i], points[i]))
        np.testing.assert_allclose(batched[i], single, rtol=1e-5,
                                   atol=1e-5)

    strengths = random_complex(rng, (b, m), np.complex64)
    batched_s = np.asarray(tfft.spread(strengths, points, grid_shape))
    for i in range(b):
        single = np.asarray(tfft.spread(strengths[i], points[i],
                                        grid_shape))
        np.testing.assert_allclose(batched_s[i], single, rtol=1e-5,
                                   atol=1e-5)


def test_mixed_batch_ranks(rng):
    """Broadcasting between source and points batch dims
    (reference: nufft_ops_test.py:351-417)."""
    grid_shape = (16, 16)
    m = 9
    grids = random_complex(rng, (4, 1) + grid_shape, np.complex64)
    points = random_points(rng, (2, m, 2), np.float32)
    out = tfft.interp(grids, points)
    assert out.shape == (4, 2, m)
    for i in range(4):
        for j in range(2):
            single = np.asarray(tfft.interp(grids[i, 0], points[j]))
            np.testing.assert_allclose(np.asarray(out)[i, j], single,
                                       rtol=1e-5, atol=1e-5)


class TestSpreadOnlyConstraints:
    """Grid dims must be even, >= 2*width, 5-smooth
    (reference: nufft_plan.h:829-837)."""

    def test_odd_dim_rejected(self, rng):
        points = random_points(rng, (5, 2), np.float32)
        grid = random_complex(rng, (15, 16), np.complex64)
        with pytest.raises(ValueError, match="Invalid grid dimension"):
            tfft.interp(grid, points)

    def test_small_dim_rejected(self, rng):
        points = random_points(rng, (5, 2), np.float32)
        # width=7 at tol 1e-6 needs >= 14.
        grid = random_complex(rng, (8, 16), np.complex64)
        with pytest.raises(ValueError, match="Invalid grid dimension"):
            tfft.interp(grid, points)

    def test_non_smooth_rejected(self, rng):
        points = random_points(rng, (5, 2), np.float32)
        grid = random_complex(rng, (34, 16), np.complex64)  # 34 = 2*17
        with pytest.raises(ValueError, match="Invalid grid dimension"):
            tfft.interp(grid, points)

    def test_loose_tol_allows_smaller(self, rng):
        points = random_points(rng, (5, 2), np.float32)
        grid = random_complex(rng, (8, 8), np.complex64)
        # width=4 at tol 1e-3 -> 8 >= 2*4 is allowed.
        vals = tfft.interp(grid, points, tol=1e-3)
        assert vals.shape == (5,)

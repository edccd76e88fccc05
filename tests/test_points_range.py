"""Points-range folding semantics and the debug range check.

Models the reference's periodicity/options tests
(nufft_ops_test.py:506-620): shifting points by +-2*pi (EXTENDED) or
+-10*pi (INFINITE) leaves results unchanged; check_points_range raises on
out-of-range points.
"""

import jax
import numpy as np
import pytest

import tensorflow_nufft_tpu as tfft
from tests.conftest import random_complex, random_points


def _run(points, options):
    rng = np.random.default_rng(7)
    grid_shape = (8, 8)
    source = (rng.standard_normal(grid_shape)
              + 1j * rng.standard_normal(grid_shape)).astype(np.complex64)
    return np.asarray(tfft.nufft(source, points, options=options))


def test_extended_periodicity(rng):
    base = random_points(rng, (12, 2), np.float32,
                         low=-np.pi * 0.99, high=np.pi * 0.99)
    opts = tfft.Options(points_range=tfft.PointsRange.EXTENDED)
    ref = _run(base, opts)
    shift = (2 * np.pi * np.sign(-base)).astype(np.float32)
    shifted = base + shift      # now in [-3pi, 3pi]
    np.testing.assert_allclose(_run(shifted.astype(np.float32), opts), ref,
                               rtol=1e-3, atol=1e-3)


def test_infinite_periodicity(rng):
    base = random_points(rng, (12, 2), np.float32,
                         low=-np.pi * 0.99, high=np.pi * 0.99)
    opts = tfft.Options(points_range=tfft.PointsRange.INFINITE)
    ref = _run(base, opts)
    for mult in (2, -2, 10, -10):
        shifted = (base + mult * np.pi * np.ones_like(base)).astype(
            np.float64).astype(np.float32)
        np.testing.assert_allclose(_run(shifted, opts), ref,
                                   rtol=2e-3, atol=2e-3)


def test_strict_equals_extended_in_range(rng):
    base = random_points(rng, (12, 2), np.float32,
                         low=-np.pi * 0.99, high=np.pi * 0.99)
    a = _run(base, tfft.Options(points_range=tfft.PointsRange.STRICT))
    b = _run(base, tfft.Options(points_range=tfft.PointsRange.EXTENDED))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


class TestCheckPointsRange:
    def _opts(self, pr):
        return tfft.Options(
            points_range=pr,
            debugging=tfft.DebuggingOptions(check_points_range=True))

    def test_raises_eager(self, rng):
        points = np.full((5, 2), 2 * np.pi, np.float32)  # outside STRICT
        with pytest.raises(ValueError, match="supported range"):
            _run(points, self._opts(tfft.PointsRange.STRICT))

    def test_extended_bound(self, rng):
        points = np.full((5, 2), 4 * np.pi, np.float32)
        with pytest.raises(ValueError, match="supported range"):
            _run(points, self._opts(tfft.PointsRange.EXTENDED))

    def test_infinite_never_raises(self, rng):
        points = np.full((5, 2), 100.0, np.float32)
        out = _run(points, self._opts(tfft.PointsRange.INFINITE))
        assert np.all(np.isfinite(out))

    def test_in_range_passes(self, rng):
        points = random_points(rng, (5, 2), np.float32)
        out = _run(points, self._opts(tfft.PointsRange.STRICT))
        assert np.all(np.isfinite(out))

    def test_jit_poisons_with_nan(self, rng):
        grid = random_complex(rng, (8, 8), np.complex64)
        opts = self._opts(tfft.PointsRange.STRICT)
        fn = jax.jit(lambda s, p: tfft.nufft(s, p, options=opts))
        bad = np.full((5, 2), 2 * np.pi, np.float32)
        assert not np.any(np.isfinite(np.asarray(fn(grid, bad))))
        good = random_points(rng, (5, 2), np.float32)
        assert np.all(np.isfinite(np.asarray(fn(grid, good))))


def test_infinite_fold_keeps_compensated_precision(rng):
    """Far-out-of-range points must keep two-float coordinate precision
    through the INFINITE wrap (the q*n_f product and the subtraction both
    round when n_f is 5-smooth; their residuals feed the low word)."""
    from tensorflow_nufft_tpu.kernels.xla_ops import (
        INFINITE, fold_and_rescale_split)
    nf = (540,)  # 5-smooth, not a power of two
    x = rng.uniform(40.0, 90.0, (4096, 1)).astype(np.float32)
    x = np.concatenate([x, -x]).astype(np.float32)
    s_hi, s_lo = fold_and_rescale_split(jax.numpy.asarray(x), nf, INFINITE)
    got = np.asarray(s_hi, np.float64) + np.asarray(s_lo, np.float64)
    x64 = x.astype(np.float64)
    expected = np.mod(x64 + np.pi, 2 * np.pi) * (nf[0] / (2 * np.pi))
    err = np.abs(got - expected)
    # wrap ambiguity at the seam: values within one ulp of nf may fold to
    # 0 or nf; compare modulo nf.
    err = np.minimum(err, np.abs(err - nf[0]))
    # single-float folding would err by ~|x*c|*2^-24 ~ 5e-4 grid units
    assert np.max(err) < 1e-6, np.max(err)

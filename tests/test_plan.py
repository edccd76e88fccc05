"""Plan math: smooth sizing, tolerance-driven parameters, Fourier series."""

import math

import numpy as np
import pytest

from tensorflow_nufft_tpu.plan.plan import (
    EPSILON,
    MAX_KERNEL_WIDTH,
    NufftPlan,
    PlanSpec,
    calculate_scale_factor,
    es_kernel_np,
    kernel_beta,
    kernel_fseries_1d,
    make_plan,
    select_kernel_width,
    select_upsampling_factor,
)
from tensorflow_nufft_tpu.utils.smooth import next_smooth_integer


class TestSmoothInteger:
    def test_basic(self):
        # Even, 5-smooth outputs (reference semantics:
        # cc/kernels/nufft_plan.h:628-649).
        assert next_smooth_integer(1) == 2
        assert next_smooth_integer(2) == 2
        assert next_smooth_integer(3) == 4
        assert next_smooth_integer(7) == 8
        assert next_smooth_integer(11) == 12
        assert next_smooth_integer(13) == 16
        assert next_smooth_integer(17) == 18
        assert next_smooth_integer(257) == 270
        assert next_smooth_integer(511) == 512

    def test_result_is_smooth_even(self):
        for n in range(1, 2000, 37):
            p = next_smooth_integer(n)
            assert p >= n and p % 2 == 0
            q = p
            for f in (2, 3, 5):
                while q % f == 0:
                    q //= f
            assert q == 1

    def test_multiple_of(self):
        p = next_smooth_integer(100, multiple_of=8)
        assert p % 8 == 0 and p >= 100

    def test_bad_multiple(self):
        with pytest.raises(ValueError):
            next_smooth_integer(10, multiple_of=7)


class TestKernelSelection:
    def test_width_sigma2(self):
        # width = ceil(-log10(tol/10)) (reference: nufft_plan.h:762-777).
        assert select_kernel_width(1e-6, 2.0) == 7
        assert select_kernel_width(1e-3, 2.0) == 4
        assert select_kernel_width(1e-1, 2.0) == 2
        assert select_kernel_width(1e-14, 2.0) == 15
        assert select_kernel_width(1e-15, 2.0) == MAX_KERNEL_WIDTH

    def test_width_sigma125(self):
        w = select_kernel_width(1e-6, 1.25)
        expected = math.ceil(
            -math.log(1e-6) / (math.pi * math.sqrt(1 - 1 / 1.25)))
        assert w == expected

    def test_sigma_defaults(self):
        assert select_upsampling_factor(1e-6, 2, 256 * 256) == 2.0
        # Large low-precision 2D grid switches to 1.25.
        assert select_upsampling_factor(1e-6, 2, 1024 * 1024) == 1.25
        # But not for high precision.
        assert select_upsampling_factor(1e-10, 2, 1024 * 1024) == 2.0
        with pytest.raises(ValueError):
            select_upsampling_factor(1e-6, 2, 100, user_value=0.5)

    def test_beta(self):
        # beta/width: 2.20/2.26/2.38 for widths 2/3/4, else 2.30
        # (reference: nufft_plan.cc:933-940).
        assert kernel_beta(2, 2.0) == pytest.approx(2.20 * 2)
        assert kernel_beta(3, 2.0) == pytest.approx(2.26 * 3)
        assert kernel_beta(4, 2.0) == pytest.approx(2.38 * 4)
        assert kernel_beta(7, 2.0) == pytest.approx(2.30 * 7)
        gamma = 0.97
        assert kernel_beta(5, 1.25) == pytest.approx(
            gamma * math.pi * (1 - 1 / 2.5) * 5)


class TestFseries:
    @pytest.mark.parametrize("fine_dim,width", [(16, 4), (32, 7), (50, 7),
                                                (96, 11)])
    def test_matches_direct_quadrature(self, fine_dim, width):
        """fseries[j] == (-1)^j * FT of the kernel at integer frequency j."""
        beta = kernel_beta(width, 2.0)
        c = 4.0 / width ** 2
        fs = kernel_fseries_1d(fine_dim, width, beta)
        assert fs.shape == (fine_dim // 2 + 1,)
        # Direct dense quadrature of 2*int_0^{w/2} phi(z) cos(2 pi j z / nf).
        z = np.linspace(0, width / 2, 400001)
        phi = es_kernel_np(z, beta, c, width / 2)
        for j in [0, 1, fine_dim // 4, fine_dim // 2]:
            integrand = 2 * phi * np.cos(2 * np.pi * j * z / fine_dim)
            direct = np.trapezoid(integrand, z) * (-1.0) ** j
            # Trapezoid accuracy is limited by the sqrt edge singularity
            # of the kernel derivative; quadrature itself is much better.
            assert fs[j] == pytest.approx(direct, rel=1e-6, abs=1e-8)

    def test_positive_at_zero(self):
        fs = kernel_fseries_1d(32, 7, kernel_beta(7, 2.0))
        assert fs[0] > 0


class TestMakePlan:
    def _spec(self, **kw):
        base = dict(transform_type="type_1", fft_direction="forward",
                    rank=2, grid_shape=(6, 8), dtype_name="complex64",
                    tol=1e-6, points_range=1)
        base.update(kw)
        return PlanSpec(**base)

    def test_basic_plan(self):
        plan = make_plan(self._spec())
        assert plan.width == 7
        assert plan.sigma == 2.0
        # fine = max(sigma*N, 2w) rounded to even 5-smooth:
        # 6*2=12 < 14 -> 14 -> 16; 8*2=16 >= 14 -> 16.
        assert plan.fine_shape == (16, 16)
        assert len(plan.fseries) == 2
        assert plan.fseries[0].shape == (9,)

    def test_tol_clamped(self):
        plan = make_plan(self._spec(tol=1e-30))
        assert plan.tol == EPSILON[np.dtype(np.float32)]

    def test_plan_cached(self):
        assert make_plan(self._spec()) is make_plan(self._spec())

    def test_spread_only_constraints(self):
        # Valid: even, 5-smooth, >= 2*width.
        plan = make_plan(self._spec(grid_shape=(16, 16), spread_only=True))
        assert plan.fine_shape == (16, 16)
        assert plan.kernel_scale != 1.0
        # Invalid: odd.
        with pytest.raises(ValueError, match="Invalid grid dimension"):
            make_plan(self._spec(grid_shape=(15, 16), spread_only=True))
        # Invalid: too small for the kernel.
        with pytest.raises(ValueError, match="Invalid grid dimension"):
            make_plan(self._spec(grid_shape=(8, 16), spread_only=True))

    def test_invalid_args(self):
        with pytest.raises(ValueError, match="rank"):
            make_plan(self._spec(rank=4, grid_shape=(2, 2, 2, 2)))
        with pytest.raises(ValueError, match="transform_type"):
            make_plan(self._spec(transform_type="type_3"))
        with pytest.raises(ValueError, match="fft_direction"):
            make_plan(self._spec(fft_direction="sideways"))

    def test_deconv_weights(self):
        plan = make_plan(self._spec())
        w = plan.deconv_weights(0)
        assert w.shape == (6,)
        # Centered order: |k| symmetric around index N//2.
        assert w[3] == pytest.approx(1.0 / plan.fseries[0][0])
        assert w[2] == w[4]


class TestScaleFactor:
    def test_rank_scaling(self):
        beta = kernel_beta(7, 2.0)
        s1 = calculate_scale_factor(1, 7, beta)
        s2 = calculate_scale_factor(2, 7, beta)
        s3 = calculate_scale_factor(3, 7, beta)
        assert s2 == pytest.approx(s1 ** 2, rel=1e-12)
        assert s3 == pytest.approx(s1 ** 3, rel=1e-12)

    def test_value_close_to_kernel_integral(self):
        # 1/scale ~ integral of the kernel over its support.
        width, beta = 7, kernel_beta(7, 2.0)
        s1 = calculate_scale_factor(1, width, beta)
        z = np.linspace(-width / 2, width / 2, 40001)
        integral = np.trapezoid(
            es_kernel_np(z, beta, 4 / width ** 2, width / 2), z)
        assert 1.0 / s1 == pytest.approx(integral, rel=1e-2)


def test_fine_grid_size_includes_batch():
    """The allocation guard must include the inner batch (the reference
    checks fine_size * batch_size, nufft_plan.h:843-848)."""
    from tensorflow_nufft_tpu.plan.plan import (
        PlanSpec, check_fine_grid_size, make_plan)
    spec = PlanSpec(transform_type="type_1", fft_direction="forward",
                    rank=3, grid_shape=(512, 512, 512),
                    dtype_name="complex64", tol=1e-6, points_range=0,
                    spread_only=False, upsampling_factor=2.0,
                    backend="auto")
    plan = make_plan(spec)
    check_fine_grid_size(plan, 1)   # fine for a single transform
    import pytest as _pytest
    with _pytest.raises(ValueError, match="too big"):
        check_fine_grid_size(plan, 64)


def test_horner_fit_accuracy():
    """Fitted Horner polynomial matches the f64 kernel to ~3e-8
    rel-to-peak for every width the f32 path serves."""
    from tensorflow_nufft_tpu.plan.plan import (
        es_kernel_np, fit_horner_coeffs, kernel_beta)
    for width, tol in ((3, 1e-2), (5, 1e-4), (7, 1e-6), (8, 1e-7)):
        beta = kernel_beta(width, 2.0)
        coeffs = fit_horner_coeffs(width, beta, tol)
        hw = width / 2.0
        # open interval: the kernel jumps to 0 at |z| = hw, so the
        # endpoint itself is measure-zero and excluded from the fit.
        z = np.linspace(-hw, hw, 8001)[1:-1]
        t = 2.0 * (z / hw) ** 2 - 1.0
        got = np.polyval(np.asarray(coeffs)[::-1], t)
        ref = es_kernel_np(z, beta, 4.0 / width**2, hw)
        err = np.max(np.abs(got - ref)) / ref.max()
        assert err < max(tol / 20, 5e-8), (width, err)


def test_es_kernel_horner_matches_direct():
    """Device Horner evaluation agrees with direct exp/sqrt eval and is
    exactly zero outside the support (incl. far-out sentinel values)."""
    import jax.numpy as jnp
    from tensorflow_nufft_tpu.kernels.xla_ops import (
        es_kernel, es_kernel_horner)
    from tensorflow_nufft_tpu.plan.plan import PlanSpec, make_plan
    plan = make_plan(PlanSpec("type_1", "forward", 1, (64,),
                              "complex64", 1e-6, 0))
    z = jnp.asarray(
        np.concatenate([np.linspace(-4.0, 4.0, 1001), [-1e6, 1e6]]),
        jnp.float32)
    h = np.asarray(es_kernel_horner(z, plan.horner, plan.half_width))
    d = np.asarray(es_kernel(z, plan.beta, plan.c, plan.half_width))
    assert h[-1] == 0.0 and h[-2] == 0.0
    np.testing.assert_allclose(h, d, atol=2e-6 * d.max())

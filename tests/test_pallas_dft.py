"""kernels/pallas_dft.py vs the XLA pair-contraction oracle."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorflow_nufft_tpu.kernels import binning, pallas_dft
from tensorflow_nufft_tpu.fft.planar_fft import (
    dft_truncate_deconvolve_tiled,
    dft_truncate_deconvolve_tiled_xla,
)
from tensorflow_nufft_tpu.options import Options
from tensorflow_nufft_tpu.plan.plan import PlanSpec, make_plan


def _plan_geom(grid_shape, m, tol=1e-5, direction="forward"):
    spec = PlanSpec(
        transform_type="type_1", fft_direction=direction, rank=3,
        grid_shape=tuple(grid_shape), dtype_name="complex64",
        tol=tol, points_range=int(Options().points_range),
        spread_only=False, upsampling_factor=2.0, backend="auto",
        kernel_evaluation_method="auto")
    plan = make_plan(spec)
    geom = binning.choose_geometry(plan.fine_shape, plan.width, m,
                                   banded=True)
    return plan, geom


@pytest.mark.parametrize("batch", [1, 2])
@pytest.mark.parametrize("direction", ["forward", "backward"])
@pytest.mark.parametrize("grid", [(16, 16, 16), (16, 16, 128)])
def test_pallas_dft_matches_xla(batch, direction, grid):
    # (16,16,16): n2 unaligned -> per-sublane blk1 loop fallback (the
    # Mosaic reshape-legality fix for the 3d_t3 inner transform);
    # (16,16,128): lane-aligned n2 -> merged-lane fast path.
    plan, geom = _plan_geom(grid, 4000, direction=direction)
    assert pallas_dft.supported(geom, plan.grid_shape), (
        f"geometry unexpectedly unsupported: tile={geom.tile} "
        f"ext={geom.ext}")
    rng = np.random.default_rng(0)
    shape = geom.tiles + (2 * batch,) + geom.ext
    tiles = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    got = jax.jit(
        lambda t: pallas_dft.dft_truncate_deconvolve_tiled_pallas(
            t, plan, geom, batch))(tiles)
    want = jax.jit(
        lambda t: dft_truncate_deconvolve_tiled_xla(
            t, plan, geom, batch))(tiles)
    assert got.shape == want.shape == (batch,) + plan.grid_shape + (2,)
    err = np.max(np.abs(np.asarray(got) - np.asarray(want)))
    assert err <= 1e-4 * np.max(np.abs(np.asarray(want))), err


def test_dispatch_serves_pallas_when_supported():
    plan, geom = _plan_geom((16, 16, 16), 4000)
    rng = np.random.default_rng(1)
    shape = geom.tiles + (2,) + geom.ext
    tiles = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    via_dispatch = jax.jit(
        lambda t: dft_truncate_deconvolve_tiled(t, plan, geom, 1))(tiles)
    direct = jax.jit(
        lambda t: pallas_dft.dft_truncate_deconvolve_tiled_pallas(
            t, plan, geom, 1))(tiles)
    np.testing.assert_array_equal(np.asarray(via_dispatch),
                                  np.asarray(direct))


@pytest.mark.parametrize("batch", [1, 2])
@pytest.mark.parametrize("direction", ["forward", "backward"])
@pytest.mark.parametrize("grid", [(16, 16, 16), (16, 16, 128)])
def test_pallas_amplify_matches_xla(batch, direction, grid):
    from tensorflow_nufft_tpu.fft.planar_fft import (
        amplify_pad_dft_tiled_xla)
    plan, geom = _plan_geom(grid, 4000, direction=direction)
    rng = np.random.default_rng(3)
    modes = jnp.asarray(rng.standard_normal(
        (batch,) + plan.grid_shape + (2,)).astype(np.float32))
    got = jax.jit(
        lambda m: pallas_dft.amplify_pad_dft_tiled_pallas(
            m, plan, geom))(modes)
    want = jax.jit(
        lambda m: amplify_pad_dft_tiled_xla(m, plan, geom))(modes)
    assert got.shape == want.shape == \
        geom.tiles + (2 * batch,) + geom.ext
    err = np.max(np.abs(np.asarray(got) - np.asarray(want)))
    assert err <= 1e-4 * np.max(np.abs(np.asarray(want))), err


def test_unsupported_geometry_falls_back():
    # An odd middle grid dim (n1 % 8 != 0) is outside the Pallas gate.
    plan, geom = _plan_geom((16, 12, 16), 3000)
    assert not pallas_dft.supported(
        geom, (16, 12, 16)) or plan.grid_shape[1] % 8 == 0
    rng = np.random.default_rng(2)
    shape = geom.tiles + (2,) + geom.ext
    tiles = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    out = jax.jit(
        lambda t: dft_truncate_deconvolve_tiled(t, plan, geom, 1))(tiles)
    assert out.shape == (1,) + plan.grid_shape + (2,)


def test_spread_dft_fused_matches_staged(monkeypatch):
    """The fused axis-2 epilogue must reproduce spread + staged DFT."""
    from tensorflow_nufft_tpu import planar
    from tensorflow_nufft_tpu.fft.planar_fft import (
        dft_truncate_deconvolve_tiled)
    from tensorflow_nufft_tpu.kernels import pallas_spread
    from tensorflow_nufft_tpu.kernels.pallas_dft import spread_dft_fused
    from tensorflow_nufft_tpu.options import Options
    monkeypatch.setattr(pallas_spread, "MATS_BYTES_BUDGET", 0)
    rng = np.random.default_rng(5)
    grid, m, batch = (24, 16, 16), 3000, 2
    pts = rng.uniform(-np.pi, np.pi, (m, 3)).astype(np.float32)
    op = planar.PlannedNufft(pts, grid, transform_type="type_1",
                             tol=1e-6, options=Options(backend="pallas"))
    assert op._level == "binned" and op.band_info is not None
    src_cm = jnp.asarray(
        rng.standard_normal((2 * batch, m)).astype(np.float32))
    fused = jax.jit(lambda s: spread_dft_fused(
        s, op.points_resc, op.plan, op.geom, batch, binned=op.binned,
        coords=op.coords, band_info=op.band_info))(src_cm)
    tiles, _ = pallas_spread.spread_pallas_tiles(
        src_cm, op.points_resc, op.plan, binned=op.binned,
        coords=op.coords, geom=op.geom, band_info=op.band_info)
    staged = jax.jit(lambda t: dft_truncate_deconvolve_tiled(
        t, op.plan, op.geom, batch))(tiles)
    err = np.max(np.abs(np.asarray(fused) - np.asarray(staged)))
    assert err <= 1e-4 * np.max(np.abs(np.asarray(staged))), err

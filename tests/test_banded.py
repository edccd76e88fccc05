"""Rank-3 banded planned kernels (axis-0 banding) vs oracle/unplanned.

The banded path needs level='binned' (z-ordered binning + band
origins), which small test grids would not select on their own — the
mats payload budget is zeroed to force it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tensorflow_nufft_tpu as tfft
from tensorflow_nufft_tpu import planar
from tensorflow_nufft_tpu.kernels import binning, pallas_spread
from tensorflow_nufft_tpu.options import Options


@pytest.fixture
def force_binned(monkeypatch):
    monkeypatch.setattr(pallas_spread, "MATS_BYTES_BUDGET", 0)


def _mk(m, rng, clustered=False):
    if clustered:
        # Nonuniform along axis 0: two tight slabs (tiny per-sub-chunk
        # spans at very different origins) — exercises varying band
        # origins without degenerating the band to the full extent.
        x0 = np.concatenate([
            rng.normal(0.0, 0.05, (m // 2,)),
            rng.normal(2.0, 0.05, (m - m // 2,))])
        pts = np.stack(
            [x0] + [rng.uniform(-np.pi, np.pi, (m,)) for _ in range(2)],
            axis=-1).astype(np.float32)
        rng.shuffle(pts, axis=0)
    else:
        pts = rng.uniform(-np.pi, np.pi, (m, 3)).astype(np.float32)
    z = (rng.standard_normal(m)
         + 1j * rng.standard_normal(m)).astype(np.complex64)
    return pts, z


@pytest.mark.parametrize("transform_type", ["type_1", "type_2"])
@pytest.mark.parametrize("clustered", [False, True])
def test_banded_planned_vs_oracle(force_binned, transform_type,
                                  clustered):
    rng = np.random.default_rng(11)
    grid = (24, 16, 16)
    m = 4000
    pts, z = _mk(m, rng, clustered)
    opts = Options(backend="pallas")
    op = planar.PlannedNufft(pts, grid, transform_type=transform_type,
                             tol=1e-6, options=opts)
    assert op._level == "binned"
    assert op.band_info is not None, (
        "banded path not active (band degenerated to full ext)")
    band, zorigins = op.band_info
    assert band % 4 == 0 and band <= op.geom.ext[0]

    if transform_type == "type_1":
        src = planar.to_planar(z)[None]
    else:
        img = (rng.standard_normal(grid)
               + 1j * rng.standard_normal(grid)).astype(np.complex64)
        src = planar.to_planar(img)[None]
    out = np.asarray(op(src))[0]
    got = out[..., 0] + 1j * out[..., 1]

    oracle_in = (planar.to_planar(z) if transform_type == "type_1"
                 else src[0])
    kwargs = ({"grid_shape": grid} if transform_type == "type_1"
              else {})
    oracle = np.asarray(planar.nudft(
        oracle_in, pts, transform_type=transform_type, **kwargs))
    oc = oracle[..., 0] + 1j * oracle[..., 1]
    err = np.max(np.abs(got - oc)) / np.max(np.abs(oc))
    assert err < 1e-3, f"banded {transform_type} err {err:.2e}"


def test_banded_matches_unbanded(force_binned):
    """Banded and unbanded kernels compute the same spread (to f32
    contraction-order differences)."""
    rng = np.random.default_rng(5)
    grid = (24, 16, 16)
    m = 3000
    pts, z = _mk(m, rng)
    opts = Options(backend="pallas")
    op = planar.PlannedNufft(pts, grid, transform_type="type_1",
                             tol=1e-6, options=opts)
    assert op.band_info is not None
    src = planar.to_planar(z)[None]
    out_banded = np.asarray(op(src))
    op.band_info = None                      # same plan, unbanded kernels
    out_unbanded = np.asarray(op(src))
    scale = np.max(np.abs(out_unbanded))
    assert np.max(np.abs(out_banded - out_unbanded)) / scale < 1e-6


def test_banded_normal_matches_composed(force_binned):
    rng = np.random.default_rng(7)
    grid = (16, 16, 16)
    m = 2500
    pts, z = _mk(m, rng)
    opts = Options(backend="pallas")
    t2 = planar.PlannedNufft(pts, grid, transform_type="type_2",
                             tol=1e-6, options=opts)
    assert t2.band_info is not None
    img = (rng.standard_normal(grid)
           + 1j * rng.standard_normal(grid)).astype(np.complex64)
    src = planar.to_planar(img)[None]
    w = rng.uniform(0.5, 1.5, (m,)).astype(np.float32)

    fused = np.asarray(t2.normal(src, t2.slot_weights(w)))
    vals = t2(src)
    vals = vals * jnp.asarray(w)[None, :, None]
    composed = np.asarray(t2.adjoint()(vals))
    scale = np.max(np.abs(composed))
    assert np.max(np.abs(fused - composed)) / scale < 2e-5


def test_banded_grad(force_binned):
    rng = np.random.default_rng(9)
    grid = (16, 16, 16)
    m = 2000
    pts, z = _mk(m, rng)
    opts = Options(backend="pallas")
    op = planar.PlannedNufft(pts, grid, transform_type="type_1",
                             tol=1e-6, options=opts)
    assert op.band_info is not None
    src = planar.to_planar(z)[None]

    def loss(x):
        return jnp.sum(op(x) ** 2)

    g_banded = np.asarray(jax.grad(loss)(jnp.asarray(src)))
    op.band_info = None                  # same plan, unbanded kernels
    g_unbanded = np.asarray(jax.grad(loss)(jnp.asarray(src)))
    assert np.all(np.isfinite(g_banded))
    scale = np.max(np.abs(g_unbanded))
    assert np.max(np.abs(g_banded - g_unbanded)) / scale < 1e-6


def test_zorder_binning_roundtrip(force_binned):
    """z-ordered binning is a valid permutation: scatter back through
    padpos recovers the points, and within-tile slots are cell-sorted."""
    rng = np.random.default_rng(13)
    grid = (24, 16, 16)
    m = 3000
    pts, _ = _mk(m, rng)
    from tensorflow_nufft_tpu.kernels.xla_ops import (
        fold_and_rescale_split)
    from tensorflow_nufft_tpu.plan.plan import make_plan, PlanSpec
    spec = PlanSpec(transform_type="type_1", fft_direction="forward",
                    rank=3, grid_shape=grid, dtype_name="complex64",
                    tol=1e-6, points_range=1, spread_only=False,
                    upsampling_factor=0.0, backend="pallas",
                    kernel_evaluation_method="auto")
    plan = make_plan(spec)
    pr = fold_and_rescale_split(jnp.asarray(pts), plan.fine_shape, 1)
    geom = binning.choose_geometry(plan.fine_shape, plan.width, m,
                                   banded=True)
    binned = binning.bin_points(pr, geom, zorder=True)
    padpos = np.asarray(binned.padpos)
    assert len(np.unique(padpos)) == m           # a real permutation
    invpos = np.asarray(binned.invpos)
    assert np.all(invpos[padpos] == np.arange(m))
    # Within each tile's slot run, axis-0 cells are non-decreasing.
    cell = binning.sort_cell_size(geom)
    z = np.asarray(binned.points_hi[:, 0])
    tb = np.asarray(binned.tile_bounds)
    zs = np.concatenate([z, [np.nan]])[invpos]
    for t in range(geom.num_tiles):
        lo, hi = tb[t] * geom.chunk, tb[t + 1] * geom.chunk
        run = zs[lo:hi]
        run = run[np.isfinite(run)]
        cells = (run // cell).astype(int)
        assert np.all(np.diff(cells) >= 0), f"tile {t} not cell-sorted"
    band, zo = binning.compute_band_origins(
        binned, geom, plan.half_width, pallas_spread.RANK3_SUB)
    assert zo.shape[0] == geom.num_chunks * max(
        geom.chunk // min(pallas_spread.RANK3_SUB, geom.chunk), 1)
    assert np.all(zo >= 0) and np.all(zo + band <= geom.ext[0])


def test_banded_degeneration_replans(force_binned):
    """Sparse uniform points make every sub-chunk span its tile's full
    axis-0 range, so the band degenerates to E0. A coarse banded
    geometry only fits VMEM through the band — the plan must re-plan on
    the unbanded-prefs geometry (or fall back to unplanned), never
    defer a ValueError to apply time."""
    from tensorflow_nufft_tpu.kernels import binning, pallas_spread
    rng = np.random.default_rng(3)
    m, grid = 2000, (128, 128, 128)
    pts = rng.uniform(-np.pi, np.pi, (m, 3)).astype(np.float32)
    opts = Options(backend="pallas")

    op = planar.PlannedNufft(pts, grid, transform_type="type_1",
                             options=opts)
    assert op._planned
    band = op.band_info[0] if op.band_info else None
    assert pallas_spread.streaming_group_size(op.geom, band) > 0

    # With the coarse tile forced, no viable fallback exists: the plan
    # must drop to the unplanned pipeline instead of raising later.
    binning.set_geometry_overrides(tile=(128, 16, 64))
    try:
        op2 = planar.PlannedNufft(pts, grid, transform_type="type_1",
                                  options=opts)
        assert not op2._planned
    finally:
        binning.set_geometry_overrides()


def test_batch_build_matches_serial(force_binned):
    """PlannedNufft.batch_build (one vmapped prep for all shards — the
    ShardedPlannedNufft constructor path) produces bitwise-identical
    artifacts and applies to S sequential constructions."""
    rng = np.random.default_rng(21)
    s_count, m, grid = 3, 1000, (24, 16, 16)
    pts = rng.uniform(-np.pi, np.pi,
                      (s_count, m, 3)).astype(np.float32)
    opts = Options(backend="pallas")
    batch = planar.PlannedNufft.batch_build(
        pts, grid, transform_type="type_1", tol=1e-6, options=opts)
    for i, b in enumerate(batch):
        s = planar.PlannedNufft(pts[i], grid, transform_type="type_1",
                                tol=1e-6, options=opts)
        assert b._level == s._level == "binned"
        np.testing.assert_array_equal(np.asarray(b.binned.invpos),
                                      np.asarray(s.binned.invpos))
        np.testing.assert_array_equal(np.asarray(b.coords),
                                      np.asarray(s.coords))
        assert (b.band_info is None) == (s.band_info is None)
        if b.band_info is not None:
            assert b.band_info[0] == s.band_info[0]
            np.testing.assert_array_equal(
                np.asarray(b.band_info[1]), np.asarray(s.band_info[1]))
        z = (rng.standard_normal(m)
             + 1j * rng.standard_normal(m)).astype(np.complex64)
        src = planar.to_planar(z)[None]
        np.testing.assert_array_equal(np.asarray(b(src)),
                                      np.asarray(s(src)))

"""Pallas kernel path (interpret mode on CPU): binning invariants and
spread/interp correctness vs the XLA path, ranks 1-3, adversarial point
distributions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tensorflow_nufft_tpu as tfft
from tensorflow_nufft_tpu.kernels import binning
from tensorflow_nufft_tpu.planar import to_planar
from tests.conftest import random_complex, random_points


def _relerr(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) or 1.0)


def _adversarial_points(rng, m, rank):
    """Uniform + clustered + edge + duplicate points."""
    parts = [
        rng.uniform(-np.pi, np.pi, (m // 2, rank)),
        rng.normal(0, 0.05, (m // 4, rank)),                # hot tile
        np.full((m // 8, rank), np.pi * 0.9999),            # edge/wrap
    ]
    rest = m - sum(p.shape[0] for p in parts)
    dup = rng.uniform(-np.pi, np.pi, (1, rank))
    parts.append(np.tile(dup, (rest, 1)))                   # duplicates
    pts = np.concatenate(parts).astype(np.float32)
    return np.clip(pts, -np.pi, np.pi)


class TestBinning:
    def test_geometry_divides(self):
        for fs, w in [((512, 512), 7), ((128,), 5), ((64, 64, 64), 7),
                      ((250,), 9), ((96, 160), 4)]:
            g = binning.choose_geometry(fs, w, 10000)
            for nf, t in zip(g.fine_shape, g.tile):
                assert nf % t == 0
                assert t >= 2 * g.pad
            # pad covers the footprint, rounded up to sublane alignment
            assert g.pad >= w // 2 + 1 and g.pad % 4 == 0

    @pytest.mark.parametrize("rank", [1, 2, 3])
    def test_every_point_has_slot(self, rng, rank):
        m = 500
        fine = {1: (256,), 2: (64, 64), 3: (32, 32, 32)}[rank]
        pts = rng.uniform(0, np.array(fine) - 1e-3,
                          (m, rank)).astype(np.float32)
        geom = binning.choose_geometry(fine, 5, m, chunk=64)
        b = binning.bin_points(jnp.asarray(pts), geom)
        padpos = np.asarray(b.padpos)
        assert len(np.unique(padpos)) == m          # injective
        assert padpos.max() < geom.num_chunks * geom.chunk
        # Each point's chunk belongs to the point's own tile.
        chunk_of = padpos // geom.chunk
        for d in range(rank):
            td = (pts[:, d] // geom.tile[d]).astype(int)
            np.testing.assert_array_equal(
                np.asarray(b.chunk_tidx[d])[chunk_of], td)

    def test_overlap_add_roundtrip(self, rng):
        """extend_tiles then overlap_add == multiply by overlap counts...
        verified instead via: overlap_add(extend(x)) sums each element
        once per window covering it; with zeroed halos it's identity."""
        geom = binning.choose_geometry((64, 64), 7, 100)
        x = jnp.asarray(rng.standard_normal((2, 64, 64)).astype(
            np.float32))
        ext = binning.extend_tiles(x, geom)
        # Zero out the halo bands, keep cores; overlap_add must return x.
        pad = geom.pad
        core_only = jnp.zeros_like(ext)
        core_only = core_only.at[
            ..., pad:pad + geom.tile[0], pad:pad + geom.tile[1]].set(
            ext[..., pad:pad + geom.tile[0], pad:pad + geom.tile[1]])
        back = binning.overlap_add(core_only, geom)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                   rtol=1e-6)

    def test_extend_tiles_halo_wrap(self, rng):
        geom = binning.choose_geometry((64, 64), 7, 100)
        x = jnp.asarray(np.arange(64 * 64, dtype=np.float32
                                  ).reshape(1, 64, 64))
        ext = np.asarray(binning.extend_tiles(x, geom))
        pad = geom.pad
        # Tile (0, 0)'s top halo rows wrap to the grid's bottom rows.
        np.testing.assert_array_equal(
            ext[0, 0, 0, :pad, pad:pad + geom.tile[1]],
            np.asarray(x)[0, -pad:, :geom.tile[1]])


@pytest.mark.parametrize("grid_shape,m", [
    ((64,), 600), ((32, 48), 800), ((16, 16, 16), 700)])
@pytest.mark.parametrize("transform_type", ["type_1", "type_2"])
def test_pallas_matches_xla(rng, grid_shape, m, transform_type):
    rank = len(grid_shape)
    pts = _adversarial_points(rng, m, rank)
    if transform_type == "type_1":
        src = to_planar(random_complex(rng, (m,), np.complex64))
        gs = grid_shape
    else:
        src = to_planar(random_complex(rng, grid_shape, np.complex64))
        gs = None
    kw = dict(grid_shape=gs, transform_type=transform_type, tol=1e-5)
    a = tfft.planar.nufft(src, pts, options=tfft.Options(backend="xla"),
                          **kw)
    b = tfft.planar.nufft(src, pts,
                          options=tfft.Options(backend="pallas"), **kw)
    assert _relerr(b, a) < 1e-4


@pytest.mark.parametrize("batch", [3, 16])   # 16 -> 32 channels, grouped
@pytest.mark.parametrize("transform_type", ["type_1", "type_2"])
def test_pallas_batched(rng, batch, transform_type):
    grid_shape = (32, 32)
    m = 300
    pts = _adversarial_points(rng, m, 2)
    if transform_type == "type_1":
        src = to_planar(random_complex(rng, (batch, m), np.complex64))
        kw = dict(grid_shape=grid_shape, transform_type="type_1")
    else:
        src = to_planar(random_complex(rng, (batch,) + grid_shape,
                                       np.complex64))
        kw = dict(transform_type="type_2")
    a = tfft.planar.nufft(src, pts, options=tfft.Options(backend="xla"),
                          **kw)
    b = tfft.planar.nufft(src, pts,
                          options=tfft.Options(backend="pallas"), **kw)
    assert _relerr(b, a) < 1e-4


@pytest.mark.parametrize("transform_type", ["type_1", "type_2"])
def test_pallas_streaming_rank3_subchunk(rng, monkeypatch,
                                         transform_type):
    """The rank-3 streaming kernels' sub-chunk fold (chunk > 128 lanes
    folded through the VMEM staging ref) matches XLA. Forces the
    per-tile-grid path (resident_fits forced False) and a 2-sub-chunk
    geometry."""
    from tensorflow_nufft_tpu.kernels import binning, pallas_spread
    monkeypatch.setattr(pallas_spread, "resident_fits",
                        lambda *a, **k: False)
    binning.set_geometry_overrides(chunk=256)
    try:
        grid_shape = (16, 16, 16)
        m = 700
        pts = _adversarial_points(rng, m, 3)
        if transform_type == "type_1":
            src = to_planar(random_complex(rng, (m,), np.complex64))
            kw = dict(grid_shape=grid_shape, transform_type="type_1")
        else:
            src = to_planar(random_complex(rng, grid_shape,
                                           np.complex64))
            kw = dict(transform_type="type_2")
        kw["tol"] = 1e-5
        a = tfft.planar.nufft(src, pts,
                              options=tfft.Options(backend="xla"), **kw)
        b = tfft.planar.nufft(src, pts,
                              options=tfft.Options(backend="pallas"),
                              **kw)
        assert _relerr(b, a) < 1e-4
    finally:
        binning.set_geometry_overrides()


def test_forced_pallas_rejects_f64():
    """backend='pallas' must error on f64/complex128 configs rather than
    silently casting to float32 (advisor finding)."""
    rng = np.random.default_rng(3)
    pts = rng.uniform(-np.pi, np.pi, (64, 2))
    vals = rng.standard_normal((64, 2))
    with pytest.raises(ValueError, match="pallas"):
        tfft.planar.nufft(vals, pts, grid_shape=(16, 16),
                          transform_type="type_1",
                          options=tfft.Options(backend="pallas"))


def test_bigm_ranking_matches_prefix_forms():
    """The sort-based int32 ranking (_ranks_and_starts_bigm, the
    >= 2**24-slot path) produces exactly the padpos/counts/chunk_starts
    of the f32 prefix-sum forms, with and without the z-order cell key."""
    from tensorflow_nufft_tpu.kernels import binning
    rng = np.random.default_rng(5)
    num_tiles, zcells, chunk, m = 24, 4, 64, 5000
    tid = jnp.asarray(rng.integers(0, num_tiles, m), jnp.int32)
    zc = jnp.asarray(rng.integers(0, zcells, m), jnp.int32)

    r, c, cb, cs = binning._ranks_and_starts(tid, num_tiles, chunk)
    pp, c2, cs2 = binning._ranks_and_starts_bigm(tid, num_tiles, chunk)
    np.testing.assert_array_equal(np.asarray(cb + r), np.asarray(pp))
    np.testing.assert_array_equal(np.asarray(c), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(cs), np.asarray(cs2))

    r, c, cb, cs = binning._ranks_and_starts_celled(
        tid, zc, num_tiles, zcells, chunk)
    pp, c2, cs2 = binning._ranks_and_starts_bigm(
        tid, num_tiles, chunk, zc=zc, zcells=zcells)
    np.testing.assert_array_equal(np.asarray(cb + r), np.asarray(pp))
    np.testing.assert_array_equal(np.asarray(c), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(cs), np.asarray(cs2))


def test_bigm_binning_oracle_past_f32_ceiling():
    """bin_points on a >= 2**24-slot geometry (the regime the f32 forms
    cannot serve) matches an int64 numpy oracle ranking."""
    from tensorflow_nufft_tpu.kernels import binning
    geom = binning.choose_geometry((256, 256), 7, 40_000_000)
    assert not binning.ranking_is_exact(geom)
    rng = np.random.default_rng(9)
    m = 100_000
    pts = rng.uniform(0, 512, (m, 2)).astype(np.float32)
    binned = binning.bin_points(jnp.asarray(pts), geom)
    padpos = np.asarray(binned.padpos)

    # int64 oracle: stable grouping by tile, chunk rounds per tile.
    tiles = geom.tiles
    tidx = np.clip((pts // np.array(geom.tile)).astype(np.int64),
                   0, np.array(tiles) - 1)
    tid = tidx[:, 0] * tiles[1] + tidx[:, 1]
    counts = np.bincount(tid, minlength=geom.num_tiles)
    rounds = np.maximum(-(-counts // geom.chunk), 1)
    chunk_starts = np.cumsum(rounds) - rounds
    order = np.argsort(tid, kind="stable")
    rank = np.empty(m, np.int64)
    pos = 0
    prev = -1
    for p in order:
        if tid[p] != prev:
            prev, pos = tid[p], 0
        rank[p] = pos
        pos += 1
    oracle = chunk_starts[tid] * geom.chunk + rank
    np.testing.assert_array_equal(padpos, oracle)
    # Inverse map consistency.
    inv = np.asarray(binned.invpos)
    np.testing.assert_array_equal(inv[padpos], np.arange(m))


class TestPlannedNufft:
    """PlannedNufft (planned path forced via backend='pallas') matches
    the unplanned pipeline, including gradients."""

    def _setup(self, transform_type, rng):
        grid = (16, 16)
        m = 200
        pts = random_points(rng, (m, 2), np.float32)
        if transform_type == "type_1":
            src = rng.standard_normal((2, m, 2)).astype(np.float32)
        else:
            src = rng.standard_normal((2,) + grid + (2,)).astype(
                np.float32)
        return grid, pts, src

    @pytest.mark.parametrize("transform_type", ["type_1", "type_2"])
    def test_matches_unplanned(self, rng, transform_type):
        grid, pts, src = self._setup(transform_type, rng)
        opts = tfft.Options(backend="pallas")
        op = tfft.planar.PlannedNufft(
            pts, grid, transform_type=transform_type, options=opts)
        assert op._planned
        got = np.asarray(op(src))
        ref = np.asarray(tfft.planar.nufft(
            src, pts, grid_shape=grid, transform_type=transform_type))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4 * np.abs(ref).max())

    def test_gradient_matches(self, rng):
        grid, pts, src = self._setup("type_2", rng)
        opts = tfft.Options(backend="pallas")
        op = tfft.planar.PlannedNufft(pts, grid, transform_type="type_2",
                                      options=opts)

        def loss_planned(x):
            return jnp.sum(op(x) ** 2)

        def loss_ref(x):
            y = tfft.planar.nufft(x, pts, grid_shape=grid,
                                  transform_type="type_2")
            return jnp.sum(y ** 2)

        g1 = np.asarray(jax.grad(loss_planned)(jnp.asarray(src)))
        g2 = np.asarray(jax.grad(loss_ref)(jnp.asarray(src)))
        np.testing.assert_allclose(g1, g2, rtol=1e-3,
                                   atol=1e-3 * np.abs(g2).max())

    @pytest.mark.parametrize("rank", [2, 3])
    @pytest.mark.parametrize("transform_type", ["type_1", "type_2"])
    def test_mats_streaming_grid_kernels(self, rng, monkeypatch, rank,
                                         transform_type):
        """Planned 'mats' level served by the per-tile-grid
        mats-streaming kernels (tile array forced non-resident):
        matches the unplanned op for ranks 2 and 3."""
        from tensorflow_nufft_tpu.kernels import pallas_spread
        monkeypatch.setattr(pallas_spread, "resident_fits",
                            lambda *a, **k: False)
        grid = (16, 16) if rank == 2 else (16, 16, 16)
        m = 500
        pts = random_points(rng, (m, rank), np.float32)
        if transform_type == "type_1":
            src = rng.standard_normal((2, m, 2)).astype(np.float32)
            kw = {}
        else:
            src = rng.standard_normal((2,) + grid + (2,)).astype(
                np.float32)
            kw = {}
        opts = tfft.Options(backend="pallas")
        op = tfft.planar.PlannedNufft(
            pts, grid, transform_type=transform_type, options=opts)
        assert op._level == "mats"
        got = np.asarray(op(src))
        ref = np.asarray(tfft.planar.nufft(
            src, pts, grid_shape=grid, transform_type=transform_type,
            **kw))
        np.testing.assert_allclose(got, ref, rtol=1e-4,
                                   atol=1e-4 * np.abs(ref).max())

    def test_fallback_off_pallas(self, rng):
        grid, pts, src = self._setup("type_2", rng)
        op = tfft.planar.PlannedNufft(pts, grid, transform_type="type_2")
        # default backend on CPU: unplanned fallback, still correct
        got = np.asarray(op(src))
        ref = np.asarray(tfft.planar.nufft(src, pts, grid_shape=grid))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


class TestPayloadBuilds:
    """Pin the gather-based payload semantics (the padded chunk stream
    the Pallas kernels consume): invpos is the exact inverse of padpos,
    values land flat at their slots with zeros in padded slots, and
    coords carry SENTINEL in the sentinel rows of padded slots."""

    @pytest.mark.parametrize("rank", [1, 2, 3])
    def test_invpos_inverse_of_padpos(self, rng, rank):
        m = 700
        fine = {1: (256,), 2: (64, 64), 3: (32, 32, 32)}[rank]
        pts = rng.uniform(0, np.array(fine) - 1e-3,
                          (m, rank)).astype(np.float32)
        geom = binning.choose_geometry(fine, 5, m, chunk=64)
        b = binning.bin_points(jnp.asarray(pts), geom)
        padpos = np.asarray(b.padpos)
        invpos = np.asarray(b.invpos)
        np.testing.assert_array_equal(invpos[padpos], np.arange(m))
        pad_mask = np.ones(geom.num_chunks * geom.chunk, bool)
        pad_mask[padpos] = False
        assert np.all(invpos[pad_mask] == m)

    def test_values_payload_flat_slots(self, rng):
        m, b2 = 300, 2
        geom = binning.choose_geometry((64, 64), 5, m, chunk=64)
        pts = rng.uniform(0, 64 - 1e-3, (m, 2)).astype(np.float32)
        b = binning.bin_points(jnp.asarray(pts), geom)
        vals = rng.standard_normal((b2, m)).astype(np.float32)
        pay = np.asarray(binning.build_values_payload(
            jnp.asarray(vals), b, geom))
        ncc = geom.num_chunks * geom.chunk
        assert pay.shape == (8, ncc)           # sublane-padded rows
        padpos = np.asarray(b.padpos)
        ref = np.zeros((8, ncc), np.float32)
        ref[:b2, padpos] = vals
        np.testing.assert_array_equal(pay, ref)

    def test_coords_payload_sentinels(self, rng):
        m = 200
        geom = binning.choose_geometry((64, 64), 5, m, chunk=64)
        pts = rng.uniform(0, 64 - 1e-3, (m, 2)).astype(np.float32)
        b = binning.bin_points(jnp.asarray(pts), geom)
        coords = np.asarray(binning.build_coords_payload(b, geom))
        assert coords.shape == (geom.num_chunks, 8, geom.chunk)
        flat = coords.reshape(geom.num_chunks, 8, geom.chunk)
        padpos = np.asarray(b.padpos)
        chunk_of, slot_of = padpos // geom.chunk, padpos % geom.chunk
        for d in range(2):
            np.testing.assert_array_equal(
                flat[chunk_of, d, slot_of], pts[:, d])
        pad_mask = np.ones((geom.num_chunks, geom.chunk), bool)
        pad_mask[chunk_of, slot_of] = False
        # Sentinel rows (coordinate high words) read SENTINEL in pads.
        for d in range(2):
            assert np.all(flat[:, d, :][pad_mask] == binning.SENTINEL)
        # Non-sentinel rows read zero in pads.
        for r in range(2, 8):
            assert np.all(flat[:, r, :][pad_mask] == 0.0)


class TestRankingBranches:
    """The one-hot and scatter/gather forms of _ranks_and_starts must
    agree with a numpy oracle; num_tiles selects the branch
    (_ONEHOT_MAX_TILES boundary)."""

    @pytest.mark.parametrize("tiles_1d", [8, 24])   # 64 / 576 tiles
    def test_padpos_matches_oracle(self, rng, tiles_1d):
        t = 64
        fine = (tiles_1d * t, tiles_1d * t)
        m = 5000
        pts = rng.uniform(0, fine[0] - 1e-2, (m, 2)).astype(np.float32)
        geom = binning.choose_geometry(fine, 5, m, chunk=128,
                                       tile_pref=t)
        assert geom.tile == (t, t)
        b = binning.bin_points(jnp.asarray(pts), geom)
        padpos = np.asarray(b.padpos)

        # Numpy oracle: stable counting layout.
        nt = tiles_1d
        tid = ((pts[:, 0] // t).astype(int) * nt
               + (pts[:, 1] // t).astype(int))
        counts = np.bincount(tid, minlength=nt * nt)
        rounds = np.maximum(-(-counts // geom.chunk), 1)
        chunk_starts = np.cumsum(rounds) - rounds
        seen = np.zeros(nt * nt, int)
        expect = np.empty(m, int)
        for i in range(m):
            expect[i] = chunk_starts[tid[i]] * geom.chunk + seen[tid[i]]
            seen[tid[i]] += 1
        np.testing.assert_array_equal(padpos, expect)
        tb = np.asarray(b.tile_bounds)
        np.testing.assert_array_equal(tb[:-1], chunk_starts)


class TestFusedNormal:
    """PlannedNufft.normal: the chunk-order fused A^H W A matches the
    composed adjoint-after-forward bit-for-bit (same kernels, the
    point-order permutations are exact), on both plan levels."""

    def _op(self, rng, grid, transform_type="type_2"):
        m = 400
        pts = random_points(rng, (m, len(grid)), np.float32)
        opts = tfft.Options(backend="pallas")
        return tfft.planar.PlannedNufft(
            pts, grid, transform_type=transform_type, options=opts), m

    @pytest.mark.parametrize("grid", [(32,), (16, 24), (12, 16, 8)])
    def test_matches_composed(self, rng, grid):
        op, _ = self._op(rng, grid)
        assert op._level == "mats"
        src = rng.standard_normal((2,) + grid + (2,)).astype(np.float32)
        ref = np.asarray(op.adjoint()(op(src)))
        got = np.asarray(op.normal(src))
        np.testing.assert_allclose(got, ref, rtol=1e-6,
                                   atol=1e-6 * np.abs(ref).max())

    def test_matches_composed_binned_level(self, rng, monkeypatch):
        from tensorflow_nufft_tpu.kernels import pallas_spread
        monkeypatch.setattr(pallas_spread, "MATS_BYTES_BUDGET", 0)
        op, _ = self._op(rng, (16, 24))
        assert op._level == "binned"
        src = rng.standard_normal((1, 16, 24, 2)).astype(np.float32)
        ref = np.asarray(op.adjoint()(op(src)))
        got = np.asarray(op.normal(src))
        np.testing.assert_allclose(got, ref, rtol=1e-6,
                                   atol=1e-6 * np.abs(ref).max())

    def test_weighted(self, rng):
        op, m = self._op(rng, (16, 24))
        w = rng.uniform(0.5, 2.0, (m,)).astype(np.float32)
        sw = op.slot_weights(jnp.asarray(w))
        src = rng.standard_normal((2, 16, 24, 2)).astype(np.float32)
        ref = np.asarray(op.adjoint()(
            op(src) * jnp.asarray(w)[None, :, None]))
        got = np.asarray(op.normal(src, sw))
        np.testing.assert_allclose(got, ref, rtol=1e-6,
                                   atol=1e-6 * np.abs(ref).max())

    def test_type1_instance(self, rng):
        """normal on a type-1 planned instance: A W A^H on grid input."""
        op, m = self._op(rng, (16, 24), transform_type="type_1")
        src = rng.standard_normal((1, 16, 24, 2)).astype(np.float32)
        t2 = op.adjoint()
        ref = np.asarray(op(t2(src)))
        got = np.asarray(op.normal(src))
        np.testing.assert_allclose(got, ref, rtol=1e-6,
                                   atol=1e-6 * np.abs(ref).max())

    def test_vjp_is_self(self, rng):
        """The normal operator is self-adjoint: its VJP applies itself."""
        op, m = self._op(rng, (16, 24))
        w = rng.uniform(0.5, 2.0, (m,)).astype(np.float32)
        sw = op.slot_weights(jnp.asarray(w))
        src = jnp.asarray(
            rng.standard_normal((1, 16, 24, 2)).astype(np.float32))
        ct = jnp.asarray(
            rng.standard_normal(src.shape).astype(np.float32))
        _, vjp = jax.vjp(lambda s: op.normal(s, sw), src)
        got = np.asarray(vjp(ct)[0])
        ref = np.asarray(op.normal(ct, sw))
        np.testing.assert_allclose(got, ref, rtol=1e-6,
                                   atol=1e-6 * np.abs(ref).max())

    def test_jit_composes(self, rng):
        op, _ = self._op(rng, (16, 24))
        src = jnp.asarray(
            rng.standard_normal((1, 16, 24, 2)).astype(np.float32))
        got = np.asarray(jax.jit(op.normal)(src))
        ref = np.asarray(op.normal(src))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


class TestDispatchGuards:
    def test_forced_pallas_tiny_grid_raises(self, rng):
        # Fine dims below twice the halo cannot be tiled; the forced
        # backend must say so instead of crashing in the overlap-add.
        pts = random_points(rng, (20, 1), np.float32)
        src = to_planar(random_complex(rng, (20,), np.complex64))
        # grid 3 at tol 0.1: fine = 6 < 2*pad = 8.
        with pytest.raises(ValueError, match="tile|halo"):
            tfft.planar.nufft(src, pts, grid_shape=(3,),
                              transform_type="type_1", tol=1e-1,
                              options=tfft.Options(backend="pallas"))

    def test_forced_pallas_complex_raises(self, rng):
        # The Pallas kernels serve the planar pipeline only; forcing
        # them for complex arrays must error, not silently run XLA.
        pts = random_points(rng, (20, 1), np.float32)
        src = random_complex(rng, (20,), np.complex64)
        with pytest.raises(ValueError, match="planar"):
            tfft.nufft(src, pts, grid_shape=(32,),
                       transform_type="type_1",
                       options=tfft.Options(backend="pallas"))

    def test_planned_single_chunk(self, rng):
        # num_chunks can be smaller than the DMA pipeline depth; the
        # resident kernels' prefetch preamble must stay in bounds.
        from tensorflow_nufft_tpu.kernels import binning
        pts = random_points(rng, (100, 2), np.float32)
        op = tfft.planar.PlannedNufft(
            pts, (32, 32), transform_type="type_1",
            options=tfft.Options(backend="pallas"))
        assert op._planned
        geom = op.geom
        assert geom.num_chunks <= 2    # the tiny-plan regime
        src = to_planar(random_complex(rng, (1, 100), np.complex64))
        got = np.asarray(op(src))
        ref = np.asarray(tfft.planar.nufft(
            src, pts, grid_shape=(32, 32), transform_type="type_1",
            options=tfft.Options(backend="xla")))
        np.testing.assert_allclose(got, ref, rtol=1e-4,
                                   atol=1e-4 * np.abs(ref).max())

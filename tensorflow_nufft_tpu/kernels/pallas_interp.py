"""Pallas TPU interp kernel (type-2 gather) — the MXU formulation.

Dual of ``pallas_spread``: static grid over tiles, each program holds its
halo-padded fine-grid block in VMEM and walks its chunk range with
double-buffered input DMA. Each point's value is the separable form

    c_m = sum_e A_0[m, e0] ... A_{r-1}[m, e_{r-1}] F_tile[e0..e_{r-1}]

computed for the whole chunk with MXU matmuls (A_y @ F_tile) and VPU
row-reductions; per-chunk results stream back to HBM with write DMAs.
Replaces the reference's shared-memory gather kernels
(cc/kernels/nufft_plan.cu.cc:652-1804).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorflow_nufft_tpu.kernels.binning import (
    TileGeometry,
    bin_points,
    build_coords_payload,
    choose_geometry,
    extend_tiles,
    scatter_chunked,
)
from tensorflow_nufft_tpu.kernels.pallas_spread import (
    NBUF,
    RANK3_SUB,
    _linear_tile_id,
    _tile_origins,
    es_kernel_matrix,  # noqa: F401  (re-export for tests)
    horner_static,
    kernel_matrices_from,
    num_points_of,
    supports,          # noqa: F401  (same support envelope as spread)
    use_interpret,
)
from tensorflow_nufft_tpu.plan.plan import NufftPlan

_MXU_PRECISION = jax.lax.Precision.HIGHEST


def chunk_interp_values(f_block, mats_t, geom: TileGeometry):
    """One channel's [C] chunk values from [E_d, C] kernel matrices and
    an extended block ``f_block`` [*ext]. Output is a [C]-lane row (no
    transposes); rank 3 folds z and y with one Khatri-Rao product, so
    there is a single contraction per channel."""
    rank = geom.rank
    if rank == 1:
        return jnp.sum(mats_t[0] * f_block[:, None], axis=0)
    if rank == 2:
        v = jax.lax.dot_general(
            f_block, mats_t[1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_MXU_PRECISION)                        # [Ey, C]
        return jnp.sum(mats_t[0] * v, axis=0)                # [C]
    e0, e1, e2 = geom.ext
    f2 = f_block.reshape(e0 * e1, e2)                        # [ZY, Ex]
    v = jax.lax.dot_general(
        f2, mats_t[2], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_MXU_PRECISION)                            # [ZY, C]
    w = (mats_t[0][:, None, :] * mats_t[1][None, :, :]).reshape(
        e0 * e1, -1)                                         # [ZY, C]
    return jnp.sum(w * v, axis=0)                            # [C]


def _interp_chunk_subchunk(tile_ref, mats_t, out_scratch, oslot,
                           geom: TileGeometry, batch2: int, mref):
    """Rank-3 chunk values in RANK3_SUB-lane sub-chunks, written
    directly into ``out_scratch[oslot]``. Dual of
    pallas_spread.accumulate_spread_subchunk: staging the per-axis
    matrices in ``mref`` and folding one lane tile per fori_loop step
    keeps the [E0*E1, *] stack temporaries independent of chunk size."""
    from tensorflow_nufft_tpu.kernels.pallas_spread import RANK3_SUB
    e0, e1, e2 = geom.ext
    mref[0:e0, :] = mats_t[0]
    mref[e0:e0 + e1, :] = mats_t[1]
    mref[e0 + e1:, :] = mats_t[2]
    sub = min(RANK3_SUB, geom.chunk)
    f2 = [tile_ref[0, 0, 0, b].reshape(e0 * e1, e2)
          for b in range(batch2)]
    dn = (((1,), (0,)), ((), ()))

    def body(j, _):
        js = pl.ds(j * sub, sub)
        m0 = mref[0:e0, js]
        m1 = mref[e0:e0 + e1, js]
        m2 = mref[e0 + e1:, js]
        w = (m0[:, None, :] * m1[None, :, :]).reshape(e0 * e1, sub)
        for b in range(batch2):         # static unroll over channels
            v = jax.lax.dot_general(
                f2[b], m2, dn, preferred_element_type=jnp.float32,
                precision=_MXU_PRECISION)                    # [ZY, S]
            out_scratch[oslot, b, js] = jnp.sum(w * v, axis=0)
        return 0

    jax.lax.fori_loop(0, geom.chunk // sub, body, 0)


def _interp_chunk_subchunk_refs(tile_ref, m_scratch, slot, out_scratch,
                                oslot, geom: TileGeometry, batch2: int):
    """_interp_chunk_subchunk reading the per-axis matrices straight
    from the streamed [NBUF, sum(E_d), C] concatenated scratch ref
    (mats variant)."""
    from tensorflow_nufft_tpu.kernels.pallas_spread import RANK3_SUB
    e0, e1, e2 = geom.ext
    sub = min(RANK3_SUB, geom.chunk)
    f2 = [tile_ref[0, 0, 0, b].reshape(e0 * e1, e2)
          for b in range(batch2)]
    dn = (((1,), (0,)), ((), ()))

    def body(j, _):
        js = pl.ds(j * sub, sub)
        m0 = m_scratch[slot, 0:e0, js]
        m1 = m_scratch[slot, e0:e0 + e1, js]
        m2 = m_scratch[slot, e0 + e1:, js]
        w = (m0[:, None, :] * m1[None, :, :]).reshape(e0 * e1, sub)
        for b in range(batch2):         # static unroll over channels
            v = jax.lax.dot_general(
                f2[b], m2, dn, preferred_element_type=jnp.float32,
                precision=_MXU_PRECISION)                    # [ZY, S]
            out_scratch[oslot, b, js] = jnp.sum(w * v, axis=0)
        return 0

    jax.lax.fori_loop(0, geom.chunk // sub, body, 0)


def _interp_chunk_values_mats_t(tile_ref, tids, mats_t,
                                geom: TileGeometry, batch2: int):
    """_interp_chunk_values with dynamic leading tile indices."""
    return jnp.stack([
        chunk_interp_values(tile_ref[tuple(tids) + (b,)], mats_t, geom)
        for b in range(batch2)], axis=0)


def interp_channels_into(out_scratch, oslot, tile_ref, tids, mats_t,
                         geom: TileGeometry, batch2: int):
    """Writes one chunk's [B2, C] values into ``out_scratch[oslot]``
    (static channel unroll)."""
    out_scratch[oslot] = _interp_chunk_values_mats_t(
        tile_ref, tids, mats_t, geom, batch2)


def _interp_kernel_resident_mats(*refs, geom: TileGeometry, batch2):
    """Resident interp consuming precomputed kernel matrices.

    The whole windowed tile array stays in VMEM; one global chunk
    stream of precomputed concatenated [sum(E_d), C] matrix slices —
    ONE DMA per chunk (pure DMA + MXU — see
    _spread_kernel_resident_mats)."""
    from tensorflow_nufft_tpu.kernels.pallas_spread import _mats_slices
    rank = geom.rank
    bounds_ref = refs[0]
    ct_refs = refs[1:1 + rank]
    mats_hbm = refs[1 + rank]
    tile_ref = refs[2 + rank]
    out_hbm = refs[3 + rank]
    m_scratch = refs[4 + rank]
    out_scratch = refs[5 + rank]
    in_sems = refs[6 + rank]
    out_sems = refs[7 + rank]
    used = bounds_ref[geom.num_tiles]

    def chunk_dma(slot, k):
        return pltpu.make_async_copy(
            mats_hbm.at[k], m_scratch.at[slot], in_sems.at[slot])

    def write_dma(slot, k):
        return pltpu.make_async_copy(
            out_scratch.at[slot], out_hbm.at[k], out_sems.at[slot])

    for j in range(NBUF - 1):
        @pl.when(j < used)
        def _(j=j):
            # Static preamble index: clamp for tiny plans (see
            # pallas_spread preambles).
            chunk_dma(j, min(j, geom.num_chunks - 1)).start()

    def body(k, _):
        slot = jax.lax.rem(k, jnp.asarray(NBUF, k.dtype))
        oslot = jax.lax.rem(k, jnp.asarray(2, k.dtype))

        @pl.when(k + NBUF - 1 < used)
        def _():
            nslot = jax.lax.rem(k + NBUF - 1, jnp.asarray(NBUF, k.dtype))
            chunk_dma(nslot, k + NBUF - 1).start()

        chunk_dma(slot, k).wait()
        tids = [ct_refs[d][k] for d in range(rank)]
        mats_t = _mats_slices(m_scratch, slot, geom)

        @pl.when(k >= 2)
        def _():
            write_dma(oslot, k - 2).wait()
        interp_channels_into(out_scratch, oslot, tile_ref, tids, mats_t,
                             geom, batch2)
        write_dma(oslot, k).start()
        return 0

    jax.lax.fori_loop(0, used, body, 0)

    for j in range(2):
        @pl.when(j < used)
        def _(j=j):
            last = used - 1 - j
            write_dma(jax.lax.rem(last, jnp.asarray(2, last.dtype)),
                      last).wait()


def _interp_kernel(bounds_ref, payload_hbm, tile_ref, out_hbm,
                   in_scratch, in_sems, out_scratch, out_sems,
                   *scratch_rest, geom: TileGeometry, beta, c,
                   half_width, batch2, horner=None, deriv_axis=None):
    mref = scratch_rest[0] if scratch_rest else None
    t = _linear_tile_id(geom)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    origins = _tile_origins(geom)

    def chunk_dma(slot, k):
        return pltpu.make_async_copy(
            payload_hbm.at[k], in_scratch.at[slot], in_sems.at[slot])

    def write_dma(slot, k):
        return pltpu.make_async_copy(
            out_scratch.at[slot], out_hbm.at[k], out_sems.at[slot])

    for j in range(NBUF - 1):
        @pl.when(start + j < end)
        def _(j=j):
            chunk_dma(j, start + j).start()

    def body(k, _):
        d = k - start
        slot = jax.lax.rem(d, jnp.asarray(NBUF, d.dtype))
        oslot = jax.lax.rem(d, jnp.asarray(2, d.dtype))

        @pl.when(k + NBUF - 1 < end)
        def _():
            nslot = jax.lax.rem(d + NBUF - 1, jnp.asarray(NBUF, d.dtype))
            chunk_dma(nslot, k + NBUF - 1).start()

        chunk_dma(slot, k).wait()
        data = in_scratch[slot]                  # [R, C]
        mats = kernel_matrices_from(data, origins, geom, beta, c,
                                    half_width, horner, deriv_axis)
        # Double-buffered write-back: reclaim this slot's previous write
        # before overwriting, so the outbound DMA overlaps the next
        # chunk's compute instead of serializing against it.
        @pl.when(d >= 2)
        def _():
            write_dma(oslot, k - 2).wait()
        if mref is not None:
            _interp_chunk_subchunk(tile_ref, mats, out_scratch, oslot,
                                   geom, batch2, mref)
        else:
            interp_channels_into(out_scratch, oslot, tile_ref,
                                 (0,) * geom.rank, mats, geom, batch2)
        write_dma(oslot, k).start()
        return 0

    jax.lax.fori_loop(start, end, body, 0)

    # Drain the last two outstanding writes.
    for j in range(2):
        @pl.when(start + j < end)
        def _(j=j):
            last = end - 1 - j
            write_dma(jax.lax.rem(last - start, jnp.asarray(2, last.dtype)),
                      last).wait()


def _interp_kernel_banded(bounds_ref, zorig_ref, payload_hbm, tile_ref,
                          out_hbm, in_scratch, in_sems, out_scratch,
                          out_sems, mref, *, geom: TileGeometry, beta,
                          c, half_width, batch2, band, horner=None):
    """Rank-3 interp with axis-0 banding: sub-chunk j of chunk k reads
    only rows [zorig[k*subs+j], +band) of the extended tile, so the
    per-sub contraction is [band*E1, E2] x [E2, S] instead of
    [E0*E1, E2] x [E2, S] — the dual of
    pallas_spread.accumulate_spread_banded. Requires z-ordered binning
    and binning.compute_band_origins."""
    e0, e1, e2 = geom.ext
    sublen = min(geom.chunk, RANK3_SUB)
    subs = geom.chunk // sublen
    t = _linear_tile_id(geom)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    origins = _tile_origins(geom)
    dn = (((1,), (0,)), ((), ()))

    def chunk_dma(slot, k):
        return pltpu.make_async_copy(
            payload_hbm.at[k], in_scratch.at[slot], in_sems.at[slot])

    def write_dma(slot, k):
        return pltpu.make_async_copy(
            out_scratch.at[slot], out_hbm.at[k], out_sems.at[slot])

    for j in range(NBUF - 1):
        @pl.when(start + j < end)
        def _(j=j):
            chunk_dma(j, start + j).start()

    def body(k, _):
        d = k - start
        slot = jax.lax.rem(d, jnp.asarray(NBUF, d.dtype))
        oslot = jax.lax.rem(d, jnp.asarray(2, d.dtype))

        @pl.when(k + NBUF - 1 < end)
        def _():
            nslot = jax.lax.rem(d + NBUF - 1, jnp.asarray(NBUF, d.dtype))
            chunk_dma(nslot, k + NBUF - 1).start()

        chunk_dma(slot, k).wait()
        m1 = es_kernel_matrix(e1, in_scratch[slot, 1, :] - origins[1],
                              in_scratch[slot, 4, :], beta, c,
                              half_width, horner)
        m2 = es_kernel_matrix(e2, in_scratch[slot, 2, :] - origins[2],
                              in_scratch[slot, 5, :], beta, c,
                              half_width, horner)
        mref[0:e1, :] = m1
        mref[e1:e1 + e2, :] = m2

        @pl.when(d >= 2)
        def _():
            write_dma(oslot, k - 2).wait()

        def sbody(j, _):
            js = pl.ds(j * sublen, sublen)
            zo = zorig_ref[k * subs + j]
            s_hi_z = (in_scratch[slot, 0, js] - origins[0]) \
                - zo.astype(jnp.float32)
            m0b = es_kernel_matrix(band, s_hi_z,
                                   in_scratch[slot, 3, js],
                                   beta, c, half_width, horner)
            m1s = mref[0:e1, js]
            m2s = mref[e1:e1 + e2, js]
            w = (m0b[:, None, :] * m1s[None, :, :]).reshape(
                band * e1, sublen)
            for b in range(batch2):     # static unroll over channels
                fb = tile_ref[0, 0, 0, b, pl.ds(zo, band)].reshape(
                    band * e1, e2)
                v = jax.lax.dot_general(
                    fb, m2s, dn, preferred_element_type=jnp.float32,
                    precision=_MXU_PRECISION)        # [band*E1, S]
                out_scratch[oslot, b, js] = jnp.sum(w * v, axis=0)
            return 0

        jax.lax.fori_loop(0, subs, sbody, 0)
        write_dma(oslot, k).start()
        return 0

    jax.lax.fori_loop(start, end, body, 0)

    for j in range(2):
        @pl.when(start + j < end)
        def _(j=j):
            last = end - 1 - j
            write_dma(jax.lax.rem(last - start,
                                  jnp.asarray(2, last.dtype)),
                      last).wait()


def _interp_kernel_mats(*refs, geom: TileGeometry, batch2):
    """Per-tile-grid interp streaming precomputed kernel matrices
    (dual of pallas_spread._spread_kernel_mats): ONE per-chunk
    concatenated [sum(E_d), C] matrix DMA in, double-buffered [B2, C]
    value DMA out."""
    from tensorflow_nufft_tpu.kernels.pallas_spread import _mats_slices
    rank = geom.rank
    bounds_ref = refs[0]
    mats_hbm = refs[1]
    tile_ref = refs[2]
    out_hbm = refs[3]
    m_scratch = refs[4]
    in_sems = refs[5]
    out_scratch = refs[6]
    out_sems = refs[7]
    t = _linear_tile_id(geom)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]

    def chunk_dma(slot, k):
        return pltpu.make_async_copy(
            mats_hbm.at[k], m_scratch.at[slot], in_sems.at[slot])

    def write_dma(slot, k):
        return pltpu.make_async_copy(
            out_scratch.at[slot], out_hbm.at[k], out_sems.at[slot])

    for j in range(NBUF - 1):
        @pl.when(start + j < end)
        def _(j=j):
            chunk_dma(j, start + j).start()

    def body(k, _):
        d = k - start
        slot = jax.lax.rem(d, jnp.asarray(NBUF, d.dtype))
        oslot = jax.lax.rem(d, jnp.asarray(2, d.dtype))

        @pl.when(k + NBUF - 1 < end)
        def _():
            nslot = jax.lax.rem(d + NBUF - 1, jnp.asarray(NBUF, d.dtype))
            chunk_dma(nslot, k + NBUF - 1).start()

        chunk_dma(slot, k).wait()

        @pl.when(d >= 2)
        def _():
            write_dma(oslot, k - 2).wait()
        if rank == 3:
            _interp_chunk_subchunk_refs(tile_ref, m_scratch, slot,
                                        out_scratch, oslot, geom,
                                        batch2)
        else:
            mats_t = _mats_slices(m_scratch, slot, geom)
            interp_channels_into(out_scratch, oslot, tile_ref,
                                 (0,) * rank, mats_t, geom, batch2)
        write_dma(oslot, k).start()
        return 0

    jax.lax.fori_loop(start, end, body, 0)

    for j in range(2):
        @pl.when(start + j < end)
        def _(j=j):
            last = end - 1 - j
            write_dma(jax.lax.rem(last - start,
                                  jnp.asarray(2, last.dtype)),
                      last).wait()


def interp_pallas_tiled(tiles: jax.Array, points_resc,
                        plan: NufftPlan, geom: TileGeometry,
                        binned=None, mats=None,
                        coords=None, chunk_order=False,
                        out_vma=None, band_info=None,
                        deriv_axis=None) -> jax.Array:
    """[*tiles, B2, *ext] extended blocks + rescaled points ->
    [B2, M]. The halo windowing is the caller's (fused into the upstream
    contraction by amplify_pad_dft_tiled, or done by extend_tiles).
    ``binned``/``mats`` (from a planned transform) skip the points-side
    preprocessing and the in-kernel polynomial evaluation.

    ``chunk_order=True`` returns [B2, NC*chunk] values in SLOT order
    instead of point order (padded slots within a tile's used chunks
    are zero; slots in chunks beyond ``tile_bounds[-1]`` are never
    written and hold uninitialized memory — consumers must stop at the
    used range, as the spread kernels do), skipping the un-permute
    gather — feed straight into
    ``spread_pallas_tiles(values_slots=...)`` for a fused normal
    operator."""
    from tensorflow_nufft_tpu.kernels.pallas_spread import (
        resident_group_size, streaming_group_size)
    rank = geom.rank
    batch2 = tiles.shape[rank]
    if binned is None:
        binned = bin_points(points_resc, geom)
    if deriv_axis is not None:
        # Derivative kernels are evaluated in-kernel: the mats payload
        # and the banded variants carry/assume plain phi.
        assert mats is None, "deriv_axis requires in-kernel evaluation"
        band_info = None
    if band_info is not None and (
            rank != 3 or mats is not None
            or band_info[0] >= geom.ext[0]):
        band_info = None          # degenerate band: unbanded kernels
    group = streaming_group_size(
        geom, band_info[0] if band_info else None)
    if mats is not None:
        # Prefer residence only when it does not cost extra passes over
        # the mats payload (see pallas_spread.spread_pallas_tiles).
        gr = resident_group_size(geom)
        if gr and (group == 0
                   or -(-batch2 // gr) <= -(-batch2 // group)):
            group = gr
    if group == 0:
        raise ValueError(
            f"Pallas interp: no channel group fits the VMEM budget for "
            f"geometry tile={geom.tile} ext={geom.ext} "
            f"chunk={geom.chunk}; use backend='xla'.")
    payload = coords
    if mats is None and payload is None:
        payload = build_coords_payload(binned, geom)
    if batch2 > group:
        groups = []
        for i in range(0, batch2, group):
            sl = (slice(None),) * rank + (slice(i, i + group),)
            groups.append(_interp_group(tiles[sl], binned, payload,
                                        plan, geom, mats, chunk_order,
                                        out_vma, band_info, deriv_axis))
        return jnp.concatenate(groups, axis=0)
    return _interp_group(tiles, binned, payload, plan, geom, mats,
                         chunk_order, out_vma, band_info, deriv_axis)


def _interp_group(tiles, binned, payload, plan: NufftPlan,
                  geom: TileGeometry, mats=None,
                  chunk_order=False, out_vma=None,
                  band_info=None, deriv_axis=None) -> jax.Array:
    from tensorflow_nufft_tpu.kernels.pallas_spread import resident_fits
    rank = geom.rank
    batch2 = tiles.shape[rank]

    if band_info is not None:
        band, zorigins = band_info
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,           # bounds + band origins
            grid=geom.tiles,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),        # payload
                pl.BlockSpec(                                # tile block
                    (1,) * rank + (batch2,) + geom.ext,
                    lambda *ids: tuple(ids[:len(geom.tiles)])
                    + (0,) * (rank + 1),
                    memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((NBUF,) + payload.shape[1:], jnp.float32),
                pltpu.SemaphoreType.DMA((NBUF,)),
                pltpu.VMEM((2, batch2, geom.chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((sum(geom.ext[1:]), geom.chunk),
                           jnp.float32),
            ],
        )
        kernel = functools.partial(
            _interp_kernel_banded, geom=geom,
            beta=np.float32(plan.beta), c=np.float32(plan.c),
            half_width=np.float32(plan.half_width), batch2=batch2,
            band=band, horner=horner_static(plan))
        chunk_vals = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (geom.num_chunks, batch2, geom.chunk), jnp.float32,
                vma=out_vma),
            interpret=use_interpret(),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(binned.tile_bounds, zorigins, payload,
          tiles.astype(jnp.float32))
        flat = chunk_vals.transpose(1, 0, 2).reshape(
            batch2, geom.num_chunks * geom.chunk)
        if chunk_order:
            return flat
        return scatter_chunked(flat, binned)

    if mats is not None and resident_fits(geom, batch2):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1 + rank,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=(
                [pltpu.VMEM((NBUF, mats.shape[1], geom.chunk),
                            jnp.float32),
                 pltpu.VMEM((2, batch2, geom.chunk), jnp.float32),
                 pltpu.SemaphoreType.DMA((NBUF,)),
                 pltpu.SemaphoreType.DMA((2,))]),
        )
        chunk_vals = pl.pallas_call(
            functools.partial(_interp_kernel_resident_mats,
                              geom=geom, batch2=batch2),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (geom.num_chunks, batch2, geom.chunk), jnp.float32,
                vma=out_vma),
            interpret=use_interpret(),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(binned.tile_bounds, *binned.chunk_tidx, mats,
          tiles.astype(jnp.float32))
        flat = chunk_vals.transpose(1, 0, 2).reshape(
            batch2, geom.num_chunks * geom.chunk)
        if chunk_order:
            return flat
        return scatter_chunked(flat, binned)

    if mats is not None:
        # Tile array too big for residence: per-tile grid kernel
        # streaming the precomputed matrices (the planned 3D path).
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=geom.tiles,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [
                pl.BlockSpec(                            # tile block
                    (1,) * rank + (batch2,) + geom.ext,
                    lambda *ids: tuple(ids[:len(geom.tiles)])
                    + (0,) * (rank + 1),
                    memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=(
                [pltpu.VMEM((NBUF, mats.shape[1], geom.chunk),
                            jnp.float32),
                 pltpu.SemaphoreType.DMA((NBUF,)),
                 pltpu.VMEM((2, batch2, geom.chunk), jnp.float32),
                 pltpu.SemaphoreType.DMA((2,))]),
        )
        chunk_vals = pl.pallas_call(
            functools.partial(_interp_kernel_mats, geom=geom,
                              batch2=batch2),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (geom.num_chunks, batch2, geom.chunk), jnp.float32,
                vma=out_vma),
            interpret=use_interpret(),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(binned.tile_bounds, mats, tiles.astype(jnp.float32))
        flat = chunk_vals.transpose(1, 0, 2).reshape(
            batch2, geom.num_chunks * geom.chunk)
        if chunk_order:
            return flat
        return scatter_chunked(flat, binned)

    kernel = functools.partial(
        _interp_kernel, geom=geom,
        beta=np.float32(plan.beta), c=np.float32(plan.c),
        half_width=np.float32(plan.half_width), batch2=batch2,
        horner=horner_static(plan), deriv_axis=deriv_axis)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=geom.tiles,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # payload
            pl.BlockSpec(                                # tile block
                (1,) * rank + (batch2,) + geom.ext,
                lambda *ids: tuple(ids[:len(geom.tiles)])
                + (0,) * (rank + 1),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # chunk values
        scratch_shapes=[
            pltpu.VMEM((NBUF,) + payload.shape[1:], jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.VMEM((2, batch2, geom.chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ] + (
            # Rank-3 sub-chunk fold: kernel-matrix staging ref.
            [pltpu.VMEM((sum(geom.ext), geom.chunk), jnp.float32)]
            if rank == 3 else []),
    )
    chunk_vals = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (geom.num_chunks, batch2, geom.chunk), jnp.float32,
            vma=out_vma),
        interpret=use_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(binned.tile_bounds, payload, tiles.astype(jnp.float32))
    flat = chunk_vals.transpose(1, 0, 2).reshape(
        batch2, geom.num_chunks * geom.chunk)
    if chunk_order:
        return flat
    return scatter_chunked(flat, binned)


def interp_pallas(fine: jax.Array, points_resc,
                  plan: NufftPlan) -> jax.Array:
    """[B2, *fine_shape] fine grid + [M, rank] rescaled points (or
    (hi, lo) pair) -> [B2, M]."""
    m = num_points_of(points_resc)
    geom = choose_geometry(plan.fine_shape, plan.width, m)
    tiles = extend_tiles(fine.astype(jnp.float32), geom)
    return interp_pallas_tiled(tiles, points_resc, plan,
                               geom).astype(fine.dtype)

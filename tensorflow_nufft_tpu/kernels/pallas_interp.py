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


def _interp_chunk_values(tile_ref, mats, geom: TileGeometry,
                         batch2: int):
    """[B2, C] values of one chunk from the resident tile block."""
    rank = geom.rank
    outs = []
    for b in range(batch2):             # static unroll over channels
        if rank == 1:
            f_tile = tile_ref[0, b, :]                      # [E]
            outs.append(jnp.sum(mats[0] * f_tile[None, :], axis=1))
        elif rank == 2:
            f_tile = tile_ref[0, 0, b]                      # [Ey, Ex]
            t = jax.lax.dot_general(
                mats[0], f_tile, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_MXU_PRECISION)                    # [C, Ex]
            outs.append(jnp.sum(t * mats[1], axis=1))
        else:
            acc = jnp.zeros((mats[0].shape[0],), jnp.float32)
            for ez in range(geom.ext[0]):   # z-planes, static unroll
                f_tile = tile_ref[0, 0, 0, b, ez]           # [Ey, Ex]
                t = jax.lax.dot_general(
                    mats[1], f_tile, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_MXU_PRECISION)                # [C, Ex]
                acc = acc + mats[0][:, ez] * jnp.sum(t * mats[2],
                                                     axis=1)
            outs.append(acc)
    return jnp.stack(outs, axis=0)


def _interp_kernel(bounds_ref, payload_hbm, tile_ref, out_hbm,
                   in_scratch, in_sems, out_scratch, out_sem,
                   *, geom: TileGeometry, beta, c, half_width, batch2,
                   horner=None):
    t = _linear_tile_id(geom)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    origins = _tile_origins(geom)

    def chunk_dma(slot, k):
        return pltpu.make_async_copy(
            payload_hbm.at[k], in_scratch.at[slot], in_sems.at[slot])

    @pl.when(start < end)
    def _():
        chunk_dma(0, start).start()

    def body(k, _):
        d = k - start
        slot = jax.lax.rem(d, jnp.asarray(2, d.dtype))

        @pl.when(k + 1 < end)
        def _():
            chunk_dma(1 - slot, k + 1).start()

        chunk_dma(slot, k).wait()
        data = in_scratch[slot]                  # [R, C]
        mats = kernel_matrices_from(data, origins, geom, beta, c,
                                    half_width, horner)
        out_scratch[...] = _interp_chunk_values(tile_ref, mats, geom,
                                                batch2)
        # Stream the chunk's values back to HBM; waiting immediately is
        # cheap (the write is ~KBs) and keeps one scratch buffer.
        write = pltpu.make_async_copy(out_scratch, out_hbm.at[k],
                                      out_sem)
        write.start()
        write.wait()
        return 0

    jax.lax.fori_loop(start, end, body, 0)


def interp_pallas_tiled(tiles: jax.Array, points_resc,
                        plan: NufftPlan, geom: TileGeometry) -> jax.Array:
    """[*tiles, B2, *ext] extended blocks + rescaled points ->
    [B2, M]. The halo windowing is the caller's (fused into the upstream
    contraction by amplify_pad_dft_tiled, or done by extend_tiles)."""
    from tensorflow_nufft_tpu.kernels.pallas_spread import MAX_CHANNELS
    rank = geom.rank
    batch2 = tiles.shape[rank]
    binned = bin_points(points_resc, geom)
    payload = build_coords_payload(binned, geom)
    if batch2 > MAX_CHANNELS:
        groups = []
        for i in range(0, batch2, MAX_CHANNELS):
            sl = (slice(None),) * rank + (slice(i, i + MAX_CHANNELS),)
            groups.append(_interp_group(tiles[sl], binned, payload,
                                        plan, geom))
        return jnp.concatenate(groups, axis=0)
    return _interp_group(tiles, binned, payload, plan, geom)


def _interp_group(tiles, binned, payload, plan: NufftPlan,
                  geom: TileGeometry) -> jax.Array:
    rank = geom.rank
    batch2 = tiles.shape[rank]

    kernel = functools.partial(
        _interp_kernel, geom=geom,
        beta=np.float32(plan.beta), c=np.float32(plan.c),
        half_width=np.float32(plan.half_width), batch2=batch2,
        horner=horner_static(plan))

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
            pltpu.VMEM((2,) + payload.shape[1:], jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((batch2, geom.chunk), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    chunk_vals = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (geom.num_chunks, batch2, geom.chunk), jnp.float32),
        interpret=use_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(binned.tile_bounds, payload, tiles.astype(jnp.float32))
    flat = chunk_vals.transpose(1, 0, 2).reshape(
        batch2, geom.num_chunks * geom.chunk)
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

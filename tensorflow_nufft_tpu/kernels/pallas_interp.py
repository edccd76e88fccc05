"""Pallas TPU interp kernel (type-2 gather) — the MXU formulation.

Dual of ``pallas_spread``: per chunk of tile-grouped points, the fine
grid's extended (halo-padded) tile is resident in VMEM and each point's
value is the separable form

    c_m = sum_e A_0[m, e0] ... A_{r-1}[m, e_{r-1}] F_tile[e0..e_{r-1}]

computed for the whole chunk with MXU matmuls (A_y @ F_tile) and VPU
row-reductions. Replaces the reference's shared-memory gather kernels
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
    BinnedPoints,
    TileGeometry,
    bin_points,
    choose_geometry,
    extend_tiles,
    scatter_chunked,
)
from tensorflow_nufft_tpu.kernels.pallas_spread import (
    _kernel_matrices,
    es_kernel_matrix,  # noqa: F401  (re-export for tests)
    num_points_of,
    supports,          # noqa: F401  (same support envelope as spread)
    use_interpret,
)
from tensorflow_nufft_tpu.plan.plan import NufftPlan

_MXU_PRECISION = jax.lax.Precision.HIGHEST


def _interp_kernel(*refs, geom: TileGeometry, beta, c, half_width,
                   batch2):
    rank = geom.rank
    tidx_refs = refs[:rank]
    coords_ref, tile_ref = refs[rank], refs[rank + 1]
    values_ref = refs[rank + 2]
    i = pl.program_id(0)

    mats = _kernel_matrices(coords_ref, tidx_refs, i, geom, beta, c,
                            half_width)

    for b in range(batch2):             # static unroll over channels
        if rank == 1:
            f_tile = tile_ref[0, b, :]                      # [E]
            values_ref[b, :] = jnp.sum(mats[0] * f_tile[None, :], axis=1)
        elif rank == 2:
            f_tile = tile_ref[0, 0, b]                      # [Ey, Ex]
            t = jax.lax.dot_general(
                mats[0], f_tile, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_MXU_PRECISION)                    # [C, Ex]
            values_ref[b, :] = jnp.sum(t * mats[1], axis=1)
        else:
            acc = jnp.zeros((coords_ref.shape[1],), jnp.float32)
            for ez in range(geom.ext[0]):   # z-planes, static unroll
                f_tile = tile_ref[0, 0, 0, b, ez]           # [Ey, Ex]
                t = jax.lax.dot_general(
                    mats[1], f_tile, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_MXU_PRECISION)                # [C, Ex]
                acc = acc + mats[0][:, ez] * jnp.sum(t * mats[2], axis=1)
            values_ref[b, :] = acc


def interp_pallas(fine: jax.Array, points_resc,
                  plan: NufftPlan) -> jax.Array:
    """[B2, *fine_shape] fine grid + [M, rank] rescaled points (or
    (hi, lo) pair) -> [B2, M]."""
    m = num_points_of(points_resc)
    geom = choose_geometry(plan.fine_shape, plan.width, m)
    tiles = extend_tiles(fine.astype(jnp.float32), geom)
    return interp_pallas_tiled(tiles, points_resc, plan,
                               geom).astype(fine.dtype)


def interp_pallas_tiled(tiles: jax.Array, points_resc,
                        plan: NufftPlan, geom: TileGeometry) -> jax.Array:
    """[*tiles, B2, *ext] extended blocks + [M, rank] rescaled points ->
    [B2, M]. The halo windowing is the caller's (fused into the upstream
    contraction by amplify_pad_dft_tiled, or done by extend_tiles)."""
    m = num_points_of(points_resc)
    rank = geom.rank
    batch2 = tiles.shape[rank]
    binned = bin_points(points_resc, geom)
    chunk = geom.chunk

    kernel = functools.partial(
        _interp_kernel,
        geom=geom,
        beta=np.float32(plan.beta), c=np.float32(plan.c),
        half_width=np.float32(plan.half_width),
        batch2=batch2)

    def tile_map(i, *refs):
        tidx = refs[:rank]
        return tuple(t[i] for t in tidx) + (0,) * (rank + 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=rank,
        grid=(geom.num_chunks,),
        in_specs=[
            pl.BlockSpec((2 * rank, chunk), lambda i, *r: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) * rank + (batch2,) + geom.ext, tile_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch2, chunk),
                               lambda i, *r: (0, i),
                               memory_space=pltpu.VMEM),
    )
    chunk_vals = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (batch2, geom.num_chunks * chunk), jnp.float32),
        interpret=use_interpret(),
    )(*binned.chunk_tidx, binned.coords, tiles.astype(jnp.float32))
    return scatter_chunked(chunk_vals, binned)

"""Pallas TPU interp kernel (type-2 gather) — the MXU formulation.

Dual of ``pallas_spread``: per chunk of tile-sorted points, the fine
grid's extended (halo-padded) tile is resident in VMEM and each point's
value is the separable bilinear form

    c_m = A_y[m, :] @ F_tile @ A_x[m, :]^T

computed for the whole chunk as one MXU matmul (A_y @ F_tile) followed by
a VPU row-reduction against A_x. Replaces the reference's shared-memory
gather kernels (cc/kernels/nufft_plan.cu.cc:652-1804).
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
    bin_points_2d,
    choose_geometry,
    extend_tiles_2d,
    scatter_chunked,
)
from tensorflow_nufft_tpu.kernels.pallas_spread import (
    es_kernel_matrix,
    supports,  # noqa: F401  (same support envelope as spread)
    use_interpret,
)
from tensorflow_nufft_tpu.plan.plan import NufftPlan

_MXU_PRECISION = jax.lax.Precision.HIGHEST


def _interp_kernel(
        # scalar prefetch
        ty_ref, tx_ref,
        # inputs
        coords_ref, tile_ref,
        # output
        values_ref,
        *, beta, c, half_width, tile, pad, batch2):
    i = pl.program_id(0)
    ey = tile[0] + 2 * pad
    ex = tile[1] + 2 * pad

    y0 = (ty_ref[i] * tile[0] - pad).astype(jnp.float32)
    x0 = (tx_ref[i] * tile[1] - pad).astype(jnp.float32)
    sy = coords_ref[0, :] - y0
    sx = coords_ref[1, :] - x0
    a_y = es_kernel_matrix(ey, sy, beta, c, half_width)     # [C, Ey]
    a_x = es_kernel_matrix(ex, sx, beta, c, half_width)     # [C, Ex]

    for b in range(batch2):             # static unroll over channels
        f_tile = tile_ref[0, 0, b]                           # [Ey, Ex]
        t = jax.lax.dot_general(
            a_y, f_tile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_MXU_PRECISION)                        # [C, Ex]
        values_ref[b, :] = jnp.sum(t * a_x, axis=1)


def interp_pallas(fine: jax.Array, points_resc: jax.Array,
                  plan: NufftPlan) -> jax.Array:
    """[B2, nf1, nf2] fine grid + [M, 2] rescaled points -> [B2, M]."""
    m = points_resc.shape[0]
    batch2 = fine.shape[0]
    geom = choose_geometry(plan.fine_shape, plan.width, m)
    binned = bin_points_2d(points_resc, geom)
    tiles = extend_tiles_2d(fine.astype(jnp.float32), geom)
    nty, ntx = geom.tiles
    ey, ex = geom.ext
    chunk = geom.chunk
    num_chunks = geom.num_chunks

    kernel = functools.partial(
        _interp_kernel,
        beta=np.float32(plan.beta), c=np.float32(plan.c),
        half_width=np.float32(plan.half_width),
        tile=geom.tile, pad=geom.pad, batch2=batch2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((2, chunk), lambda i, ty, tx: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, batch2, ey, ex),
                         lambda i, ty, tx: (ty[i], tx[i], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch2, chunk),
                               lambda i, ty, tx: (0, i),
                               memory_space=pltpu.VMEM),
    )
    chunk_vals = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch2, num_chunks * chunk),
                                       jnp.float32),
        interpret=use_interpret(),
    )(binned.chunk_ty, binned.chunk_tx,
      binned.coords.T.reshape(2, num_chunks * chunk), tiles)
    return scatter_chunked(chunk_vals, binned).astype(fine.dtype)

"""Pallas TPU spread kernel (type-1 scatter) — the MXU formulation.

Replaces the reference's atomics-based CUDA spreading
(cc/kernels/nufft_plan.cu.cc:473-650 and the CPU subproblem spreader,
nufft_plan.cc:1463-1734) with a design built for the TPU's strengths:

  1. Points are sorted by fine-grid tile (XLA preprocessing, binning.py).
  2. The kernel walks chunks of sorted points sequentially (TPU Pallas
     grids are sequential). Each chunk belongs to exactly one tile; the
     tile's *extended* (halo-padded) block stays resident in VMEM across
     all of that tile's chunks — the output BlockSpec index is
     data-dependent via scalar prefetch.
  3. Per chunk, the separable ES kernel is evaluated densely into
     windowed kernel matrices A_y[m, ey] = phi(ey - sy_m) and
     A_x[m, ex] = phi(ex - sx_m). The scatter becomes a matmul:
         tile += A_y^T @ (strength ⊙ A_x)
     which runs on the MXU — no atomics, no per-point control flow.
  4. Halos are merged by a deterministic XLA overlap-add (binning.py).

Padded chunk slots carry a far-away sentinel coordinate, making their
kernel weights exactly zero — correctness does not depend on masks or on
the point distribution (the chunk-count bound is static).
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
    gather_chunked,
    overlap_add_2d,
)
from tensorflow_nufft_tpu.plan.plan import NufftPlan

_MXU_PRECISION = jax.lax.Precision.HIGHEST


def use_interpret() -> bool:
    """Interpreter mode off-TPU so the kernels are testable on CPU."""
    try:
        return jax.default_backend() != "tpu"
    except RuntimeError:
        return True


def supports(plan: NufftPlan) -> bool:
    """Pallas path support: 2D, float32 precision (complex64)."""
    return plan.rank == 2 and plan.spec.dtype_name == "complex64"


def es_kernel_matrix(num_offsets: int, s: jax.Array, beta, c, half_width):
    """[C] window centers -> [C, E] matrix phi(e - s_m) over integer
    offsets e in [0, E); exactly zero outside |z| < half_width."""
    offsets = jax.lax.broadcasted_iota(
        jnp.int32, (s.shape[0], num_offsets), 1).astype(jnp.float32)
    z = offsets - s[:, None]
    inside = jnp.abs(z) < half_width
    arg = jnp.where(inside, 1.0 - c * z * z, 0.0)
    return jnp.where(inside, jnp.exp(beta * jnp.sqrt(arg)), 0.0)


def _spread_kernel(
        # scalar prefetch
        ty_ref, tx_ref, first_ref,
        # inputs
        coords_ref, strengths_ref,
        # output
        tile_ref,
        *, beta, c, half_width, tile, pad, batch2):
    i = pl.program_id(0)
    ey = tile[0] + 2 * pad
    ex = tile[1] + 2 * pad

    y0 = (ty_ref[i] * tile[0] - pad).astype(jnp.float32)
    x0 = (tx_ref[i] * tile[1] - pad).astype(jnp.float32)

    sy = coords_ref[0, :] - y0          # [C] in extended-tile units
    sx = coords_ref[1, :] - x0
    a_y = es_kernel_matrix(ey, sy, beta, c, half_width)     # [C, Ey]
    a_x = es_kernel_matrix(ex, sx, beta, c, half_width)     # [C, Ex]

    @pl.when(first_ref[i] == 1)
    def _():
        tile_ref[...] = jnp.zeros_like(tile_ref)

    for b in range(batch2):             # static unroll over channels
        p = a_x * strengths_ref[b, :][:, None]              # [C, Ex]
        contrib = jax.lax.dot_general(
            a_y, p, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_MXU_PRECISION)                        # [Ey, Ex]
        tile_ref[0, 0, b] += contrib


def _spread_tiles(strengths_chunked: jax.Array, binned: BinnedPoints,
                  geom: TileGeometry, plan: NufftPlan) -> jax.Array:
    """[B2, NC*chunk] chunked strengths ->
    [nty, ntx, B2, Ey, Ex] extended tile blocks."""
    batch2 = strengths_chunked.shape[0]
    nty, ntx = geom.tiles
    ey, ex = geom.ext
    chunk = geom.chunk
    num_chunks = geom.num_chunks

    kernel = functools.partial(
        _spread_kernel,
        beta=np.float32(plan.beta), c=np.float32(plan.c),
        half_width=np.float32(plan.half_width),
        tile=geom.tile, pad=geom.pad, batch2=batch2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((2, chunk), lambda i, ty, tx, f: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch2, chunk), lambda i, ty, tx, f: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, batch2, ey, ex),
            lambda i, ty, tx, f: (ty[i], tx[i], 0, 0, 0),
            memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nty, ntx, batch2, ey, ex),
                                       jnp.float32),
        interpret=use_interpret(),
    )(binned.chunk_ty, binned.chunk_tx, binned.chunk_first,
      binned.coords.T.reshape(2, num_chunks * chunk),
      strengths_chunked)


def spread_pallas(strengths: jax.Array, points_resc: jax.Array,
                  plan: NufftPlan) -> jax.Array:
    """[B2, M] real strengths + [M, 2] rescaled points ->
    [B2, nf1, nf2] fine grid. B2 is the folded batch*channel axis."""
    m = points_resc.shape[0]
    geom = choose_geometry(plan.fine_shape, plan.width, m)
    binned = bin_points_2d(points_resc, geom)
    chunked = gather_chunked(strengths, binned, geom)
    tiles = _spread_tiles(chunked.astype(jnp.float32), binned, geom, plan)
    return overlap_add_2d(tiles, geom).astype(strengths.dtype)

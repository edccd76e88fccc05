"""Pallas TPU spread kernel (type-1 scatter) — the MXU formulation.

Replaces the reference's atomics-based CUDA spreading
(cc/kernels/nufft_plan.cu.cc:473-650 and the CPU subproblem spreader,
nufft_plan.cc:1463-1734) with a design built for the TPU's strengths:

  1. Points are grouped by fine-grid tile (XLA preprocessing, binning.py,
     no comparison sort).
  2. The kernel walks chunks of tile-grouped points sequentially (TPU
     Pallas grids are sequential). Each chunk belongs to exactly one
     tile; the tile's *extended* (halo-padded) block stays resident in
     VMEM across all of that tile's chunks — the output BlockSpec index
     is data-dependent via scalar prefetch.
  3. Per chunk, the separable ES kernel is evaluated densely into
     windowed kernel matrices A_d[m, e] = phi(e - s_m^d) per axis. The
     scatter becomes matmuls:
         tile += A_y^T @ (strength ⊙ A_x)            (2D;
     1D is a masked reduce, 3D loops z-planes of the same matmul) —
     MXU work, no atomics, no per-point control flow.
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
    bin_points,
    choose_geometry,
    gather_chunked,
    overlap_add,
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
    """Pallas path support: ranks 1-3, float32 precision (complex64)."""
    return plan.rank in (1, 2, 3) and plan.spec.dtype_name == "complex64"


def es_kernel_matrix(num_offsets: int, s_hi: jax.Array, s_lo: jax.Array,
                     beta, c, half_width):
    """[C] window centers -> [C, E] matrix phi(e - s_m) over integer
    offsets e in [0, E); exactly zero outside |z| < half_width. The
    center is the two-float pair (s_hi, s_lo) so the kernel argument
    keeps full coordinate precision (see fold_and_rescale_split)."""
    offsets = jax.lax.broadcasted_iota(
        jnp.int32, (s_hi.shape[0], num_offsets), 1).astype(jnp.float32)
    z = (offsets - s_hi[:, None]) - s_lo[:, None]
    inside = jnp.abs(z) < half_width
    arg = jnp.where(inside, 1.0 - c * z * z, 0.0)
    return jnp.where(inside, jnp.exp(beta * jnp.sqrt(arg)), 0.0)


def _kernel_matrices(coords_ref, tidx_refs, i, geom: TileGeometry,
                     beta, c, half_width):
    """Per-axis windowed kernel matrices for the current chunk."""
    rank = geom.rank
    mats = []
    for d in range(rank):
        origin = (tidx_refs[d][i] * geom.tile[d] - geom.pad).astype(
            jnp.float32)
        s_hi = coords_ref[d, :] - origin
        s_lo = coords_ref[rank + d, :]
        mats.append(es_kernel_matrix(
            geom.ext[d], s_hi, s_lo, beta, c, half_width))
    return mats


def _spread_kernel(*refs, geom: TileGeometry, beta, c, half_width,
                   batch2):
    rank = geom.rank
    tidx_refs = refs[:rank]
    first_ref = refs[rank]
    coords_ref, strengths_ref = refs[rank + 1], refs[rank + 2]
    tile_ref = refs[rank + 3]
    i = pl.program_id(0)

    mats = _kernel_matrices(coords_ref, tidx_refs, i, geom, beta, c,
                            half_width)

    @pl.when(first_ref[i] == 1)
    def _():
        tile_ref[...] = jnp.zeros_like(tile_ref)

    for b in range(batch2):             # static unroll over channels
        s_b = strengths_ref[b, :][:, None]
        if rank == 1:
            contrib = jnp.sum(mats[0] * s_b, axis=0)
            tile_ref[0, b, :] += contrib
        elif rank == 2:
            p = mats[1] * s_b                               # [C, Ex]
            contrib = jax.lax.dot_general(
                mats[0], p, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_MXU_PRECISION)                    # [Ey, Ex]
            tile_ref[0, 0, b] += contrib
        else:
            p = mats[2] * s_b                               # [C, Ex]
            for ez in range(geom.ext[0]):   # z-planes, static unroll
                w = mats[1] * mats[0][:, ez][:, None]       # [C, Ey]
                contrib = jax.lax.dot_general(
                    w, p, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_MXU_PRECISION)                # [Ey, Ex]
                tile_ref[0, 0, 0, b, ez] += contrib


def _index_maps(geom: TileGeometry, batch2: int):
    """(in_specs, out_spec) with data-dependent tile indexing."""
    rank = geom.rank
    chunk = geom.chunk

    def coords_map(i, *refs):
        return (0, i)

    def strengths_map(i, *refs):
        return (0, i)

    def out_map(i, *refs):
        tidx = refs[:rank]
        return tuple(t[i] for t in tidx) + (0,) * (rank + 1)

    in_specs = [
        pl.BlockSpec((2 * rank, chunk), coords_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((batch2, chunk), strengths_map,
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec(
        (1,) * rank + (batch2,) + geom.ext, out_map,
        memory_space=pltpu.VMEM)
    return in_specs, out_spec


def _spread_tiles(strengths_chunked: jax.Array, binned: BinnedPoints,
                  geom: TileGeometry, plan: NufftPlan) -> jax.Array:
    """[B2, NC*chunk] chunked strengths ->
    [*tiles, B2, *ext] extended tile blocks."""
    batch2 = strengths_chunked.shape[0]
    rank = geom.rank

    kernel = functools.partial(
        _spread_kernel,
        geom=geom,
        beta=np.float32(plan.beta), c=np.float32(plan.c),
        half_width=np.float32(plan.half_width),
        batch2=batch2)

    in_specs, out_spec = _index_maps(geom, batch2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=rank + 1,       # tile indices + first flag
        grid=(geom.num_chunks,),
        in_specs=in_specs,
        out_specs=out_spec,
    )
    out_shape = jax.ShapeDtypeStruct(
        geom.tiles + (batch2,) + geom.ext, jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=use_interpret(),
    )(*binned.chunk_tidx, binned.chunk_first,
      binned.coords, strengths_chunked)


def num_points_of(points_resc) -> int:
    """M from a coords array or a two-float (hi, lo) pair."""
    if isinstance(points_resc, tuple):
        return points_resc[0].shape[0]
    return points_resc.shape[0]


def spread_pallas(strengths: jax.Array, points_resc,
                  plan: NufftPlan) -> jax.Array:
    """[B2, M] real strengths + [M, rank] rescaled points (or (hi, lo)
    pair) -> [B2, *fine_shape] fine grid. B2 is the folded batch*channel
    axis."""
    m = num_points_of(points_resc)
    geom = choose_geometry(plan.fine_shape, plan.width, m)
    binned = bin_points(points_resc, geom)
    chunked = gather_chunked(strengths, binned, geom)
    tiles = _spread_tiles(chunked.astype(jnp.float32), binned, geom, plan)
    return overlap_add(tiles, geom).astype(strengths.dtype)

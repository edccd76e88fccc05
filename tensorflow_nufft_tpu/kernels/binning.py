"""Tile binning for the Pallas spread/interp kernels (XLA preprocessing).

TPU has no scatter atomics, so the Pallas kernels use *tile-exclusive*
accumulation: points are assigned to fine-grid tiles, the kernel visits
tiles sequentially (TPU Pallas grids are sequential), and each tile's
extended (halo-padded) block is owned by exactly one run of programs.
Halos are then combined by a deterministic XLA overlap-add with periodic
wrap.

This replaces the reference's counting sorts + subproblem decomposition
(cc/kernels/nufft_plan.cc:432-652, nufft_plan.cu.cc:159-320,2896-3032)
with a design that is overflow-free under static shapes: the point
stream, grouped by tile, is padded at tile boundaries up to a multiple of
the chunk size, giving at most ``M // chunk + num_tiles`` chunks — a
static bound that holds for any point distribution. No comparison sort is
used (tile ranks come from a one-hot prefix sum), and data movement is
expressed as gathers (TPU gathers are far cheaper than scatters; a single
small int32 scatter builds the inverse map).

Supports ranks 1, 2 and 3.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Sentinel coordinate for padded slots: far outside any tile, so kernel
# weights evaluate to exactly zero.
SENTINEL = -1.0e6

# Rough VMEM budget for one extended tile block (elements, per channel
# pair): keeps ext blocks ~<=1 MB f32.
_EXT_BLOCK_BUDGET = 160 * 160


@dataclasses.dataclass(frozen=True)
class TileGeometry:
    """Static tiling parameters (any rank)."""
    fine_shape: Tuple[int, ...]
    tile: Tuple[int, ...]          # core tile dims (divide fine dims)
    pad: int                       # halo on each side
    chunk: int                     # points per kernel invocation
    num_chunks: int                # static chunk-count bound

    @property
    def rank(self) -> int:
        return len(self.fine_shape)

    @property
    def tiles(self) -> Tuple[int, ...]:
        return tuple(nf // t for nf, t in zip(self.fine_shape, self.tile))

    @property
    def num_tiles(self) -> int:
        return int(np.prod(self.tiles))

    @property
    def ext(self) -> Tuple[int, ...]:
        """Extended (halo-padded) tile dims."""
        return tuple(t + 2 * self.pad for t in self.tile)


_TILE_PREFS = {
    1: (1024, 768, 512, 1280, 256, 1536, 2048, 128, 64, 32, 16),
    2: (128, 160, 96, 192, 256, 64, 320, 32, 16),
    3: (32, 40, 48, 64, 24, 16, 80, 96, 128, 8, 10, 12),
}
# Leading (sublane-ish) axis of 3D tiles can be small.
_TILE_PREFS_3D_LEAD = (8, 16, 10, 12, 4, 24, 32, 6, 40, 64, 2)


# Process-wide tuning overrides (benchmarking/experiments). Keys:
# 'chunk', 'tile_pref'. Values of 0 mean auto.
_GEOMETRY_OVERRIDES = {"chunk": 0, "tile_pref": 0}


def set_geometry_overrides(chunk: int = 0, tile_pref: int = 0) -> None:
    """Overrides automatic chunk/tile selection (0 = auto). Affects
    subsequent traces only."""
    _GEOMETRY_OVERRIDES["chunk"] = chunk
    _GEOMETRY_OVERRIDES["tile_pref"] = tile_pref


def choose_geometry(fine_shape: Sequence[int], width: int,
                    num_points: int, chunk: int = 0,
                    tile_pref: int = 0) -> TileGeometry:
    """Picks tile dims that divide the fine grid and a chunk size.

    The halo must cover the kernel footprint: a point owned by a tile can
    touch indices down to ceil(s - w/2) >= tile_start - (w//2 + 1), so
    pad = width//2 + 1; bands in the overlap-add need tile >= 2*pad.

    Chunk-size tradeoff (measured on v5e): each kernel program has a few
    microseconds of fixed overhead, so chunks should be large; but the
    per-tile padding waste is bounded by num_tiles * chunk points, so
    chunks should stay a fraction of num_points / num_tiles.
    """
    fine_shape = tuple(int(n) for n in fine_shape)
    chunk = chunk or _GEOMETRY_OVERRIDES["chunk"]
    tile_pref = tile_pref or _GEOMETRY_OVERRIDES["tile_pref"]
    rank = len(fine_shape)
    pad = width // 2 + 1
    tile = []
    for d, nf in enumerate(fine_shape):
        if rank == 3 and d == 0:
            prefs = _TILE_PREFS_3D_LEAD
        else:
            prefs = _TILE_PREFS[rank]
        prefs = ((tile_pref,) if tile_pref else ()) + prefs
        t = nf
        for cand in prefs:
            if cand and nf % cand == 0 and cand >= 2 * pad:
                t = cand
                break
        tile.append(t)
    tile = tuple(tile)
    num_tiles = int(np.prod([nf // t for nf, t in zip(fine_shape, tile)]))
    if chunk == 0:
        # Aim for ~25% padding waste worst-case, in [256, 2048].
        target = max(num_points // (4 * num_tiles), 1)
        chunk = int(min(2048, max(256, 2 ** int(np.ceil(np.log2(target))))))
    # Keep the per-chunk kernel matrices within a VMEM budget (~2 MB):
    # they have chunk * sum(ext) float32 elements.
    sum_ext = sum(t + 2 * pad for t in tile)
    vmem_cap = max(256, ((2 << 20) // (4 * sum_ext)) // 256 * 256)
    chunk = min(chunk, vmem_cap)
    chunk = min(chunk, max(64, int(np.ceil(num_points / 64)) * 64))
    num_chunks = num_points // chunk + num_tiles
    return TileGeometry(fine_shape, tile, pad, chunk, num_chunks)


class BinnedPoints(NamedTuple):
    """Tile-ordered, chunk-padded point metadata (a pytree)."""
    coords: jax.Array       # [2*rank, NC*chunk]: hi rows then lo rows
    inv: jax.Array          # [num_chunks * chunk] original index (M=pad)
    padpos: jax.Array       # [M] slot of each point in the padded stream
    chunk_tidx: Tuple[jax.Array, ...]  # per-axis tile index per chunk
    chunk_first: jax.Array  # [num_chunks] 1 if first chunk of its tile


def bin_points(points_resc, geom: TileGeometry) -> BinnedPoints:
    """Groups points by tile and builds the padded chunk stream.

    Args:
        points_resc: coordinates in fine-grid units ([0, nf)): a
            [M, rank] array or a two-float (hi, lo) pair (see
            ``xla_ops.fold_and_rescale_split``; the low word restores
            full coordinate precision inside the kernels).
        geom: static tiling.

    Returns:
        BinnedPoints with static shapes independent of the distribution.
    """
    if isinstance(points_resc, tuple):
        points_hi, points_lo = points_resc
    else:
        points_hi = points_resc
        points_lo = jnp.zeros_like(points_resc)
    m = points_hi.shape[0]
    rank = geom.rank
    tiles = geom.tiles
    num_tiles = geom.num_tiles
    chunk = geom.chunk
    num_chunks = geom.num_chunks

    tidx = []
    for d in range(rank):
        td = jnp.clip(
            (points_hi[:, d] // geom.tile[d]).astype(jnp.int32),
            0, tiles[d] - 1)
        tidx.append(td)
    tid = tidx[0]
    for d in range(1, rank):
        tid = tid * tiles[d] + tidx[d]

    # Rank of each point within its tile via one-hot prefix sum (no
    # comparison sort); associative_scan gives the log-depth lowering.
    onehot = (tid[:, None] ==
              jnp.arange(num_tiles, dtype=jnp.int32)[None, :]
              ).astype(jnp.int32)
    cum = jax.lax.associative_scan(jnp.add, onehot, axis=0)  # inclusive
    rank_in_tile = jnp.take_along_axis(cum, tid[:, None], axis=1)[:, 0] - 1
    counts = cum[-1]

    # Every tile gets at least one chunk (so its output block is zeroed).
    rounds = jnp.maximum((counts + chunk - 1) // chunk, 1)
    chunk_starts = jnp.concatenate(
        [jnp.zeros((1,), rounds.dtype), jnp.cumsum(rounds)[:-1]])

    padpos = chunk_starts[tid].astype(jnp.int32) * chunk + rank_in_tile

    # Inverse map: padded slot -> original point index (m = pad slot).
    inv = jnp.full((num_chunks * chunk,), m, dtype=jnp.int32)
    inv = inv.at[padpos].set(jnp.arange(m, dtype=jnp.int32))

    coords_ext = jnp.concatenate([
        jnp.concatenate(
            [points_hi.T,
             jnp.full((rank, 1), SENTINEL, points_hi.dtype)], axis=1),
        jnp.concatenate(
            [points_lo.T, jnp.zeros((rank, 1), points_lo.dtype)],
            axis=1),
    ], axis=0)                                           # [2r, M+1]
    coords = coords_ext[:, inv]                          # gather

    # Chunk -> tile mapping; chunks beyond the used range attach to the
    # last used tile (contiguous run, so no spurious re-initialization).
    chunk_ids = jnp.arange(num_chunks, dtype=jnp.int32)
    chunk_tile = jnp.searchsorted(
        chunk_starts.astype(jnp.int32), chunk_ids, side="right") - 1
    chunk_tile = jnp.clip(chunk_tile, 0, num_tiles - 1)
    chunk_first = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (chunk_tile[1:] != chunk_tile[:-1]).astype(jnp.int32)])

    chunk_tidx = []
    rem = chunk_tile
    for d in range(rank - 1, -1, -1):
        chunk_tidx.append((rem % tiles[d]).astype(jnp.int32))
        rem = rem // tiles[d]
    chunk_tidx = tuple(reversed(chunk_tidx))

    return BinnedPoints(
        coords=coords,
        inv=inv,
        padpos=padpos,
        chunk_tidx=chunk_tidx,
        chunk_first=chunk_first,
    )


def gather_chunked(values: jax.Array, binned: BinnedPoints,
                   geom: TileGeometry) -> jax.Array:
    """[..., M] per-point values -> padded chunk stream [..., NC*chunk],
    zero-filled in padded slots (pure gather)."""
    del geom
    pad_col = jnp.zeros(values.shape[:-1] + (1,), values.dtype)
    ext = jnp.concatenate([values, pad_col], axis=-1)
    return ext[..., binned.inv]


def scatter_chunked(values: jax.Array, binned: BinnedPoints
                    ) -> jax.Array:
    """Padded chunk stream [..., NC*chunk] -> original order [..., M]
    (pure gather via padpos)."""
    return values[..., binned.padpos]


def _collapse_axis(x: jax.Array, tile_ax: int, ext_ax: int, t: int,
                   pad: int) -> jax.Array:
    """Folds one extended axis: core band plus periodically-wrapped halo
    contributions from neighbor tiles (roll over the tile axis)."""
    x = jnp.moveaxis(x, (tile_ax, ext_ax), (0, 1))       # [nt, E, ...]
    left = jnp.roll(x[:, :pad], -1, axis=0)
    right = jnp.roll(x[:, t + pad:], 1, axis=0)
    core = jnp.concatenate([
        x[:, pad:2 * pad] + right,
        x[:, 2 * pad:t],
        x[:, t:t + pad] + left,
    ], axis=1)                                           # [nt, t, ...]
    return jnp.moveaxis(core, (0, 1), (tile_ax, ext_ax))


def overlap_add(tiles: jax.Array, geom: TileGeometry) -> jax.Array:
    """Combines per-tile extended blocks into the full fine grid.

    Args:
        tiles: [*tiles, B, *ext] per-tile extended outputs.

    Returns:
        [B, *fine_shape] with halos wrapped periodically (the role of the
        reference's add_wrapped_subgrid, nufft_plan.cc:1638-1734 — but
        deterministic slicing/rolls instead of atomics).
    """
    rank = geom.rank
    x = tiles
    for d in range(rank):
        x = _collapse_axis(x, d, rank + 1 + d, geom.tile[d], geom.pad)
    # [nt_0.., B, t_0..] -> [B, nt_0, t_0, ...] -> [B, *fine]
    perm = [rank]
    for d in range(rank):
        perm.extend([d, rank + 1 + d])
    x = jnp.transpose(x, perm)
    batch = x.shape[0]
    return x.reshape((batch,) + geom.fine_shape)


def extend_tiles(fine: jax.Array, geom: TileGeometry) -> jax.Array:
    """Full fine grid [B, *fine] -> per-tile extended blocks
    [*tiles, B, *ext] (inverse companion of overlap_add; used by the
    interp kernel to give each tile its halo)."""
    rank = geom.rank
    pad = geom.pad
    x = fine
    # Periodic pad along each spatial axis.
    for d in range(rank):
        ax = 1 + d
        lo = jax.lax.slice_in_dim(
            x, x.shape[ax] - pad, x.shape[ax], axis=ax)
        hi = jax.lax.slice_in_dim(x, 0, pad, axis=ax)
        x = jnp.concatenate([lo, x, hi], axis=ax)
    # Per axis: stack nt windows of length E (unrolled slices; tile
    # counts are small and XLA fuses the slices).
    for d in range(rank):
        ax = 1 + 2 * d     # current spatial axis position in x
        nt = geom.tiles[d]
        t = geom.tile[d]
        e = t + 2 * pad
        windows = [
            jax.lax.slice_in_dim(x, i * t, i * t + e, axis=ax)
            for i in range(nt)]
        x = jnp.stack(windows, axis=ax)   # [..., nt, E, ...]
    # x: [B, nt_0, E_0, nt_1, E_1, ...] -> [nt_0.., B, E_0..]
    perm = [1 + 2 * d for d in range(rank)] + [0] + \
        [2 + 2 * d for d in range(rank)]
    return jnp.transpose(x, perm)

"""Tile binning for the Pallas spread/interp kernels (XLA preprocessing).

TPU has no scatter atomics, so the Pallas kernels use *tile-exclusive*
accumulation: points are sorted by fine-grid tile, the kernel visits tiles
sequentially (TPU Pallas grids are sequential), and each tile's extended
(halo-padded) block is owned by exactly one run of programs. Halos are
then combined by a deterministic XLA overlap-add with periodic wrap.

This replaces the reference's counting sorts + subproblem decomposition
(cc/kernels/nufft_plan.cc:432-652, nufft_plan.cu.cc:159-320,2896-3032)
with a design that is overflow-free under static shapes: the sorted point
stream is padded at tile boundaries up to a multiple of the chunk size,
giving at most ``M // chunk + num_tiles`` chunks — a static bound that
holds for any point distribution.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Sentinel coordinate for padded slots: far outside any tile, so kernel
# weights evaluate to exactly zero.
SENTINEL = -1.0e6


@dataclasses.dataclass(frozen=True)
class TileGeometry:
    """Static 2D tiling parameters."""
    fine_shape: Tuple[int, int]
    tile: Tuple[int, int]          # core tile dims (divide fine dims)
    pad: int                       # halo on each side
    chunk: int                     # points per kernel invocation
    num_chunks: int                # static chunk-count bound

    @property
    def tiles(self) -> Tuple[int, int]:
        return (self.fine_shape[0] // self.tile[0],
                self.fine_shape[1] // self.tile[1])

    @property
    def num_tiles(self) -> int:
        t = self.tiles
        return t[0] * t[1]

    @property
    def ext(self) -> Tuple[int, int]:
        """Extended (halo-padded) tile dims."""
        return (self.tile[0] + 2 * self.pad, self.tile[1] + 2 * self.pad)


def choose_geometry(fine_shape, width: int, num_points: int,
                    chunk: int = 0, tile_pref: int = 0) -> TileGeometry:
    """Picks tile dims that divide the fine grid and a chunk size.

    The halo must cover the kernel footprint: a point owned by a tile can
    touch indices down to ceil(s - w/2) >= tile_start - (w//2 + 1).

    Chunk-size tradeoff (measured on v5e): each kernel program has a few
    microseconds of fixed overhead, so chunks should be large; but the
    per-tile padding waste is bounded by num_tiles * chunk points, so
    chunks should stay a fraction of num_points / num_tiles.
    """
    pad = width // 2 + 1
    tiles = []
    prefs = (tile_pref,) if tile_pref else ()
    for nf in fine_shape:
        t = nf
        for cand in prefs + (128, 160, 96, 192, 256, 64, 320, 32, 16):
            if cand and nf % cand == 0 and cand >= 2 * pad:
                t = cand
                break
        tiles.append(t)
    tile = tuple(tiles)
    num_tiles = (fine_shape[0] // tile[0]) * (fine_shape[1] // tile[1])
    if chunk == 0:
        # Aim for ~25% padding waste worst-case, in [256, 2048].
        target = max(num_points // (4 * num_tiles), 1)
        chunk = int(min(2048, max(256, 2 ** int(np.ceil(np.log2(target))))))
    chunk = min(chunk, max(64, int(np.ceil(num_points / 64)) * 64))
    num_chunks = num_points // chunk + num_tiles
    return TileGeometry(tuple(fine_shape), tile, pad, chunk, num_chunks)


class BinnedPoints(NamedTuple):
    """Tile-ordered, chunk-padded point metadata (a pytree).

    No comparison sort is used: each point's rank within its tile comes
    from a one-hot cumulative sum, and data movement into tile order is
    expressed as gathers via the inverse map ``inv`` (TPU gathers are far
    cheaper than scatters; only one small int32 scatter builds ``inv``).
    """
    coords: jax.Array       # [num_chunks * chunk, 2] fine-grid units
    inv: jax.Array          # [num_chunks * chunk] original index (M=pad)
    padpos: jax.Array       # [M] slot of each point in the padded stream
    chunk_ty: jax.Array     # [num_chunks] tile row of each chunk
    chunk_tx: jax.Array     # [num_chunks] tile col of each chunk
    chunk_first: jax.Array  # [num_chunks] 1 if first chunk of its tile


def bin_points_2d(points_resc: jax.Array, geom: TileGeometry
                  ) -> BinnedPoints:
    """Sorts points by tile and builds the padded chunk stream.

    Args:
        points_resc: [M, 2] coordinates in fine-grid units ([0, nf)).
        geom: static tiling.

    Returns:
        BinnedPoints with static shapes independent of the distribution.
    """
    m = points_resc.shape[0]
    nty, ntx = geom.tiles
    num_tiles = geom.num_tiles
    chunk = geom.chunk
    num_chunks = geom.num_chunks

    ty = jnp.clip((points_resc[:, 0] // geom.tile[0]).astype(jnp.int32),
                  0, nty - 1)
    tx = jnp.clip((points_resc[:, 1] // geom.tile[1]).astype(jnp.int32),
                  0, ntx - 1)
    tid = ty * ntx + tx

    # Rank of each point within its tile via one-hot prefix sum (no
    # comparison sort). associative_scan gives the log-depth lowering.
    onehot = (tid[:, None] ==
              jnp.arange(num_tiles, dtype=jnp.int32)[None, :]
              ).astype(jnp.int32)
    cum = jax.lax.associative_scan(jnp.add, onehot, axis=0)  # inclusive
    rank = jnp.take_along_axis(cum, tid[:, None], axis=1)[:, 0] - 1
    counts = cum[-1]

    # Every tile gets at least one chunk (so its output block is zeroed).
    rounds = jnp.maximum((counts + chunk - 1) // chunk, 1)
    chunk_starts = jnp.concatenate(
        [jnp.zeros((1,), rounds.dtype), jnp.cumsum(rounds)[:-1]])

    padpos = chunk_starts[tid].astype(jnp.int32) * chunk + rank

    # Inverse map: padded slot -> original point index (m = padded slot).
    inv = jnp.full((num_chunks * chunk,), m, dtype=jnp.int32)
    inv = inv.at[padpos].set(jnp.arange(m, dtype=jnp.int32))

    coords_ext = jnp.concatenate(
        [points_resc,
         jnp.full((1, 2), SENTINEL, points_resc.dtype)], axis=0)
    coords = coords_ext[inv]                             # gather

    # Chunk -> tile mapping; chunks beyond the used range attach to the
    # last used tile (contiguous run, so no spurious re-initialization).
    chunk_ids = jnp.arange(num_chunks, dtype=jnp.int32)
    chunk_tile = jnp.searchsorted(
        chunk_starts.astype(jnp.int32), chunk_ids, side="right") - 1
    chunk_tile = jnp.clip(chunk_tile, 0, num_tiles - 1)
    chunk_first = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (chunk_tile[1:] != chunk_tile[:-1]).astype(jnp.int32)])
    return BinnedPoints(
        coords=coords,
        inv=inv,
        padpos=padpos,
        chunk_ty=(chunk_tile // ntx).astype(jnp.int32),
        chunk_tx=(chunk_tile % ntx).astype(jnp.int32),
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


def overlap_add_2d(tiles: jax.Array, geom: TileGeometry) -> jax.Array:
    """Combines per-tile extended blocks into the full fine grid.

    Args:
        tiles: [nty, ntx, B, Ey, Ex] per-tile extended outputs.

    Returns:
        [B, nf1, nf2] with halos wrapped periodically (the role of the
        reference's add_wrapped_subgrid, nufft_plan.cc:1638-1734 — but
        deterministic slicing/rolls instead of atomics).
    """
    nty, ntx = geom.tiles
    t0, t1 = geom.tile
    pad = geom.pad
    # Collapse x: core + left halo into previous tile's tail + right halo
    # into next tile's head (roll over the tile axis = periodic wrap).
    # Concatenation of adjusted bands (not .at[].add) so XLA fuses it.
    left = jnp.roll(tiles[..., :pad], -1, axis=1)
    right = jnp.roll(tiles[..., t1 + pad:], 1, axis=1)
    core = jnp.concatenate([
        tiles[..., pad:2 * pad] + right,
        tiles[..., 2 * pad:t1],
        tiles[..., t1:t1 + pad] + left,
    ], axis=-1)
    # Collapse y likewise.
    top = jnp.roll(core[..., :pad, :], -1, axis=0)
    bot = jnp.roll(core[..., t0 + pad:, :], 1, axis=0)
    mid = jnp.concatenate([
        core[..., pad:2 * pad, :] + bot,
        core[..., 2 * pad:t0, :],
        core[..., t0:t0 + pad, :] + top,
    ], axis=-2)
    # [nty, ntx, B, t0, t1] -> [B, nf1, nf2]
    out = jnp.moveaxis(mid, 2, 0)            # [B, nty, ntx, t0, t1]
    out = jnp.swapaxes(out, 2, 3)            # [B, nty, t0, ntx, t1]
    return out.reshape(out.shape[0], nty * t0, ntx * t1)


def extend_tiles_2d(fine: jax.Array, geom: TileGeometry) -> jax.Array:
    """Full fine grid [B, nf1, nf2] -> per-tile extended blocks
    [nty, ntx, B, Ey, Ex] (inverse companion of overlap_add_2d; used by
    the interp kernel to give each tile its halo)."""
    nty, ntx = geom.tiles
    t0, t1 = geom.tile
    pad = geom.pad
    b = fine.shape[0]
    # Periodic pad then window: rows/cols [tile_start - pad,
    # tile_start + t + pad).
    padded = jnp.concatenate(
        [fine[:, -pad:, :], fine, fine[:, :pad, :]], axis=1)
    padded = jnp.concatenate(
        [padded[:, :, -pad:], padded, padded[:, :, :pad]], axis=2)
    # Window (ty, tx) starts at (ty*t0, tx*t1) in the padded array.
    ey, ex = geom.ext
    # Build via dynamic slicing per tile row/col is O(ntiles) python ops —
    # acceptable (tile counts are small) and fuses under XLA.
    rows = []
    for ty in range(nty):
        cols = []
        for tx in range(ntx):
            cols.append(jax.lax.dynamic_slice(
                padded, (0, ty * t0, tx * t1), (b, ey, ex)))
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)           # [nty, ntx, B, Ey, Ex]

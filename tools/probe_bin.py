"""Isolate the 520 s bin_points execution at 3D 800k scale."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tensorflow_nufft_tpu.kernels import binning
from tensorflow_nufft_tpu.kernels.binning import _SEGMENT
from tensorflow_nufft_tpu.kernels.xla_ops import fold_and_rescale_split
from tensorflow_nufft_tpu.plan.plan import PlanSpec, make_plan

M = 800_000
GRID = (128, 128, 128)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def t_scalar(name, fn, *args):
    """Times a jitted fn whose output is reduced to one scalar."""
    f = jax.jit(lambda *a: jax.tree.reduce(
        lambda x, y: x + y, jax.tree.map(lambda v: jnp.sum(
            v.astype(jnp.float32)), fn(*a))))
    t0 = time.perf_counter()
    r = np.asarray(f(*args))
    t1 = time.perf_counter()
    best = 1e9
    for _ in range(2):
        t2 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, time.perf_counter() - t2)
    log(f"{name}: first {t1-t0:6.1f}s  steady {best*1e3:8.1f} ms "
        f"(scalar {float(r):.3g})")


def main():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(
        rng.uniform(-np.pi, np.pi, (M, 3)).astype(np.float32))
    spec = PlanSpec("type_1", "forward", 3, GRID, "complex64", 1e-6, 0)
    plan = make_plan(spec)
    geom = binning.choose_geometry(plan.fine_shape, plan.width, M)
    num_tiles, chunk = geom.num_tiles, geom.chunk
    log(f"tile={geom.tile} chunk={chunk} T={num_tiles} "
        f"NC={geom.num_chunks}")
    hi, lo = fold_and_rescale_split(pts, plan.fine_shape, 0)
    hi = jnp.asarray(hi)

    def tids(h):
        tidx = []
        for d in range(3):
            tidx.append(jnp.clip((h[:, d] // geom.tile[d]).astype(
                jnp.int32), 0, geom.tiles[d] - 1))
        t = tidx[0]
        for d in range(1, 3):
            t = t * geom.tiles[d] + tidx[d]
        return t

    t_scalar("tid compute", tids, hi)
    tid = jax.jit(tids)(hi)

    s = _SEGMENT
    g = -(-M // s)
    tid3 = tid.reshape(g, s)

    def rank_seg(t3):
        eq = (t3[:, :, None] == t3[:, None, :])
        lower = (jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
                 < jax.lax.broadcasted_iota(jnp.int32, (s, s), 1))
        return jnp.sum((eq & lower[None]).astype(jnp.int32), axis=1)

    t_scalar("rank_in_seg [G,S,S]", rank_seg, tid3)

    def hist(t3):
        seg_id = jax.lax.broadcasted_iota(jnp.int32, (g, s), 0)
        flat_idx = (seg_id * (num_tiles + 1)
                    + t3.astype(jnp.int32)).reshape(g * s)
        return jnp.zeros((g * (num_tiles + 1),), jnp.float32
                         ).at[flat_idx].add(1.0)

    t_scalar("histogram scatter-add", hist, tid3)

    def scan_part(t3):
        sc = hist(t3).reshape(g, num_tiles + 1)
        cum = jax.lax.associative_scan(jnp.add, sc, axis=0)
        return cum

    t_scalar("  + assoc scan [G,T+1]", scan_part, tid3)

    def gathers(t3):
        sc = hist(t3).reshape(g, num_tiles + 1)
        cum = jax.lax.associative_scan(jnp.add, sc, axis=0)
        seg_prefix = cum - sc
        counts_f = cum[-1]
        rounds = jnp.maximum(jnp.ceil(counts_f / chunk), 1.0)
        chunk_starts_f = jnp.cumsum(rounds) - rounds
        seg_id = jax.lax.broadcasted_iota(jnp.int32, (g, s), 0)
        flat_idx = (seg_id * (num_tiles + 1)
                    + t3.astype(jnp.int32)).reshape(g * s)
        p = seg_prefix.reshape(g * (num_tiles + 1))[flat_idx]
        cb = (chunk_starts_f * chunk)[t3.reshape(g * s)]
        return p, cb

    t_scalar("  + table gathers", gathers, tid3)

    t_scalar("ranks_and_starts full",
             lambda t: binning._ranks_and_starts(t, num_tiles, chunk),
             tid)

    def invpos_part(t):
        rank, counts, chunk_base, chunk_starts = \
            binning._ranks_and_starts(t, num_tiles, chunk)
        padpos = chunk_base + rank
        invpos = jnp.full((geom.num_chunks * chunk,), M, jnp.int32)
        return invpos.at[padpos].set(jnp.arange(M, dtype=jnp.int32),
                                     unique_indices=True)

    t_scalar("  + padpos/invpos scatter", invpos_part, tid)

    def searchsorted_part(t):
        _, _, _, chunk_starts = binning._ranks_and_starts(
            t, num_tiles, chunk)
        chunk_ids = jnp.arange(geom.num_chunks, dtype=jnp.int32)
        ct = jnp.searchsorted(chunk_starts.astype(jnp.int32),
                              chunk_ids, side="right") - 1
        return ct

    t_scalar("  + searchsorted chunk->tile", searchsorted_part, tid)

    t_scalar("bin_points full",
             lambda h: binning.bin_points(h, geom), hi)


if __name__ == "__main__":
    main()

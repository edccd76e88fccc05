"""Type-3 stage attribution (VERDICT r4 item 5).

Splits the planned 2D type-3 apply (200k -> 200k, t_range 64; suite row
2d_t3_200k_200k = 16.99 ms) into its pipeline stages, and the 3D case
(500k -> 500k, t_range 16; 13.81 ms planned / 20.57 unplanned):

  prephase   : pmul(src, prephase) + channel-major fold
  spread     : outer ES spread onto the type-3 fine grid (Pallas tiles
               + overlap_add)
  inner_pre  : inner type-2 amplify + mode-DFT onto extended tiles
  inner_interp : inner type-2 Pallas interp (+ un-permute gather)
  postphase  : pmul with the target postphase
  full       : op(src)

Stages accumulate (each timed fn runs the pipeline up to that stage),
so the marginal attribution is the difference between rows.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import tensorflow_nufft_tpu as tfft                     # noqa: E402
from tensorflow_nufft_tpu.planar import pmul            # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def marginal(stage_fn, label, x, k1, k2):
    def make(k):
        @jax.jit
        def f(v):
            def body(i, acc):
                out = stage_fn(v + 1e-3 * jnp.sin(
                    v * i.astype(jnp.float32)))
                out = jax.lax.optimization_barrier(out)
                return acc + out.ravel()[0]
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    def timed(f):
        np.asarray(f(x))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(f(x))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, tk = timed(make(k1)), timed(make(k2))
    per = max((tk - t1) / (k2 - k1), 1e-9)
    log(f"{label:30s}: {per * 1e3:9.3f} ms")
    return per


def split_case(rank, m, k_targets, t_range, k1, k2):
    rng = np.random.default_rng(7)
    x = rng.uniform(-np.pi, np.pi, (m, rank)).astype(np.float32)
    t = rng.uniform(-t_range, t_range,
                    (k_targets, rank)).astype(np.float32)
    z = (rng.standard_normal(m) + 1j * rng.standard_normal(m))
    src = jnp.asarray(np.stack(
        [z.real, z.imag], axis=-1).astype(np.float32))[None]
    op = tfft.planar.Type3Plan(x, t)
    i2 = op._inner_t2
    log(f"--- rank {rank}: m={m} k={k_targets} t_range={t_range:g} "
        f"fine={op.fine_shape} spread_level={op._spread_level} "
        f"inner_level={i2._level} inner_geom tile={i2.geom.tile} "
        f"chunk={i2.geom.chunk}")

    from tensorflow_nufft_tpu.kernels.pallas_spread import (
        overlap_add, spread_pallas_tiles)
    from tensorflow_nufft_tpu.fft.planar_fft import (
        amplify_pad_dft_tiled)
    from tensorflow_nufft_tpu.kernels.pallas_interp import (
        interp_pallas_tiled)

    batch = 1

    def pre(s):
        sp = pmul(s, op._prephase)
        return jnp.moveaxis(sp, -1, 1).reshape(2 * batch, m)

    def spread(s):
        cm = pre(s)
        tiles, _ = spread_pallas_tiles(
            cm, op._points_resc, op._spread_plan, binned=op.binned,
            mats=op.mats, coords=op.coords, geom=op.geom)
        fine = overlap_add(tiles, op.geom)
        return jnp.moveaxis(
            fine.reshape((batch, 2) + op.fine_shape), 1, -1)

    def inner_pre(s):
        grid = spread(s)
        return amplify_pad_dft_tiled(grid, i2.plan, i2.geom)

    def inner_interp(s):
        tiles = inner_pre(s)
        values = interp_pallas_tiled(
            tiles, i2.points_resc, i2.plan, i2.geom, binned=i2.binned,
            mats=i2.mats, coords=i2.coords, band_info=i2.band_info)
        split = values.reshape(batch, 2, k_targets)
        return jnp.moveaxis(split, 1, -1)

    def post(s):
        return pmul(inner_interp(s), op._postphase)

    marginal(pre, "prephase+fold", src, k1, k2)
    marginal(spread, "+ outer spread", src, k1, k2)
    marginal(inner_pre, "+ inner amplify/DFT", src, k1, k2)
    marginal(inner_interp, "+ inner interp", src, k1, k2)
    marginal(post, "+ postphase", src, k1, k2)
    marginal(lambda s: op(s), "full planned t3", src, k1, k2)


split_case(2, 200_000, 200_000, 64.0, 2, 14)
split_case(3, 500_000, 500_000, 16.0, 1, 7)

"""Bisect the planned 2D type-2 pipeline (256^2, 200k pts) on TPU:
pre-stage contraction vs interp kernel vs full call, plus the t1 dual
for comparison. Marginal K-loop timing with barrier-pinned outputs."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import tensorflow_nufft_tpu as tfft                     # noqa: E402
from tensorflow_nufft_tpu.planar import to_planar       # noqa: E402

K2 = 9
GRID = (256, 256)
M = 200_000

rng = np.random.default_rng(7)
pts = jnp.asarray(rng.uniform(-np.pi, np.pi, (M, 2)).astype(np.float32))
z = rng.standard_normal(GRID) + 1j * rng.standard_normal(GRID)
modes = jnp.asarray(to_planar(z.astype(np.complex64)))[None]
zs = rng.standard_normal((M,)) + 1j * rng.standard_normal((M,))
strengths = jnp.asarray(to_planar(zs.astype(np.complex64)))[None]

op2 = tfft.planar.PlannedNufft(pts, GRID, transform_type="type_2")
op1 = tfft.planar.PlannedNufft(pts, GRID, transform_type="type_1")
print(f"levels: t2={op2._level} t1={op1._level} geom tile={op2.geom.tile}"
      f" chunk={op2.geom.chunk} num_chunks={op2.geom.num_chunks}",
      file=sys.stderr, flush=True)


def log(m):
    print(m, file=sys.stderr, flush=True)


def marginal(stage_fn, label, x):
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
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(x))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, tk = timed(make(1)), timed(make(K2))
    per = max((tk - t1) / (K2 - 1), 1e-9)
    log(f"{label:28s}: {per * 1e3:9.3f} ms")


from tensorflow_nufft_tpu.fft.planar_fft import (        # noqa: E402
    amplify_pad_dft_tiled, dft_truncate_deconvolve_tiled)
from tensorflow_nufft_tpu.kernels.pallas_interp import (  # noqa: E402
    interp_pallas_tiled)
from tensorflow_nufft_tpu.kernels.pallas_spread import (  # noqa: E402
    spread_pallas_tiles)


def t2_pre(x):
    return amplify_pad_dft_tiled(x, op2.plan, op2.geom)


def t2_full_interp(x):
    tiles = amplify_pad_dft_tiled(x, op2.plan, op2.geom)
    return interp_pallas_tiled(
        tiles, op2.points_resc, op2.plan, op2.geom,
        binned=op2.binned, mats=op2.mats, coords=op2.coords)


def t2_interp_only(tiles):
    return interp_pallas_tiled(
        tiles, op2.points_resc, op2.plan, op2.geom,
        binned=op2.binned, mats=op2.mats, coords=op2.coords)


def t1_spread(x):
    src_cm = jnp.moveaxis(x, -1, 1).reshape(2, M)
    tiles, _ = spread_pallas_tiles(
        src_cm.astype(jnp.float32), op1.points_resc, op1.plan,
        binned=op1.binned, mats=op1.mats, coords=op1.coords)
    return tiles


def t1_full(x):
    tiles = t1_spread(x)
    return dft_truncate_deconvolve_tiled(tiles, op1.plan, op1.geom, 1)


marginal(t2_pre, "t2 pre (amplify+dft+ext)", modes)
tiles0 = jax.jit(t2_pre)(modes)
marginal(t2_interp_only, "t2 interp kernel only", tiles0)
marginal(t2_full_interp, "t2 pre+interp", modes)
marginal(lambda x: op2(x), "t2 full call", modes)
marginal(t1_spread, "t1 spread (payload+kernel)", strengths)
marginal(t1_full, "t1 full (spread+dft)", strengths)
marginal(lambda x: op1(x), "t1 full call", strengths)

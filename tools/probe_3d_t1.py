"""Marginal-time bisection of the PLANNED 3D type-1 path on TPU:
values-payload build, spread kernel, overlap-add + mode-DFT, full call.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import tensorflow_nufft_tpu as tfft                     # noqa: E402
from tensorflow_nufft_tpu.planar import to_planar       # noqa: E402
from tensorflow_nufft_tpu.kernels.binning import (      # noqa: E402
    build_values_payload)
from tensorflow_nufft_tpu.kernels.pallas_spread import (  # noqa: E402
    spread_pallas_tiles)
from tensorflow_nufft_tpu.fft.planar_fft import (        # noqa: E402
    dft_truncate_deconvolve_tiled)

K1 = 4
K2 = 20
GRID = (128, 128, 128)
M = 800_000

rng = np.random.default_rng(7)
pts = jnp.asarray(rng.uniform(-np.pi, np.pi, (M, 3)).astype(np.float32))
zs = rng.standard_normal((M,)) + 1j * rng.standard_normal((M,))
strengths = jnp.asarray(to_planar(zs.astype(np.complex64)))[None]

op = tfft.planar.PlannedNufft(pts, GRID, transform_type="type_1")
print(f"level={op._level} tile={op.geom.tile} chunk={op.geom.chunk}"
      f" num_tiles={op.geom.num_tiles} num_chunks={op.geom.num_chunks}"
      f" band={None if op.band_info is None else op.band_info[0]}"
      f" ext={op.geom.ext}",
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
    t1, tk = timed(make(K1)), timed(make(K2))
    per = max((tk - t1) / (K2 - K1), 1e-9)
    log(f"{label:30s}: {per * 1e3:9.3f} ms")


def s_payload(x):
    src_cm = jnp.moveaxis(x, -1, 1).reshape(2, M)
    return build_values_payload(src_cm, op.binned, op.geom)


def s_spread(x):
    src_cm = jnp.moveaxis(x, -1, 1).reshape(2, M)
    tiles, _ = spread_pallas_tiles(
        src_cm.astype(jnp.float32), op.points_resc, op.plan,
        binned=op.binned, mats=op.mats, coords=op.coords,
        geom=op.geom, band_info=op.band_info)
    return tiles


tiles0 = jax.jit(s_spread)(strengths)


def s_dft(t):
    return dft_truncate_deconvolve_tiled(t, op.plan, op.geom, 1)


stages = sys.argv[1:] or ["payload", "spread", "dft", "full"]
if "payload" in stages:
    marginal(s_payload, "values payload", strengths)
if "spread" in stages:
    marginal(s_spread, "payload+spread kernel", strengths)
if "dft" in stages:
    marginal(s_dft, "overlap-add + mode-DFT", tiles0)
if "full" in stages:
    marginal(lambda x: op(x), "full planned t1", strengths)

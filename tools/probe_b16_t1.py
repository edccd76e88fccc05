"""Stage split of the batch-16 shared-points planned 2D type-1 case
(256^2 / 200k, B2=32): the round-4 matrix measured 27.3 ms/batch vs
10.1 ms for the type-2 dual — this attributes the asymmetry. Honest
timing body, subprocess-free (run it on the TPU directly).

Stages:
  - values payload build (32-row minor-axis gather)
  - payload + spread kernel (4 streaming-mats groups at group=8)
  - spread + tiled mode-DFT
  - full planned t1 (adds overlap-add + final assembly)
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import tensorflow_nufft_tpu as tfft                     # noqa: E402
from tensorflow_nufft_tpu.kernels.binning import (      # noqa: E402
    build_values_payload)
from tensorflow_nufft_tpu.kernels.pallas_spread import (  # noqa: E402
    spread_pallas_tiles)
from tensorflow_nufft_tpu.fft.planar_fft import (        # noqa: E402
    dft_truncate_deconvolve_tiled)

K1, K2 = 2, 18
GRID = (256, 256)
M, B = 200_000, 16
B2 = 2 * B

rng = np.random.default_rng(7)
pts = jnp.asarray(rng.uniform(-np.pi, np.pi, (M, 2)).astype(np.float32))
z = (rng.standard_normal((B, M))
     + 1j * rng.standard_normal((B, M))).astype(np.complex64)
strengths = jnp.asarray(np.stack([z.real, z.imag], axis=-1))  # [B,M,2]

op = tfft.planar.PlannedNufft(pts, GRID, transform_type="type_1")
print(f"level={op._level} tile={op.geom.tile} chunk={op.geom.chunk}",
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
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(f(x))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, tk = timed(make(K1)), timed(make(K2))
    per = max((tk - t1) / (K2 - K1), 1e-9)
    log(f"{label:30s}: {per * 1e3:9.3f} ms")
    return per


def fold(x):
    # [B, M, 2] -> [B2, M] channel-major
    return jnp.moveaxis(x, -1, 1).reshape(B2, M)


def payload_only(x):
    return build_values_payload(fold(x), op.binned, op.geom)


def spread_full(x):
    tiles, _ = spread_pallas_tiles(
        fold(x).astype(jnp.float32), op.points_resc, op.plan,
        binned=op.binned, mats=op.mats, coords=op.coords)
    return tiles


def t1_full_stages(x):
    tiles = spread_full(x)
    return dft_truncate_deconvolve_tiled(tiles, op.plan, op.geom, B)


marginal(payload_only, "values payload (32 rows)", strengths)
marginal(spread_full, "payload+spread kernel", strengths)
marginal(t1_full_stages, "spread+DFT", strengths)
marginal(lambda x: op(x), "full planned t1 b16", strengths)

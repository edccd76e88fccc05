"""Isolate the in-kernel ES-evaluation cost of the 3D streaming spread
kernel: time the planned (binned-level) spread stage normally, then
with kernel_matrices_from stubbed to constants (wrong results, same
DMA/matmul work). The difference is what precomputed-mats streaming
could save."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import tensorflow_nufft_tpu as tfft                     # noqa: E402
from tensorflow_nufft_tpu.planar import to_planar       # noqa: E402
from tensorflow_nufft_tpu.kernels import pallas_spread  # noqa: E402
from tensorflow_nufft_tpu.kernels.pallas_spread import (  # noqa: E402
    spread_pallas_tiles)

K2 = 5
GRID = (128, 128, 128)
M = 800_000

rng = np.random.default_rng(7)
pts = jnp.asarray(rng.uniform(-np.pi, np.pi, (M, 3)).astype(np.float32))
zs = rng.standard_normal((M,)) + 1j * rng.standard_normal((M,))
strengths = jnp.asarray(to_planar(zs.astype(np.complex64)))[None]

op = tfft.planar.PlannedNufft(pts, GRID, transform_type="type_1")
print(f"level={op._level} chunk={op.geom.chunk}"
      f" num_chunks={op.geom.num_chunks}", file=sys.stderr, flush=True)
assert op._level == "binned"


def log(m):
    print(m, file=sys.stderr, flush=True)


def marginal(stage_fn, label, x):
    def make(k):
        @jax.jit
        def f(v):
            def body(i, acc):
                out = stage_fn(v * (1.0 + 1e-3 * jnp.sin(
                    i.astype(jnp.float32))))
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
    log(f"{label:30s}: {per * 1e3:9.3f} ms")


def s_spread(x):
    src_cm = jnp.moveaxis(x, -1, 1).reshape(2, M)
    tiles, _ = spread_pallas_tiles(
        src_cm.astype(jnp.float32), op.points_resc, op.plan,
        binned=op.binned, mats=op.mats, coords=op.coords)
    return tiles


marginal(s_spread, "spread (in-kernel eval)", strengths)

_real = pallas_spread.kernel_matrices_from


def _stub(data, origins, geom, beta, c, half_width, horner=None):
    return [data[d, :][None, :] * jnp.ones((geom.ext[d], 1), jnp.float32)
            for d in range(geom.rank)]


pallas_spread.kernel_matrices_from = _stub
try:
    marginal(s_spread, "spread (stubbed eval)", strengths)
finally:
    pallas_spread.kernel_matrices_from = _real

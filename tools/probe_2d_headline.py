"""Stage split of the planned 2D type-1 headline case (256^2, M from
argv, default 65536): values payload, spread kernel, tiled mode-DFT,
full call. Honest timing body."""
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

K1, K2 = 16, 144
GRID = (256, 256)
M = int(sys.argv[1]) if len(sys.argv) > 1 else 65_536

rng = np.random.default_rng(7)
pts = jnp.asarray(rng.uniform(-np.pi, np.pi, (M, 2)).astype(np.float32))
zs = rng.standard_normal(M) + 1j * rng.standard_normal(M)
strengths = jnp.asarray(to_planar(zs.astype(np.complex64)))[None]

op = tfft.planar.PlannedNufft(pts, GRID, transform_type="type_1")
print(f"level={op._level} tile={op.geom.tile} chunk={op.geom.chunk}"
      f" num_chunks={op.geom.num_chunks} slots="
      f"{op.geom.num_chunks * op.geom.chunk}",
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
    return jnp.moveaxis(x, -1, 1).reshape(2, M)


def payload_only(x):
    return build_values_payload(fold(x), op.binned, op.geom)


def spread_full(x):
    tiles, _ = spread_pallas_tiles(
        fold(x).astype(jnp.float32), op.points_resc, op.plan,
        binned=op.binned, mats=op.mats, coords=op.coords)
    return tiles


def t1_full_stages(x):
    tiles = spread_full(x)
    return dft_truncate_deconvolve_tiled(tiles, op.plan, op.geom, 1)


marginal(payload_only, "values payload", strengths)
marginal(spread_full, "payload+spread kernel", strengths)
marginal(t1_full_stages, "spread+DFT", strengths)
marginal(lambda x: op(x), "full planned t1", strengths)

"""Bisect the 3D t1 values-payload build: planar input conversion
(moveaxis) vs the pure invpos gather, plus chunk-size sweep of the
spread kernel (post-pairdot)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import tensorflow_nufft_tpu as tfft                     # noqa: E402
from tensorflow_nufft_tpu.planar import to_planar       # noqa: E402
from tensorflow_nufft_tpu.kernels import binning        # noqa: E402
from tensorflow_nufft_tpu.kernels.binning import (      # noqa: E402
    build_values_payload)
from tensorflow_nufft_tpu.kernels.pallas_spread import (  # noqa: E402
    spread_pallas_tiles)

K2 = 7
GRID = (128, 128, 128)
M = 800_000

rng = np.random.default_rng(7)
pts = jnp.asarray(rng.uniform(-np.pi, np.pi, (M, 3)).astype(np.float32))
zs = rng.standard_normal((M,)) + 1j * rng.standard_normal((M,))
planar_src = jnp.asarray(to_planar(zs.astype(np.complex64)))[None]
cm_src = jnp.asarray(np.moveaxis(np.asarray(planar_src), -1, 1
                                 ).reshape(2, M))


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
    log(f"{label:32s}: {per * 1e3:9.3f} ms")


def run(chunk):
    binning.set_geometry_overrides(chunk=chunk)
    op = tfft.planar.PlannedNufft(pts, GRID, transform_type="type_1")
    log(f"-- chunk={op.geom.chunk} num_chunks={op.geom.num_chunks} "
        f"level={op._level}")

    def pay_planar(x):
        src_cm = jnp.moveaxis(x, -1, 1).reshape(2, M)
        return build_values_payload(src_cm, op.binned, op.geom)

    def pay_cm(x):
        return build_values_payload(x, op.binned, op.geom)

    def moveaxis_only(x):
        return jax.lax.optimization_barrier(
            jnp.moveaxis(x, -1, 1).reshape(2, M))

    def s_spread(x):
        src_cm = jnp.moveaxis(x, -1, 1).reshape(2, M)
        tiles, _ = spread_pallas_tiles(
            src_cm.astype(jnp.float32), op.points_resc, op.plan,
            binned=op.binned, mats=op.mats, coords=op.coords)
        return tiles

    stages = sys.argv[2:] if len(sys.argv) > 2 else [
        "moveaxis", "pay_cm", "pay_planar", "spread"]
    if "moveaxis" in stages:
        marginal(moveaxis_only, "moveaxis+reshape only", planar_src)
    if "pay_cm" in stages:
        marginal(pay_cm, "payload from channel-major", cm_src)
    if "pay_planar" in stages:
        marginal(pay_planar, "payload from planar (current)", planar_src)
    if "spread" in stages:
        marginal(s_spread, "payload+spread kernel", planar_src)
    binning.set_geometry_overrides()


chunks = [int(c) for c in (sys.argv[1].split(",")
                           if len(sys.argv) > 1 else ["0"])]
for ch in chunks:
    run(ch)

"""Bisect the 3D t2 pre-stage (embed -> dft -> fold -> extend) with
marginal K-loop timing and barrier-materialized outputs."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tensorflow_nufft_tpu.kernels import binning
from tensorflow_nufft_tpu.fft.planar_fft import (
    _amplify_embed, dft_planar)
from tensorflow_nufft_tpu.plan.plan import PlanSpec, make_plan

K2 = 5
spec = PlanSpec("type_2", "forward", 3, (128,) * 3, "complex64", 1e-6, 0)
plan = make_plan(spec)
geom = binning.choose_geometry(plan.fine_shape, plan.width, 800_000)
rng = np.random.default_rng(0)
modes = jnp.asarray(
    rng.standard_normal((1, 128, 128, 128, 2)).astype(np.float32))


def log(m):
    print(m, file=sys.stderr, flush=True)


def marginal(stage_fn, label):
    def make(k):
        @jax.jit
        def f(x):
            def body(i, acc):
                out = stage_fn(x * (1.0 + 1e-3 * jnp.sin(
                    i.astype(jnp.float32))))
                out = jax.lax.optimization_barrier(out)
                return acc + out.ravel()[0]
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    def timed(f):
        np.asarray(f(modes))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(f(modes))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, tk = timed(make(1)), timed(make(K2))
    per = max((tk - t1) / (K2 - 1), 1e-9)
    log(f"{label:26s}: {per * 1e3:9.1f} ms")


def s_embed(x):
    return _amplify_embed(x, plan)


def s_dft(x):
    return dft_planar(jax.lax.optimization_barrier(_amplify_embed(
        x, plan)), 3, "forward")


def s_fold(x):
    y = s_dft(x)
    return jnp.moveaxis(y, -1, 1).reshape((2,) + plan.fine_shape)


def s_full(x):
    return binning.extend_tiles(
        jax.lax.optimization_barrier(s_fold(x)), geom)


which = sys.argv[1:] or ["embed", "dft", "fold", "full"]
for w in which:
    marginal({"embed": s_embed, "dft": s_dft, "fold": s_fold,
              "full": s_full}[w], w)

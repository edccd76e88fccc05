"""Planar type-3 on the real TPU: accuracy vs the planar dense oracle
plus marginal timing. Run: python tools/tpu_t3_check.py [M K]"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import tensorflow_nufft_tpu as tfft                     # noqa: E402
from tensorflow_nufft_tpu.planar import (               # noqa: E402
    nudft_type3, to_planar)

M = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000


def log(m):
    print(m, file=sys.stderr, flush=True)


rng = np.random.default_rng(3)
x = rng.uniform(-np.pi, np.pi, (M, 2)).astype(np.float32)
t = rng.uniform(-48.0, 48.0, (K, 2)).astype(np.float32)
z = (rng.standard_normal(M) + 1j * rng.standard_normal(M))
src = jnp.asarray(to_planar(z.astype(np.complex64)))[None]

log(f"building plan (M={M}, K={K})...")
op = tfft.planar.Type3Plan(x, t, tol=1e-6)
log(f"fine={op.fine_shape} spread_level={op._spread_level} "
    f"inner_level={op._inner_t2._level}")

out = np.asarray(op(src))[0]
# Oracle on a target subsample (dense is O(M*K)).
idx = rng.choice(K, 512, replace=False)
ref = np.asarray(nudft_type3(
    jnp.asarray(to_planar(z.astype(np.complex64))),
    jnp.asarray(x), jnp.asarray(t[idx])))
got = out[idx]
scale = np.abs(ref).max()
err = np.abs(got - ref).max() / scale
log(f"max rel err vs planar oracle (512 targets): {err:.3e}")

# Float64 dense reference in pure NumPy (jax on this box defaults to the
# TPU backend with x64 off, which would silently downcast the oracle).
ph = np.exp(-1j * (t[idx].astype(np.float64) @ x.astype(np.float64).T))
ref64 = ph @ z.astype(np.complex128)
err64 = np.abs((got[..., 0] + 1j * got[..., 1]) - ref64).max() \
    / np.abs(ref64).max()
log(f"max rel err vs f64 dense oracle:            {err64:.3e}")


def marginal(k2=9):
    def make(k):
        @jax.jit
        def f(s):
            def body(i, acc):
                sp = s + 1e-3 * jnp.sin(s * i.astype(jnp.float32))
                o = jax.lax.optimization_barrier(op(sp))
                return acc + o.ravel()[0]
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    def timed(f):
        np.asarray(f(src))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(src))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, tk = timed(make(1)), timed(make(k2))
    return max((tk - t1) / (k2 - 1), 1e-9)


per = marginal()
log(f"per-transform: {per * 1e3:.3f} ms "
    f"({(M + K) / per / 1e6:.1f}M pts/s)")
print(f"PASS err64={err64:.3e}" if err64 < 1e-5 else
      f"FAIL err64={err64:.3e}")

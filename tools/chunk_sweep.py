import sys, time
import numpy as np
import jax, jax.numpy as jnp
import tensorflow_nufft_tpu as tfft
from tensorflow_nufft_tpu.kernels import binning

chunk = int(sys.argv[1]); K2 = 17
GRID, M = 256, 200_000
rng = np.random.default_rng(7)
pts = jnp.asarray(rng.uniform(-np.pi, np.pi, (M, 2)).astype(np.float32))
vals = jnp.asarray(rng.standard_normal((1, M, 2)).astype(np.float32))

def perturb(i):
    return 1.0 + 1e-3 * jnp.sin(i.astype(jnp.float32))

def marginal(make):
    def timed(f):
        np.asarray(f()); best = 1e9
        for _ in range(4):
            t0 = time.perf_counter(); np.asarray(f())
            best = min(best, time.perf_counter() - t0)
        return best
    t1, tk = timed(make(1)), timed(make(K2))
    return max((tk - t1) / (K2 - 1), 1e-9)

binning.set_geometry_overrides(chunk=chunk)
op = tfft.planar.PlannedNufft(pts, (GRID, GRID), transform_type="type_1")
def mk(k):
    @jax.jit
    def f():
        def body(i, acc):
            o = op(vals * perturb(i))
            return acc + o[0, 0, 0, 0]
        return jax.lax.fori_loop(0, k, body, 0.0)
    return f
per = marginal(mk)
print(f"chunk {chunk:5d}: nc={op.geom.num_chunks:4d} "
      f"{per*1e3:7.3f} ms  {M/per/1e6:7.1f} M pts/s", flush=True)

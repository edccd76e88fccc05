"""Locate the source-size cliff of the minor-axis gather, and test the
source-split summation trick (partition slots by source half; padded
slots read the zero column)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

K2 = 17


def perturb(i):
    return 1.0 + 1e-3 * jnp.sin(i.astype(jnp.float32))


def marginal(make):
    def timed(f):
        np.asarray(f())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f())
            best = min(best, time.perf_counter() - t0)
        return best
    t1, tk = timed(make(1)), timed(make(K2))
    return max((tk - t1) / (K2 - 1), 1e-9)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


rng = np.random.default_rng(0)

log("-- cliff sweep: S = 1.62*M, random permutation indices")
for m in (200_000, 300_000, 400_000, 500_000, 600_000, 800_000):
    s = int(1.62 * m) // 256 * 256
    idx = (rng.permutation(max(m, s))[:s] % m).astype(np.int32)
    idx_j = jnp.asarray(idx)
    src = jnp.asarray(rng.standard_normal((8, m)).astype(np.float32))

    def mk(k, s_=src, ix=idx_j):
        @jax.jit
        def f():
            def body(i, acc):
                g = jax.lax.optimization_barrier(s_ * perturb(i))[:, ix]
                return acc + jnp.sum(g)
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    t = marginal(mk)
    log(f"M={m:8d} S={s:8d}: {t*1e3:8.3f} ms {t*1e9/s:6.2f} ns/idx "
        f"(src {8*m*4/2**20:.1f} MB)")

log("-- split-by-source-part gather, M=800k S=1.32M")
m, s = 800_000, 1_324_288
idx = (rng.permutation(s) % m).astype(np.int32)
src_np = rng.standard_normal((8, m)).astype(np.float32)
src = jnp.asarray(src_np)
for parts in (2, 3, 4, 6, 8):
    bound = [m * p // parts for p in range(parts + 1)]
    idx_parts = []
    for p in range(parts):
        lo, hi = bound[p], bound[p + 1]
        part = np.where((idx >= lo) & (idx < hi), idx - lo, hi - lo)
        idx_parts.append(jnp.asarray(part.astype(np.int32)))

    def mk(k, ps=tuple(idx_parts), b=tuple(bound)):
        @jax.jit
        def f():
            def body(i, acc):
                x = jax.lax.optimization_barrier(src * perturb(i))
                tot = None
                for p, ix in enumerate(ps):
                    piece = jnp.concatenate(
                        [x[:, b[p]:b[p + 1]],
                         jnp.zeros((8, 1), jnp.float32)], axis=1)
                    piece = jax.lax.optimization_barrier(piece)
                    g = piece[:, ix]
                    tot = g if tot is None else tot + g
                return acc + jnp.sum(tot)
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    t = marginal(mk)
    log(f"parts={parts}: {t*1e3:8.3f} ms  ({t*1e9/s:5.2f} ns/idx-slot)")

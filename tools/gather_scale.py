"""Cost model of the minor-axis payload gather on TPU v5e.

Sweeps (source size M, index count S, sortedness) for the
[8, M+1] -> [8, S] minor-axis gather that builds values payloads, to
explain why the 3D case (M=800k, S=1.32M) runs at ~4.4 ns/idx while the
330k microbenchmark ran at ~1.2 ns/idx.
"""
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


rng = np.random.default_rng(0)
cases = [
    # (label, M, S, mode)
    ("2d-like  ", 200_000, 262_144, "perm"),
    ("3d-like  ", 800_000, 1_324_288, "perm"),
    ("3d idx=M ", 800_000, 800_000, "perm"),
    ("small src", 100_000, 1_324_288, "perm"),
    ("3d sorted", 800_000, 1_324_288, "sorted"),
    ("3d blocks", 800_000, 1_324_288, "block256"),
]
for label, m, s, mode in cases:
    if mode == "perm":
        idx = rng.permutation(max(m, s))[:s] % m
    elif mode == "sorted":
        idx = np.sort(rng.permutation(max(m, s))[:s] % m)
    else:
        # Random within 256-aligned blocks: chunk j reads only source
        # block j (locality at DMA granularity).
        nb = s // 256
        base = (np.arange(nb) * m // nb)[:, None]
        idx = (base + rng.integers(0, max(m // nb, 1), (nb, 256))
               ) % m
        idx = idx.reshape(-1)
    idx = jnp.asarray(idx.astype(np.int32))
    src = jnp.asarray(rng.standard_normal((8, m)).astype(np.float32))

    def mk(k, s_=src):
        @jax.jit
        def f():
            def body(i, acc):
                g = jax.lax.optimization_barrier(s_ * perturb(i))[:, idx]
                return acc + jnp.sum(g)
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    t = marginal(mk)
    print(f"{label}: M={m:8d} S={s:8d} {t*1e3:8.3f} ms "
          f"{t*1e9/s:6.2f} ns/idx", file=sys.stderr, flush=True)

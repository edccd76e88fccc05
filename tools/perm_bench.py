"""Microbenchmark: random-permutation data movement cost vs size on TPU.

Measures gather (one f32 per index), row-gather ([R] f32 per index),
and row-scatter, with a full-reduction consumer so nothing DCEs.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

K2 = 33

def perturb(i):
    return 1.0 + 1e-3 * jnp.sin(i.astype(jnp.float32))

def marginal(make):
    def timed(f):
        np.asarray(f()); best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(f())
            best = min(best, time.perf_counter() - t0)
        return best
    t1, tk = timed(make(1)), timed(make(K2))
    return max((tk - t1) / (K2 - 1), 1e-9)

rng = np.random.default_rng(0)
for n in (65_536, 131_072, 262_144, 524_288, 1_048_576):
    idx = jnp.asarray(rng.permutation(n).astype(np.int32))
    src1 = jnp.asarray(rng.standard_normal((n,)).astype(np.float32))
    src2 = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    src8 = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))

    def mk_gather(k, s=src1):
        @jax.jit
        def f():
            def body(i, acc):
                return acc + jnp.sum((s * perturb(i))[idx])
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    def mk_rowgather(k, s=src2):
        @jax.jit
        def f():
            def body(i, acc):
                return acc + jnp.sum((s * perturb(i))[idx])
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    def mk_rowgather8(k, s=src8):
        @jax.jit
        def f():
            def body(i, acc):
                return acc + jnp.sum((s * perturb(i))[idx])
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    def mk_scatter2(k, s=src2):
        @jax.jit
        def f():
            def body(i, acc):
                t = jnp.zeros((n, 2), jnp.float32)
                t = t.at[idx].set(s * perturb(i), unique_indices=True)
                return acc + jnp.sum(t)
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    g1 = marginal(mk_gather)
    g2 = marginal(mk_rowgather)
    g8 = marginal(mk_rowgather8)
    s2 = marginal(mk_scatter2)
    print(f"n={n:8d}: gather1 {g1*1e9/n:6.2f} ns/idx  "
          f"rowgather2 {g2*1e9/n:6.2f}  rowgather8 {g8*1e9/n:6.2f}  "
          f"scatter2 {s2*1e9/n:6.2f}", flush=True)

print("-- channel-major minor-axis gather [B2, N] -> [B2, NC] (+transpose)")
for n in (65_536, 262_144, 1_048_576):
    idx = jnp.asarray(rng.permutation(n).astype(np.int32))
    for b2 in (2, 8):
        src = jnp.asarray(rng.standard_normal((b2, n)).astype(np.float32))

        def mk_cm(k, s=src):
            @jax.jit
            def f():
                def body(i, acc):
                    return acc + jnp.sum((s * perturb(i))[:, idx])
                return jax.lax.fori_loop(0, k, body, 0.0)
            return f

        def mk_cmt(k, s=src, b=b2):
            nc = n // 512
            @jax.jit
            def f():
                def body(i, acc):
                    g = (s * perturb(i))[:, idx]
                    p = g.reshape(b, nc, 512).transpose(1, 0, 2)
                    return acc + jnp.sum(p)
                return jax.lax.fori_loop(0, k, body, 0.0)
            return f

        c = marginal(mk_cm)
        ct = marginal(mk_cmt)
        print(f"n={n:8d} b2={b2}: cm-gather {c*1e9/n:6.2f} ns/idx   "
              f"+reshapeT {ct*1e9/n:6.2f}", flush=True)

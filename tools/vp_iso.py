"""Isolate build_values_payload cost variants at M=200k on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from tensorflow_nufft_tpu.kernels import binning
from tensorflow_nufft_tpu.plan.plan import PlanSpec, make_plan

M = 200_000
GRID = 256
K2 = 17

rng = np.random.default_rng(0)
points = rng.uniform(-np.pi, np.pi, (M, 2)).astype(np.float32)
vals = jnp.asarray(rng.standard_normal((2, M)).astype(np.float32))

spec = PlanSpec("type_1", "forward", 2, (GRID, GRID), "complex64", 1e-6, 0)
plan = make_plan(spec)
geom = binning.choose_geometry(plan.fine_shape, plan.width, M)
print(f"geom: tile={geom.tile} chunk={geom.chunk} nc={geom.num_chunks} "
      f"slots={geom.num_chunks * geom.chunk}", flush=True)

from tensorflow_nufft_tpu.kernels.xla_ops import fold_and_rescale_split
pts = jnp.asarray(points)
hi, lo = fold_and_rescale_split(pts, plan.fine_shape, 0)
binned = jax.jit(lambda h, l: binning.bin_points((h, l), geom))(hi, lo)
binned = jax.tree.map(jnp.asarray, binned)
invpos = binned.invpos
ncc = geom.num_chunks * geom.chunk


def perturb(i):
    return 1.0 + 1e-3 * jnp.sin(i.astype(jnp.float32))


def marginal(make, label):
    def timed(f):
        np.asarray(f())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f())
            best = min(best, time.perf_counter() - t0)
        return best
    t1, tk = timed(make(1)), timed(make(K2))
    per = max((tk - t1) / (K2 - 1), 1e-9)
    print(f"{label:34s}: {per * 1e3:7.3f} ms", flush=True)
    return per


def consume(x, acc):
    return acc + jnp.sum(x)


# a) real function
def mk_real(k):
    @jax.jit
    def f():
        def body(i, acc):
            p = binning.build_values_payload(vals * perturb(i), binned, geom)
            return consume(p, acc)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return f


# b) gather only (src prebuilt, no concat, no barrier, no pad)
src_pre = jnp.concatenate([vals, jnp.zeros((2, 1), jnp.float32)], axis=1)
def mk_gather(k):
    @jax.jit
    def f():
        def body(i, acc):
            return consume((src_pre * perturb(i))[:, invpos], acc)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return f


# c) concat + gather (no barrier, no row pad)
def mk_cg(k):
    @jax.jit
    def f():
        def body(i, acc):
            s = jnp.concatenate(
                [vals * perturb(i), jnp.zeros((2, 1), jnp.float32)], axis=1)
            return consume(s[:, invpos], acc)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return f


# d) concat + gather + barrier (no row pad)
def mk_cgb(k):
    @jax.jit
    def f():
        def body(i, acc):
            s = jnp.concatenate(
                [vals * perturb(i), jnp.zeros((2, 1), jnp.float32)], axis=1)
            return consume(jax.lax.optimization_barrier(s[:, invpos]), acc)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return f


# e) concat + gather + row-pad concat (no barrier)
def mk_cgp(k):
    @jax.jit
    def f():
        def body(i, acc):
            s = jnp.concatenate(
                [vals * perturb(i), jnp.zeros((2, 1), jnp.float32)], axis=1)
            g = s[:, invpos]
            g = jnp.concatenate([g, jnp.zeros((6, ncc), jnp.float32)], axis=0)
            return consume(g, acc)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return f


# f) source pre-padded to 8 rows, gather 8-row columns, nothing after
def mk_src8(k):
    @jax.jit
    def f():
        def body(i, acc):
            s = jnp.concatenate(
                [vals * perturb(i), jnp.zeros((2, 1), jnp.float32)], axis=1)
            s8 = jnp.concatenate([s, jnp.zeros((6, M + 1), jnp.float32)],
                                 axis=0)
            return consume(s8[:, invpos], acc)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return f


# g) f + barrier
def mk_src8b(k):
    @jax.jit
    def f():
        def body(i, acc):
            s = jnp.concatenate(
                [vals * perturb(i), jnp.zeros((2, 1), jnp.float32)], axis=1)
            s8 = jnp.concatenate([s, jnp.zeros((6, M + 1), jnp.float32)],
                                 axis=0)
            return consume(jax.lax.optimization_barrier(s8[:, invpos]), acc)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return f











# h) concat materialized via barrier BEFORE the gather
def mk_bcg(k):
    @jax.jit
    def f():
        def body(i, acc):
            s = jnp.concatenate(
                [vals * perturb(i), jnp.zeros((2, 1), jnp.float32)], axis=1)
            s = jax.lax.optimization_barrier(s)
            return consume(s[:, invpos], acc)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return f


# i) no pad column: clamped indices + mask multiply (mask prebuilt)
invpos_c = jnp.minimum(invpos, M - 1)
validf = (invpos < M).astype(jnp.float32)[None, :]
def mk_mask(k):
    @jax.jit
    def f():
        def body(i, acc):
            g = (vals * perturb(i))[:, invpos_c] * validf
            return consume(g, acc)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return f


# j) prebuilt 8-row source gather (8-row gather cost itself)
src8_pre = jnp.concatenate(
    [src_pre, jnp.zeros((6, M + 1), jnp.float32)], axis=0)
def mk_g8(k):
    @jax.jit
    def f():
        def body(i, acc):
            return consume((src8_pre * perturb(i))[:, invpos], acc)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return f


# k) mask variant with barrier after gather (pin layout for kernel use)
def mk_maskb(k):
    @jax.jit
    def f():
        def body(i, acc):
            g = (vals * perturb(i))[:, invpos_c] * validf
            return consume(jax.lax.optimization_barrier(g), acc)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return f








# m) barrier(8-row padded source) + gather  (final candidate)
def mk_final(k):
    @jax.jit
    def f():
        def body(i, acc):
            s = jnp.concatenate(
                [vals * perturb(i), jnp.zeros((2, 1), jnp.float32)], axis=1)
            s8 = jnp.concatenate([s, jnp.zeros((6, M + 1), jnp.float32)],
                                 axis=0)
            s8 = jax.lax.optimization_barrier(s8)
            return consume(s8[:, invpos], acc)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return f


# n) barrier only on the 2-row concat, pad rows AFTER gather via concat
def mk_final2(k):
    @jax.jit
    def f():
        def body(i, acc):
            s = jnp.concatenate(
                [vals * perturb(i), jnp.zeros((2, 1), jnp.float32)], axis=1)
            s = jax.lax.optimization_barrier(s)
            g = s[:, invpos]
            g = jnp.concatenate([g, jnp.zeros((6, ncc), jnp.float32)], axis=0)
            return consume(g, acc)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return f


marginal(mk_final, "m) barrier(src8)+gather")
marginal(mk_final2, "n) barrier(src2)+gather+rowpad")

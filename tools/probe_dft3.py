"""Per-axis timing of the tiled mode-DFT stages on the 3D 128^3 case:
which pair-contraction dominates, and what a plain-GEMM reformulation
would cost. Run on TPU."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import tensorflow_nufft_tpu as tfft                     # noqa: E402
from tensorflow_nufft_tpu.planar import to_planar       # noqa: E402
from tensorflow_nufft_tpu.fft.planar_fft import (        # noqa: E402
    _ext_mode_twiddles)

K2 = 7
GRID = (128, 128, 128)
M = 800_000
PREC = jax.lax.Precision.HIGHEST

rng = np.random.default_rng(7)
pts = jnp.asarray(rng.uniform(-np.pi, np.pi, (M, 3)).astype(np.float32))
zs = rng.standard_normal((M,)) + 1j * rng.standard_normal((M,))
strengths = jnp.asarray(to_planar(zs.astype(np.complex64)))[None]

op = tfft.planar.PlannedNufft(pts, GRID, transform_type="type_1")
plan, geom = op.plan, op.geom
print(f"tile={geom.tile} ext={geom.ext} tiles={geom.tiles}",
      file=sys.stderr, flush=True)


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
    log(f"{label:36s}: {per * 1e3:9.3f} ms")
    return per


rank = 3
sign = -1.0


def stage_mats(d):
    c_np, s_np = _ext_mode_twiddles(
        plan.fine_shape[d], plan.grid_shape[d], geom.tiles[d],
        geom.tile[d], geom.pad, sign, plan.deconv_weights(d),
        truncating=True)
    nt, e = geom.tiles[d], geom.ext[d]
    c = jnp.asarray(c_np.reshape(nt, e, -1), jnp.float32)
    smc = jnp.asarray((s_np - c_np).reshape(nt, e, -1), jnp.float32)
    spc = jnp.asarray((s_np + c_np).reshape(nt, e, -1), jnp.float32)
    return c, smc, spc


def one_stage(xr, xi, d, processed):
    """One pair-contraction stage as in dft_truncate_deconvolve_tiled.
    `processed` = number of axes already contracted."""
    c, smc, spc = stage_mats(d)
    ext_pos = (rank - processed) + 1

    dn = (((0, ext_pos), (0, 1)), ((), ()))

    def dot(a, m):
        return jax.lax.dot_general(
            a, m, dn, preferred_element_type=a.dtype, precision=PREC)

    t1 = dot(xr + xi, c)
    t2 = dot(xr, smc)
    t3 = dot(xi, spc)
    return t1 - t3, t1 + t2


# Build representative inputs for each stage shape.
batch = 1
tiles_shape = geom.tiles + (batch,) + geom.ext
x0r = jnp.asarray(rng.standard_normal(tiles_shape).astype(np.float32))
x0i = jnp.asarray(rng.standard_normal(tiles_shape).astype(np.float32))

which = sys.argv[1:] or ["s0", "s1", "s2", "all"]

if "s0" in which:
    marginal(lambda v: one_stage(v, x0i, 0, 0)[0], "stage0 (contract nt0,E0)", x0r)

s1r_shape = (geom.tiles[1], geom.tiles[2], batch, geom.ext[1],
             geom.ext[2], GRID[0])
x1r = jnp.asarray(rng.standard_normal(s1r_shape).astype(np.float32))
x1i = jnp.asarray(rng.standard_normal(s1r_shape).astype(np.float32))
if "s1" in which:
    marginal(lambda v: one_stage(v, x1i, 1, 1)[0], "stage1 (contract nt1,E1)", x1r)

s2r_shape = (geom.tiles[2], batch, geom.ext[2], GRID[0], GRID[1])
x2r = jnp.asarray(rng.standard_normal(s2r_shape).astype(np.float32))
x2i = jnp.asarray(rng.standard_normal(s2r_shape).astype(np.float32))
if "s2" in which:
    marginal(lambda v: one_stage(v, x2i, 2, 2)[0], "stage2 (contract nt2,E2)", x2r)

if "gemm" in which:
    # Upper bound check: the same flops as ONE plain [rest, K] @ [K, n]
    # GEMM per stage, ideal layout, no relayouts.
    for d, (restk, k, n) in enumerate([
            (np.prod(s1r_shape[:-1]), geom.tiles[0] * geom.ext[0], 128),
            (np.prod(s2r_shape[:-1]), geom.tiles[1] * geom.ext[1], 128),
            (batch * 128 * 128 * geom.ext[2] // geom.ext[2],
             geom.tiles[2] * geom.ext[2], 128)]):
        a = jnp.asarray(rng.standard_normal(
            (int(restk), k)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))

        def mm(v, b_=b):
            return jnp.dot(v, b_, precision=PREC)
        marginal(mm, f"ideal GEMM stage{d} x1 (of 3 gauss)", a)

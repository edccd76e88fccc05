"""Interleaved-layout tiled mode-DFT: one explicit (nt0,E0,nt1,E1,..)
transpose (minor dim preserved -> sublane-level, cheap), then every
pair-contraction is a leading-two-dims GEMM with no internal relayout.
Compares against the current pair-contraction formulation on the 3D
128^3 case and checks numerics."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import tensorflow_nufft_tpu as tfft                     # noqa: E402
from tensorflow_nufft_tpu.planar import to_planar       # noqa: E402
from tensorflow_nufft_tpu.fft.planar_fft import (        # noqa: E402
    _ext_mode_twiddles, dft_truncate_deconvolve_tiled)

K2 = 7
GRID = (128, 128, 128)
M = 800_000
PREC = jax.lax.Precision.HIGHEST

rng = np.random.default_rng(7)
pts = jnp.asarray(rng.uniform(-np.pi, np.pi, (M, 3)).astype(np.float32))

op = tfft.planar.PlannedNufft(pts, GRID, transform_type="type_1")
plan, geom = op.plan, op.geom
print(f"tile={geom.tile} ext={geom.ext} tiles={geom.tiles}",
      file=sys.stderr, flush=True)

rank = 3
sign = -1.0
batch = 1
tiles_shape = geom.tiles + (2 * batch,) + geom.ext
x0 = jnp.asarray(rng.standard_normal(tiles_shape).astype(np.float32))


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
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(x))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, tk = timed(make(1)), timed(make(K2))
    per = max((tk - t1) / (K2 - 1), 1e-9)
    log(f"{label:34s}: {per * 1e3:9.3f} ms")
    return per


def stage_mats(d):
    c_np, s_np = _ext_mode_twiddles(
        plan.fine_shape[d], plan.grid_shape[d], geom.tiles[d],
        geom.tile[d], geom.pad, sign, plan.deconv_weights(d),
        truncating=True)
    nt, e = geom.tiles[d], geom.ext[d]
    c = jnp.asarray(c_np.reshape(nt * e, -1), jnp.float32)
    smc = jnp.asarray((s_np - c_np).reshape(nt * e, -1), jnp.float32)
    spc = jnp.asarray((s_np + c_np).reshape(nt * e, -1), jnp.float32)
    return c, smc, spc


MATS = [stage_mats(d) for d in range(3)]


def interleave(x):
    """[*tiles, B2, *ext] -> [B2, nt0*E0, nt1*E1, nt2*E2]."""
    # [nt0, nt1, nt2, B2, E0, E1, E2] -> [B2, nt0, E0, nt1, E1, nt2, E2]
    y = jnp.transpose(x, (3, 0, 4, 1, 5, 2, 6))
    nt, e = geom.tiles, geom.ext
    return y.reshape(x.shape[3], nt[0] * e[0], nt[1] * e[1],
                     nt[2] * e[2])


def dft_interleaved(x):
    y = interleave(x)
    b2 = y.shape[0]
    xr = y[0::2]
    xi = y[1::2]
    for d in range(3):
        c, smc, spc = MATS[d]
        # leading-axis contraction: [B, G, rest..] with G = nt_d*E_d at
        # axis 1; output appends n_d at the end.
        dn = (((1,), (0,)), ((), ()))

        def dot(a, m):
            return jax.lax.dot_general(
                a, m, dn, preferred_element_type=a.dtype,
                precision=PREC)

        t1 = dot(xr + xi, c)
        t2 = dot(xr, smc)
        t3 = dot(xi, spc)
        xr, xi = t1 - t3, t1 + t2
    return jnp.stack([xr, xi], axis=-1)


which = sys.argv[1:] or ["num", "cur", "tr", "new"]

if "num" in which:
    a = np.asarray(jax.jit(dft_interleaved)(x0))
    b = np.asarray(jax.jit(
        lambda v: dft_truncate_deconvolve_tiled(v, plan, geom, batch)
    )(x0))
    # current returns [batch, *grid, 2]; interleaved [batch, *grid, 2]
    err = np.max(np.abs(a - b)) / np.max(np.abs(b))
    log(f"max |new - cur| / max|cur| = {err:.3e}")

if "cur" in which:
    marginal(lambda v: dft_truncate_deconvolve_tiled(
        v, plan, geom, batch), "pair-contraction (current)", x0)
if "tr" in which:
    marginal(interleave, "interleave transpose only", x0)
if "new" in which:
    marginal(dft_interleaved, "interleaved GEMM DFT", x0)

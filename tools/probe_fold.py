"""Compare t1 post-stage formulations on TPU at 3D 800k scale:
(a) current overlap_add + per-axis mode-DFT (measured ~32 ms),
(b) pair-contraction: [nt_d, E_d, n_d] wrap-aware twiddles contracted
    against the (tile, ext) axis pairs of the kernel's native tile
    layout — no fold, no transpose.
Also numerics check (b) vs (a).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import tensorflow_nufft_tpu as tfft                     # noqa: E402
from tensorflow_nufft_tpu.kernels import binning        # noqa: E402
from tensorflow_nufft_tpu.fft.planar_fft import (        # noqa: E402
    _ext_mode_twiddles, dft_truncate_deconvolve_tiled)
from tensorflow_nufft_tpu.plan.plan import PlanSpec, make_plan  # noqa

K2 = 5
GRID = (128, 128, 128)
M = 800_000
PREC = jax.lax.Precision.HIGHEST

spec = PlanSpec("type_1", "forward", 3, GRID, "complex64", 1e-6, 0)
plan = make_plan(spec)
geom = binning.choose_geometry(plan.fine_shape, plan.width, M)
rank = 3
print(f"tile={geom.tile} ext={geom.ext} tiles={geom.tiles}",
      file=sys.stderr, flush=True)

rng = np.random.default_rng(0)
tiles = jnp.asarray(rng.standard_normal(
    geom.tiles + (2,) + geom.ext).astype(np.float32))


def log(m):
    print(m, file=sys.stderr, flush=True)


def pairdot_t1(x, batch=1):
    sign = -1.0
    xs = x.reshape(geom.tiles + (batch, 2) + geom.ext)
    xr = xs[..., 0, :, :, :]            # [*tiles, batch, *ext]
    xi = xs[..., 1, :, :, :]
    for d in range(rank):
        c_np, s_np = _ext_mode_twiddles(
            plan.fine_shape[d], plan.grid_shape[d], geom.tiles[d],
            geom.tile[d], geom.pad, sign, plan.deconv_weights(d),
            truncating=True)
        nt, e = geom.tiles[d], geom.ext[d]
        c = jnp.asarray(c_np.reshape(nt, e, -1), jnp.float32)
        s = jnp.asarray(s_np.reshape(nt, e, -1), jnp.float32)
        ext_pos = (rank - d) + 1
        dn = (((0, ext_pos), (0, 1)), ((), ()))

        def dot(a, m):
            return jax.lax.dot_general(
                a, m, dn, preferred_element_type=jnp.float32,
                precision=PREC)
        ar, br = dot(xr, c), dot(xr, s)
        ai, bi = dot(xi, c), dot(xi, s)
        xr, xi = ar - bi, ai + br
    return jnp.stack([xr, xi], axis=-1)


def pairdot_gauss(x, batch=1):
    """3-matmul complex contraction: t1=(xr+xi)c, t2=xr(s-c),
    t3=xi(s+c); yr=t1-t3, yi=t1+t2."""
    sign = -1.0
    xs = x.reshape(geom.tiles + (batch, 2) + geom.ext)
    xr = xs[..., 0, :, :, :]
    xi = xs[..., 1, :, :, :]
    for d in range(rank):
        c_np, s_np = _ext_mode_twiddles(
            plan.fine_shape[d], plan.grid_shape[d], geom.tiles[d],
            geom.tile[d], geom.pad, sign, plan.deconv_weights(d),
            truncating=True)
        nt, e = geom.tiles[d], geom.ext[d]
        c = jnp.asarray(c_np.reshape(nt, e, -1), jnp.float32)
        smc = jnp.asarray((s_np - c_np).reshape(nt, e, -1), jnp.float32)
        spc = jnp.asarray((s_np + c_np).reshape(nt, e, -1), jnp.float32)
        ext_pos = (rank - d) + 1
        dn = (((0, ext_pos), (0, 1)), ((), ()))

        def dot(a, m):
            return jax.lax.dot_general(
                a, m, dn, preferred_element_type=jnp.float32,
                precision=PREC)
        t1 = dot(xr + xi, c)
        t2 = dot(xr, smc)
        t3 = dot(xi, spc)
        xr, xi = t1 - t3, t1 + t2
    return jnp.stack([xr, xi], axis=-1)


def current_t1(x):
    return dft_truncate_deconvolve_tiled(x, plan, geom, 1)


# numerics
a = np.asarray(jax.jit(current_t1)(tiles))
b = np.asarray(jax.jit(pairdot_t1)(tiles))
log(f"rel err pairdot vs current: "
    f"{np.max(np.abs(a - b)) / np.max(np.abs(a)):.3e}")


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
    log(f"{label:30s}: {per * 1e3:9.3f} ms")


import sys as _sys                                       # noqa: E402
_stages = _sys.argv[1:] or ["pairdot", "gauss", "current"]
if "gauss" in _stages:
    g = np.asarray(jax.jit(pairdot_gauss)(tiles))
    log(f"rel err gauss vs current: "
        f"{np.max(np.abs(a - g)) / np.max(np.abs(a)):.3e}")
    marginal(pairdot_gauss, "gauss 3-mult pairdot", tiles)
if "pairdot" in _stages:
    marginal(pairdot_t1, "pairdot t1 post-stage", tiles)
if "current" in _stages:
    marginal(current_t1, "current t1 post-stage", tiles)

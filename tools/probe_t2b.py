"""Compare 3D t2 pre-stage formulations on TPU (128^3 modes, 800k-pt
geometry): current embed+dft+extend, barriered extend, pairdot-dual
(+ the final transpose isolated)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
from tensorflow_nufft_tpu.kernels import binning        # noqa: E402
from tensorflow_nufft_tpu.fft.planar_fft import (        # noqa: E402
    _amplify_embed, _ext_mode_twiddles, amplify_pad_dft_tiled,
    dft_planar)
from tensorflow_nufft_tpu.plan.plan import PlanSpec, make_plan  # noqa

K2 = 5
GRID = (128, 128, 128)
M = 800_000
PREC = jax.lax.Precision.HIGHEST

spec = PlanSpec("type_2", "forward", 3, GRID, "complex64", 1e-6, 0)
plan = make_plan(spec)
geom = binning.choose_geometry(plan.fine_shape, plan.width, M)
rank = 3
print(f"tile={geom.tile} ext={geom.ext} tiles={geom.tiles}",
      file=sys.stderr, flush=True)

rng = np.random.default_rng(0)
modes = jnp.asarray(rng.standard_normal(
    (1,) + GRID + (2,)).astype(np.float32))


def log(m):
    print(m, file=sys.stderr, flush=True)


def current(x):
    return amplify_pad_dft_tiled(x, plan, geom)


def extend_barriered(x):
    xb = jax.lax.optimization_barrier(_amplify_embed(x, plan))
    xb = jax.lax.optimization_barrier(
        dft_planar(xb, rank, "forward", PREC))
    fine = jnp.moveaxis(xb, -1, 1).reshape((2,) + plan.fine_shape)
    pad = geom.pad
    y = fine
    for d in range(rank):
        ax = 1 + 2 * d
        nt, t = geom.tiles[d], geom.tile[d]
        shape = y.shape
        y = y.reshape(shape[:ax] + (nt, t) + shape[ax + 1:])
        left = jnp.roll(
            jax.lax.slice_in_dim(y, t - pad, t, axis=ax + 1), 1, axis=ax)
        right = jnp.roll(
            jax.lax.slice_in_dim(y, 0, pad, axis=ax + 1), -1, axis=ax)
        y = jnp.concatenate([left, y, right], axis=ax + 1)
        y = jax.lax.optimization_barrier(y)
    perm = [1 + 2 * d for d in range(rank)] + [0] + \
        [2 + 2 * d for d in range(rank)]
    return jnp.transpose(y, perm)


def pairdot_dual(x, batch=1):
    sign = -1.0
    xr, xi = x[..., 0], x[..., 1]
    for d in range(rank):
        c_np, s_np = _ext_mode_twiddles(
            plan.fine_shape[d], plan.grid_shape[d], geom.tiles[d],
            geom.tile[d], geom.pad, sign, plan.deconv_weights(d),
            truncating=False)              # [n, nt*E]
        nt, e = geom.tiles[d], geom.ext[d]
        c = jnp.asarray(c_np.reshape(-1, nt, e), jnp.float32)
        s = jnp.asarray(s_np.reshape(-1, nt, e), jnp.float32)
        dn = (((1,), (0,)), ((), ()))

        def dot(a, m):
            return jax.lax.dot_general(
                a, m, dn, preferred_element_type=jnp.float32,
                precision=PREC)
        ar, br = dot(xr, c), dot(xr, s)
        ai, bi = dot(xi, c), dot(xi, s)
        xr, xi = ar - bi, ai + br
    # [B, nt0, E0, nt1, E1, nt2, E2] x2 -> [nt.., B2, E..]
    y = jnp.stack([xr, xi], axis=1)
    y = y.reshape((2 * batch,) + y.shape[2:])
    perm = [1 + 2 * d for d in range(rank)] + [0] + \
        [2 + 2 * d for d in range(rank)]
    return jnp.transpose(y, perm)


# numerics
a = np.asarray(jax.jit(current)(modes))
b = np.asarray(jax.jit(pairdot_dual)(modes))
c = np.asarray(jax.jit(extend_barriered)(modes))
log(f"rel err pairdot vs current: "
    f"{np.max(np.abs(a - b)) / np.max(np.abs(a)):.3e}")
log(f"rel err barriered vs current: "
    f"{np.max(np.abs(a - c)) / np.max(np.abs(a)):.3e}")


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


stages = sys.argv[1:] or ["pairdot", "barriered", "current"]
if "pairdot" in stages:
    marginal(pairdot_dual, "pairdot-dual t2 pre-stage", modes)
if "barriered" in stages:
    marginal(extend_barriered, "barriered extend t2 pre", modes)
if "current" in stages:
    marginal(current, "current t2 pre-stage", modes)

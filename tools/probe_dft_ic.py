"""Prototype: tiled mode-DFT as interleaved-complex GEMMs.

Each axis stage becomes ONE real GEMM [.., nt_d*E_d*2] x
[nt_d*E_d*2, n_d*2] (complex-as-real-2x2 blocks), so the planar pair
rides inside the GEMM and each stage relayouts ONE operand instead of
the three Gauss operands. Times the prototype against the current
pair-contraction dft_truncate_deconvolve_tiled on the 3D 128^3 case
and checks numerics.
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
    dft_truncate_deconvolve_tiled)
from tensorflow_nufft_tpu.plan.plan import make_plan     # noqa: E402
from tensorflow_nufft_tpu.ops.nufft_ops import PlanSpec  # noqa: E402

K2 = 7
GRID = tuple(int(x) for x in (sys.argv[1:4] or [128, 128, 128]))
M = 800_000
PREC = jax.lax.Precision.HIGHEST

spec = PlanSpec(transform_type="type_1", fft_direction="forward",
                rank=3, grid_shape=GRID, dtype_name="complex64",
                tol=1e-6, points_range=1, spread_only=False,
                upsampling_factor=0.0, backend="auto")
plan = make_plan(spec)
geom = binning.choose_geometry(plan.fine_shape, plan.width, M)
print(f"tile={geom.tile} ext={geom.ext} tiles={geom.tiles}",
      file=sys.stderr, flush=True)

rank = 3
sign = -1.0
rng = np.random.default_rng(7)
tiles_shape = geom.tiles + (2,) + geom.ext
x0 = jnp.asarray(rng.standard_normal(tiles_shape).astype(np.float32))


def log(m):
    print(m, file=sys.stderr, flush=True)


def _ext_cs(d):
    from tensorflow_nufft_tpu.fft.planar_fft import _ext_mode_twiddles
    c_np, s_np = _ext_mode_twiddles(
        plan.fine_shape[d], plan.grid_shape[d], geom.tiles[d],
        geom.tile[d], geom.pad, sign, plan.deconv_weights(d),
        truncating=True)
    return c_np, s_np                      # [nt*E, n]


def _w_ic(d):
    """[nt_d*E_d*2, n_d*2] interleaved complex twiddle block."""
    c_np, s_np = _ext_cs(d)
    ke, n = c_np.shape
    w = np.zeros((ke, 2, n, 2), np.float32)
    w[:, 0, :, 0] = c_np
    w[:, 1, :, 0] = -s_np
    w[:, 0, :, 1] = s_np
    w[:, 1, :, 1] = c_np
    return jnp.asarray(w.reshape(ke * 2, n * 2))


W = [_w_ic(d) for d in range(rank)]


def ic_dft_v2(tiles):
    """Correct version: planar pair kept as trailing dim, moved onto
    whichever axis is being contracted."""
    nt0, nt1, nt2 = geom.tiles
    e0, e1, e2 = geom.ext
    n0, n1, n2 = GRID
    # [nt0,nt1,nt2,2,E0,E1,E2] -> [nt0E0, nt1E1, nt2E2, 2]
    x = jnp.transpose(tiles, (0, 4, 1, 5, 2, 6, 3)).reshape(
        nt0 * e0, nt1 * e1, nt2 * e2 * 2)
    x = jax.lax.dot_general(                 # contract (nt2 E2 2)
        x, W[2], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=PREC)
    # [nt0E0, nt1E1, n2 2] -> [nt0E0, n2, nt1E1, 2]? The pair is
    # attached to n2 now; to contract axis 1 with its pair we must
    # re-expand: [nt0E0, nt1E1, n2, 2] -> transpose -> merge pair with
    # nt1E1? The pair belongs to the VALUE, shared by all axes — it
    # rides wherever we put it. Reattach to axis 1:
    x = x.reshape(nt0 * e0, nt1 * e1, n2, 2)
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(
        nt0 * e0, n2, nt1 * e1 * 2)
    x = jax.lax.dot_general(
        x, W[1], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=PREC)
    x = x.reshape(nt0 * e0, n2, n1, 2)
    x = jnp.transpose(x, (1, 2, 0, 3)).reshape(n2, n1, nt0 * e0 * 2)
    x = jax.lax.dot_general(
        x, W[0], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=PREC)
    x = x.reshape(n2, n1, n0, 2)
    return jnp.transpose(x, (2, 1, 0, 3))[None]      # [1, n0,n1,n2, 2]


def cur_dft(tiles):
    return dft_truncate_deconvolve_tiled(tiles, plan, geom, 1)


def marginal(stage_fn, label, x):
    def make(k):
        @jax.jit
        def f(v):
            def body(i, acc):
                p = 1.0 + 1e-3 * jnp.sin(
                    i.astype(jnp.float32) + v.ravel()[i])
                out = stage_fn(v * p)
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
    return per


which = sys.argv[4:] if len(sys.argv) > 4 else ["check", "time"]
if "check" in which:
    a = np.asarray(jax.jit(cur_dft)(x0))
    b = np.asarray(jax.jit(ic_dft_v2)(x0))
    scale = np.abs(a).max()
    log(f"max |cur - ic| / max|cur| = "
        f"{np.abs(a - b).max() / scale:.3e}")
if "time" in which:
    marginal(cur_dft, "pair-contraction (current)", x0)
    marginal(ic_dft_v2, "interleaved-complex GEMMs", x0)

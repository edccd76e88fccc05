"""Per-axis bisection of the tiled mode-DFT pair-contractions (3D
128^3 banded geometry): which axis pair is off-roofline, what the
compiled cost analysis says, and whether operand-order / dimension-
numbering variants lower better."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import tensorflow_nufft_tpu as tfft                     # noqa: E402
from tensorflow_nufft_tpu.fft.planar_fft import (        # noqa: E402
    _ext_mode_twiddles)

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

rank, sign, batch = 3, -1.0, 1


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


def axis_mats(d):
    c_np, s_np = _ext_mode_twiddles(
        plan.fine_shape[d], plan.grid_shape[d], geom.tiles[d],
        geom.tile[d], geom.pad, sign, plan.deconv_weights(d),
        truncating=True)
    nt, e = geom.tiles[d], geom.ext[d]
    c = jnp.asarray(c_np.reshape(nt, e, -1), jnp.float32)
    smc = jnp.asarray((s_np - c_np).reshape(nt, e, -1), jnp.float32)
    spc = jnp.asarray((s_np + c_np).reshape(nt, e, -1), jnp.float32)
    return c, smc, spc


MATS = [axis_mats(d) for d in range(3)]


def one_axis(xr, xi, d, pos_tile, pos_ext):
    """One pair-contraction exactly as dft_truncate_deconvolve_tiled
    does it, with the (tile, ext) axes at the given positions."""
    c, smc, spc = MATS[d]
    dn = (((pos_tile, pos_ext), (0, 1)), ((), ()))

    def dot(a, m):
        return jax.lax.dot_general(a, m, dn,
                                   preferred_element_type=a.dtype,
                                   precision=PREC)
    t1 = dot(xr + xi, c)
    t2 = dot(xr, smc)
    t3 = dot(xi, spc)
    return t1 - t3, t1 + t2


tiles_shape = geom.tiles + (2 * batch,) + geom.ext
x0 = jnp.asarray(rng.standard_normal(tiles_shape).astype(np.float32))
nt, e = geom.tiles, geom.ext

# Layouts exactly as inside dft_truncate_deconvolve_tiled's loop:
# start [*tiles, batch, *ext] (planar parts split outside).
xs0 = x0.reshape(nt + (batch, 2) + e)
xr0 = xs0[..., 0, :, :, :]
xi0 = xs0[..., 1, :, :, :]
# After axis 0: [nt1, nt2, batch, E1, E2, n0]
sh1 = (nt[1], nt[2], batch, e[1], e[2], 128)
xr1 = jnp.asarray(rng.standard_normal(sh1).astype(np.float32))
xi1 = jnp.asarray(rng.standard_normal(sh1).astype(np.float32))
# After axis 1: [nt2, batch, E2, n0, n1]
sh2 = (nt[2], batch, e[2], 128, 128)
xr2 = jnp.asarray(rng.standard_normal(sh2).astype(np.float32))
xi2 = jnp.asarray(rng.standard_normal(sh2).astype(np.float32))

which = sys.argv[1:] or ["ax0", "ax1", "ax2", "cost"]

if "ax0" in which:
    marginal(lambda v: jnp.stack(one_axis(v, xi0, 0, 0, 4), -1),
             "axis0 pair (272->128)", xr0)
if "ax1" in which:
    marginal(lambda v: jnp.stack(one_axis(v, xi1, 1, 0, 3), -1),
             "axis1 pair (384->128)", xr1)
if "ax2" in which:
    marginal(lambda v: jnp.stack(one_axis(v, xi2, 2, 0, 2), -1),
             "axis2 pair (288->128)", xr2)

if "cost" in which:
    # Compiled cost analysis of the full post-stage: FLOPs + bytes.
    from tensorflow_nufft_tpu.fft.planar_fft import (
        dft_truncate_deconvolve_tiled)
    f = jax.jit(lambda v: dft_truncate_deconvolve_tiled(
        v, plan, geom, batch))
    try:
        ca = f.lower(x0).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        keys = ["flops", "bytes accessed", "transcendentals",
                "optimal_seconds"]
        log("cost: " + ", ".join(
            f"{k}={ca.get(k, 0):.3e}" for k in keys if k in ca))
    except Exception as ex:  # noqa: BLE001
        log(f"cost analysis unavailable: {type(ex).__name__}: "
            f"{str(ex)[:200]}")


def full_current(x):
    from tensorflow_nufft_tpu.fft.planar_fft import (
        dft_truncate_deconvolve_tiled)
    return dft_truncate_deconvolve_tiled(x, plan, geom, batch)


def full_reversed(x):
    """Axis order 2,1,0: the array shrinks (E_d -> n_d=128) before the
    expensive leading-pair contraction runs."""
    xs = x.reshape(nt + (batch, 2) + e)
    xr = xs[..., 0, :, :, :]
    xi = xs[..., 1, :, :, :]
    # layouts: start [nt0, nt1, nt2, B, E0, E1, E2]
    # d=2: contract (2, 6) -> [nt0, nt1, B, E0, E1, n2]
    xr, xi = one_axis(xr, xi, 2, 2, 6)
    # d=1: contract (1, 4) -> [nt0, B, E0, n2, n1]
    xr, xi = one_axis(xr, xi, 1, 1, 4)
    # d=0: contract (0, 2) -> [B, n2, n1, n0]
    xr, xi = one_axis(xr, xi, 0, 0, 2)
    out = jnp.stack([xr, xi], -1)          # [B, n2, n1, n0, 2]
    return jnp.moveaxis(jnp.moveaxis(out, 3, 1), 3, 2)


def full_mfirst(x):
    """Twiddles as lhs: each output n lands leading; the free minor
    dims (E1, E2) stay minor through the chain."""
    xs = x.reshape(nt + (batch, 2) + e)
    xr = xs[..., 0, :, :, :]
    xi = xs[..., 1, :, :, :]

    def ax(xr, xi, d, pt, pe):
        c, smc, spc = MATS[d]
        dn = (((0, 1), (pt, pe)), ((), ()))

        def dot(m, a):
            return jax.lax.dot_general(m, a, dn,
                                       preferred_element_type=a.dtype,
                                       precision=PREC)
        t1 = dot(c, xr + xi)
        t2 = dot(smc, xr)
        t3 = dot(spc, xi)
        return t1 - t3, t1 + t2

    # [nt0, nt1, nt2, B, E0, E1, E2]
    xr, xi = ax(xr, xi, 0, 0, 4)     # -> [n0, nt1, nt2, B, E1, E2]
    xr, xi = ax(xr, xi, 1, 1, 4)     # -> [n1, n0, nt2, B, E2]
    xr, xi = ax(xr, xi, 2, 2, 4)     # -> [n2, n1, n0, B]
    out = jnp.stack([xr, xi], -1)    # [n2, n1, n0, B, 2]
    return jnp.transpose(out, (3, 2, 1, 0, 4))


if "rev" in which or "mfirst" in which:
    ref = np.asarray(jax.jit(full_current)(x0))
    if "rev" in which:
        a = np.asarray(jax.jit(full_reversed)(x0))
        log(f"rev numerics: {np.max(np.abs(a - ref)) / np.max(np.abs(ref)):.3e}")
        marginal(full_reversed, "full chain REVERSED (2,1,0)", x0)
    if "mfirst" in which:
        a = np.asarray(jax.jit(full_mfirst)(x0))
        log(f"mfirst numerics: {np.max(np.abs(a - ref)) / np.max(np.abs(ref)):.3e}")
        marginal(full_mfirst, "full chain twiddle-lhs (n leading)", x0)
    marginal(full_current, "full chain CURRENT (0,1,2)", x0)


if "pallas" in which:
    from tensorflow_nufft_tpu.kernels import pallas_dft
    log(f"pallas supported: {pallas_dft.supported(geom, plan.grid_shape)}"
        f" blocks={pallas_dft._block_plan(geom, tuple(plan.grid_shape))}")
    ref = np.asarray(jax.jit(full_current)(x0))

    def pallas_stage(v):
        return pallas_dft.dft_truncate_deconvolve_tiled_pallas(
            v, plan, geom, batch)

    a = np.asarray(jax.jit(pallas_stage)(x0))
    log(f"pallas numerics: "
        f"{np.max(np.abs(a - ref)) / np.max(np.abs(ref)):.3e}")
    marginal(pallas_stage, "PALLAS 3-pass DFT", x0)

if "full" in which:
    zs = rng.standard_normal(M) + 1j * rng.standard_normal(M)
    from tensorflow_nufft_tpu.planar import to_planar as _tp
    src = jnp.asarray(_tp(zs.astype(np.complex64)))[None]
    marginal(lambda s: op(s), "full planned t1 (dispatched)", src)

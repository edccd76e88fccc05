"""Stage-by-stage compile/run probe for the 3D TPU path.

Times each pipeline stage's compile and execution separately so a
remote-compile stall can be attributed: binning, payload builds,
spread kernel, tiled mode-DFT (t1 post / t2 pre), interp kernel.

Usage: python tools/probe_3d.py [stage ...]   (default: all stages)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tensorflow_nufft_tpu.kernels import binning
from tensorflow_nufft_tpu.kernels.xla_ops import fold_and_rescale_split
from tensorflow_nufft_tpu.plan.plan import PlanSpec, make_plan

M = 800_000
GRID = (128, 128, 128)
TOL = 1e-6


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timed_compile(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    log(f"{name}: lower {t1-t0:.1f}s compile {t2-t1:.1f}s")
    t3 = time.perf_counter()
    out = jax.tree.map(np.asarray, compiled(*args))
    t4 = time.perf_counter()
    best = 1e9
    for _ in range(2):
        t5 = time.perf_counter()
        jax.tree.map(np.asarray, compiled(*args))
        best = min(best, time.perf_counter() - t5)
    log(f"{name}: first run {t4-t3:.2f}s steady {best*1e3:.0f} ms")
    return out


def main():
    stages = sys.argv[1:] or ["bin", "payload", "spread", "dft",
                              "amplify", "interp"]
    rng = np.random.default_rng(1)
    pts = jnp.asarray(
        rng.uniform(-np.pi, np.pi, (M, 3)).astype(np.float32))

    spec = PlanSpec("type_1", "forward", 3, GRID, "complex64", TOL, 0)
    plan = make_plan(spec)
    geom = binning.choose_geometry(plan.fine_shape, plan.width, M)
    log(f"fine={plan.fine_shape} tile={geom.tile} pad={geom.pad} "
        f"chunk={geom.chunk} num_tiles={geom.num_tiles} "
        f"num_chunks={geom.num_chunks}")

    hi, lo = fold_and_rescale_split(pts, plan.fine_shape, 0)
    hi, lo = jnp.asarray(hi), jnp.asarray(lo)

    binned = None
    if "bin" in stages or {"payload", "spread", "interp"} & set(stages):
        binned = timed_compile(
            "bin_points", lambda h, l: binning.bin_points((h, l), geom),
            hi, lo)
        binned = jax.tree.map(jnp.asarray, binned)

    if "payload" in stages:
        timed_compile("coords_payload",
                      lambda b: binning.build_coords_payload(b, geom),
                      binned)
        vals = jnp.asarray(
            rng.standard_normal((2, M)).astype(np.float32))
        timed_compile(
            "values_payload",
            lambda v, b: binning.build_values_payload(v, b, geom),
            vals, binned)

    if "spread" in stages:
        from tensorflow_nufft_tpu.kernels import pallas_spread
        vals = jnp.asarray(
            rng.standard_normal((2, M)).astype(np.float32))
        tiles = timed_compile(
            "spread_kernel",
            lambda v, b: pallas_spread.spread_pallas_tiles(
                v, (hi, lo), plan, binned=b)[0],
            vals, binned)
        log(f"tiles shape {tiles.shape} "
            f"({tiles.size * 4 / 2**20:.0f} MB)")

    if "dft" in stages:
        from tensorflow_nufft_tpu.fft.planar_fft import (
            dft_truncate_deconvolve_tiled)
        tshape = geom.tiles + (2,) + geom.ext
        t = jnp.asarray(rng.standard_normal(tshape).astype(np.float32))
        log(f"dft input {tshape} ({np.prod(tshape)*4/2**20:.0f} MB)")
        timed_compile(
            "dft_tiled(t1 post)",
            lambda x: dft_truncate_deconvolve_tiled(x, plan, geom, 1), t)

    if "amplify" in stages:
        from tensorflow_nufft_tpu.fft.planar_fft import (
            amplify_pad_dft_tiled)
        spec2 = PlanSpec("type_2", "forward", 3, GRID, "complex64",
                         TOL, 0)
        plan2 = make_plan(spec2)
        modes = jnp.asarray(
            rng.standard_normal((1,) + GRID + (2,)).astype(np.float32))
        timed_compile(
            "amplify_tiled(t2 pre)",
            lambda x: amplify_pad_dft_tiled(x, plan2, geom), modes)

    if "interp" in stages:
        from tensorflow_nufft_tpu.kernels import pallas_interp
        tshape = geom.tiles + (2,) + geom.ext
        t = jnp.asarray(rng.standard_normal(tshape).astype(np.float32))
        timed_compile(
            "interp_kernel",
            lambda x, b: pallas_interp.interp_pallas_tiled(
                x, (hi, lo), plan, geom, binned=b),
            t, binned)


if __name__ == "__main__":
    main()

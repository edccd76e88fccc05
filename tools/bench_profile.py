"""Stage-level TPU profiling for the tiled type-1 pipeline.

Times each stage with the loop-marginal method (K iterations inside one
jit; inputs perturbed nonlinearly per iteration so XLA cannot hoist or
CSE the stage). Usage:

    python bench_profile.py [--grid 256] [--points 65536] [--k 17]
                            [--chunk 0] [--tile 0]

With --chunk/--tile, overrides the binning geometry (sweep helper).
"""

import argparse
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def marginal(make, k2):
    """Seconds per iteration via the K=1 vs K=k2 marginal."""
    def timed(f):
        np.asarray(f())
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(f())
            best = min(best, time.perf_counter() - t0)
        return best
    t1 = timed(make(1))
    tk = timed(make(k2))
    return max((tk - t1) / (k2 - 1), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=256)
    ap.add_argument("--points", type=int, default=65536)
    ap.add_argument("--k", type=int, default=17)
    ap.add_argument("--chunk", type=int, default=0)
    ap.add_argument("--tile", type=int, default=0)
    ap.add_argument("--stages", default="all",
                    help="comma list: full,binpack,pack,spread,dft")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import tensorflow_nufft_tpu as tfft
    from tensorflow_nufft_tpu.kernels import binning, dispatch
    from tensorflow_nufft_tpu.kernels import pallas_spread
    from tensorflow_nufft_tpu.kernels.xla_ops import fold_and_rescale_split
    from tensorflow_nufft_tpu.fft.planar_fft import (
        dft_truncate_deconvolve_tiled)
    from tensorflow_nufft_tpu.plan.plan import PlanSpec, make_plan

    if args.chunk or args.tile:
        binning.set_geometry_overrides(chunk=args.chunk,
                                       tile_pref=args.tile)

    grid = (args.grid, args.grid)
    m = args.points
    rng = np.random.default_rng(42)
    points = rng.uniform(-np.pi, np.pi, (m, 2)).astype(np.float32)
    vals = rng.standard_normal((2, m)).astype(np.float32)  # channel-major

    spec = PlanSpec("type_1", "forward", 2, grid, "complex64", 1e-6, 0)
    plan = make_plan(spec)
    geom = binning.choose_geometry(plan.fine_shape, plan.width, m)
    log(f"geom: tile={geom.tile} pad={geom.pad} chunk={geom.chunk} "
        f"num_chunks={geom.num_chunks} ext={geom.ext} "
        f"tiles={geom.tiles}")

    pts_dev = jnp.asarray(points)
    vals_dev = jnp.asarray(vals)
    stages = args.stages.split(",") if args.stages != "all" else \
        ["full", "binpack", "pack", "spread", "dft"]

    pr = fold_and_rescale_split(pts_dev, plan.fine_shape, 0)
    binned = binning.bin_points(pr, geom)
    coords_pl = binning.build_coords_payload(binned, geom)
    binned = jax.tree.map(jnp.asarray, binned)

    def perturb(i):
        return (1.0 + 1e-3 * jnp.sin(i.astype(jnp.float32)))

    results = {}

    if "full" in stages:
        def make(k):
            @jax.jit
            def f():
                def body(i, acc):
                    o = tfft.planar.nufft(
                        vals_dev * perturb(i),
                        pts_dev, grid_shape=grid,
                        transform_type="type_1", tol=1e-6)
                    return acc + o[0, 0, 0]
                return jax.lax.fori_loop(0, k, body, 0.0)
            return f
        results["full"] = marginal(make, args.k)

    if "binpack" in stages:
        # fold + bin + coords payload (points-dependent; hoisted in
        # iterative use, still counts for one-shot transforms)
        def make(k):
            @jax.jit
            def f():
                def body(i, acc):
                    p = pts_dev * (1.0 + 1e-7 * perturb(i))
                    pr_i = fold_and_rescale_split(p, plan.fine_shape, 0)
                    b = binning.bin_points(pr_i, geom)
                    cp = binning.build_coords_payload(b, geom)
                    return acc + cp[0, 0, 0] + b.padpos[0]
                return jax.lax.fori_loop(0, k, body, 0.0)
            return f
        results["binpack"] = marginal(make, args.k)

    if "pack" in stages:
        def make(k):
            @jax.jit
            def f():
                def body(i, acc):
                    vp = binning.build_values_payload(
                        vals_dev * perturb(i), binned, geom)
                    return acc + vp[0, 0, 0]
                return jax.lax.fori_loop(0, k, body, 0.0)
            return f
        results["pack"] = marginal(make, args.k)

    if "spread" in stages:
        def make(k):
            @jax.jit
            def f():
                def body(i, acc):
                    tiles, _ = pallas_spread._spread_group(
                        vals_dev * perturb(i), binned, coords_pl, geom,
                        plan)
                    return acc + tiles[0, 0, 0, 0, 0]
                return jax.lax.fori_loop(0, k, body, 0.0)
            return f
        results["spread"] = marginal(make, args.k)
        if "pack" in results:
            results["spread_kernel"] = results["spread"] - results["pack"]

    if "spreadmats" in stages:
        # mats explicitly precomputed OUTSIDE the loop: isolates the
        # kernel's own cost from the (hoistable) mats build.
        import functools as ft
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        mats = jax.jit(lambda b: binning.build_kernel_matrix_payload(
            b, geom, plan))(binned)
        mats = jax.tree.map(jnp.asarray, mats)
        rank = geom.rank
        batch2 = 2

        def call_kernel(vals_p):
            values_pl = binning.build_values_payload(vals_p, binned, geom)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1 + rank,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=(
                    [pltpu.VMEM((pallas_spread.NBUF, mats.shape[1],
                                 geom.chunk), jnp.float32)]
                    + [pltpu.VMEM((pallas_spread.NBUF,)
                                  + values_pl.shape[1:], jnp.float32),
                       pltpu.SemaphoreType.DMA(
                           (pallas_spread.NBUF, 2))]),
            )
            return pl.pallas_call(
                ft.partial(pallas_spread._spread_kernel_resident_mats,
                           geom=geom, batch2=batch2),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    geom.tiles + (batch2,) + geom.ext, jnp.float32),
            )(binned.tile_bounds, *binned.chunk_tidx, mats, values_pl)

        def make(k):
            @jax.jit
            def f():
                def body(i, acc):
                    t = call_kernel(vals_dev * perturb(i))
                    return acc + t[0, 0, 0, 0, 0]
                return jax.lax.fori_loop(0, k, body, 0.0)
            return f
        results["spreadmats"] = marginal(make, args.k)

        values_pl0 = jax.jit(lambda v: binning.build_values_payload(
            v, binned, geom))(vals_dev)
        values_pl0 = jnp.asarray(values_pl0)

        def call_kernel_pl(values_pl):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1 + rank,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=(
                    [pltpu.VMEM((pallas_spread.NBUF, mats.shape[1],
                                 geom.chunk), jnp.float32)]
                    + [pltpu.VMEM((pallas_spread.NBUF,)
                                  + values_pl.shape[1:], jnp.float32),
                       pltpu.SemaphoreType.DMA(
                           (pallas_spread.NBUF, 2))]),
            )
            return pl.pallas_call(
                ft.partial(pallas_spread._spread_kernel_resident_mats,
                           geom=geom, batch2=batch2),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    geom.tiles + (batch2,) + geom.ext, jnp.float32),
            )(binned.tile_bounds, *binned.chunk_tidx, mats, values_pl)

        def make2(k):
            @jax.jit
            def f():
                def body(i, acc):
                    t = call_kernel_pl(values_pl0 * perturb(i))
                    return acc + t[0, 0, 0, 0, 0]
                return jax.lax.fori_loop(0, k, body, 0.0)
            return f
        results["kernel_only"] = marginal(make2, args.k)

    if "dft" in stages:
        tiles0 = jax.jit(
            lambda v: pallas_spread._spread_group(
                v, binned, coords_pl, geom, plan)[0])(vals_dev)
        tiles0 = jnp.asarray(tiles0)

        def make(k):
            @jax.jit
            def f():
                def body(i, acc):
                    out = dft_truncate_deconvolve_tiled(
                        tiles0 * perturb(i), plan, geom, 1)
                    return acc + out[0, 0, 0, 0]
                return jax.lax.fori_loop(0, k, body, 0.0)
            return f
        results["dft"] = marginal(make, args.k)

    for name, sec in results.items():
        log(f"{name:14s}: {sec * 1e3:8.3f} ms")
    known = sum(v for k_, v in results.items()
                if k_ in ("pack", "spread_kernel", "dft"))
    if "full" in results and known:
        log(f"{'unaccounted':14s}: {(results['full'] - known - 0.0) * 1e3:8.3f} ms "
            f"(full - pack - spread_kernel - dft)")


if __name__ == "__main__":
    main()

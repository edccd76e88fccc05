"""TPU probe: 20M-point 2D type-1 through the sort-based big-M binning
(>= 2**24 slots, binning._ranks_and_starts_bigm), cross-checked by
additivity: the same transform computed as the sum of 4x 5M-point
transforms, each below the f32-exact ceiling (prefix-sum path).

Unplanned calls keep the points as traced arguments, so no payload is
inlined as an MLIR literal (the relay 413-caps literal uploads).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import tensorflow_nufft_tpu as tfft  # noqa: E402
from tensorflow_nufft_tpu.kernels import binning  # noqa: E402
from tensorflow_nufft_tpu.planar import to_planar  # noqa: E402

GRID = (512, 512)
M = 20_000_000
SPLITS = 4


def main():
    rng = np.random.default_rng(11)
    pts = rng.uniform(-np.pi, np.pi, (M, 2)).astype(np.float32)
    z = (rng.standard_normal(M) + 1j * rng.standard_normal(M)
         ).astype(np.complex64)
    src = to_planar(z)[None]

    # Geometry check: this M really is past the f32 ceiling.
    from tensorflow_nufft_tpu.plan.plan import make_plan
    from tensorflow_nufft_tpu.ops.nufft_ops import PlanSpec
    spec = PlanSpec(transform_type="type_1", fft_direction="forward",
                    rank=2, grid_shape=GRID, dtype_name="complex64",
                    tol=1e-6, points_range=1, spread_only=False,
                    upsampling_factor=2.0, backend="auto",
                    kernel_evaluation_method="auto")
    plan = make_plan(spec)
    geom = binning.choose_geometry(plan.fine_shape, plan.width, M)
    slots = geom.num_chunks * geom.chunk
    print(f"geom: tile={geom.tile} chunk={geom.chunk} "
          f"slots={slots} ({slots / 2**24:.2f}x 2^24), "
          f"exact_f32={binning.ranking_is_exact(geom)}", flush=True)
    assert not binning.ranking_is_exact(geom)

    @jax.jit
    def t1(s, p):
        return tfft.planar.nufft(s, p, grid_shape=GRID,
                                 transform_type="type_1")

    t0 = time.perf_counter()
    big = np.asarray(t1(jnp.asarray(src), jnp.asarray(pts)))
    print(f"big-M transform done in {time.perf_counter() - t0:.1f}s "
          f"(incl. compile)", flush=True)

    step = M // SPLITS
    acc = None
    for i in range(SPLITS):
        gsub = binning.choose_geometry(plan.fine_shape, plan.width,
                                       step)
        assert binning.ranking_is_exact(gsub)
        part = np.asarray(t1(jnp.asarray(src[:, i * step:(i + 1) * step]),
                             jnp.asarray(pts[i * step:(i + 1) * step])))
        acc = part if acc is None else acc + part
        print(f"  split {i}: done", flush=True)

    scale = np.abs(acc).max()
    err = np.abs(big - acc).max() / scale
    print(f"rel err (big-M sorted path vs 4x split f32 path): {err:.3e}",
          flush=True)
    assert err < 1e-4, err

    # Throughput of the big-M transform (marginal pair).
    def make(k):
        @jax.jit
        def f(s, p):
            def body(i, a):
                sp = s + 1e-3 * jnp.sin(s * i.astype(jnp.float32))
                o = jax.lax.optimization_barrier(
                    tfft.planar.nufft(sp, p, grid_shape=GRID,
                                      transform_type="type_1"))
                return a + o.ravel()[0]
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    sj, pj = jnp.asarray(src), jnp.asarray(pts)
    f1, f2 = make(1), make(5)
    np.asarray(f1(sj, pj)); np.asarray(f2(sj, pj))
    b1 = b2 = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(f1(sj, pj))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(f2(sj, pj))
        b2 = min(b2, time.perf_counter() - t0)
    per = (b2 - b1) / 4
    print(f"unplanned 2d t1 512^2 @20M: {per * 1e3:.1f} ms/transform "
          f"({M / per / 1e6:.0f}M pts/s)", flush=True)
    print("PROBE OK", flush=True)


if __name__ == "__main__":
    main()

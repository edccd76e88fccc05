"""Channel-group width experiment (BENCH_NOTES 'multicoil mats
re-streaming'): batch-16 planar planned type-1 (B2=32 channels) at the
2D 256^2 / 200k headline geometry, with MAX_CHANNELS in {8, 16, 32}.

Each group re-streams the full kernel-matrix payload, so fewer/wider
groups cut payload DMA — IF the contraction-stack VMEM models still
admit a usable group size and the static channel unroll doesn't blow
up the remote compile. Measure, don't guess: run this on the real TPU.

Each width runs in its own subprocess (fresh jit caches; one remote
compile hang must not kill the sweep).
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(width: int) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    import tensorflow_nufft_tpu as tfft
    from tensorflow_nufft_tpu.kernels import pallas_spread

    pallas_spread.MAX_CHANNELS = width
    GRID, M, B, TOL, K2 = 256, 200_000, 16, 1e-6, 17
    rng = np.random.default_rng(7)
    pts = rng.uniform(-np.pi, np.pi, (M, 2)).astype(np.float32)
    z = (rng.standard_normal((B, M))
         + 1j * rng.standard_normal((B, M))).astype(np.complex64)
    s = jnp.asarray(np.stack([z.real, z.imag], axis=-1))  # [B, M, 2]

    op = tfft.planar.PlannedNufft(pts, (GRID, GRID),
                                  transform_type="type_1", tol=TOL)
    if not op._planned:
        print(f"width={width}: planned Pallas path NOT selected "
              f"(backend={jax.default_backend()}, level={op._level}) — "
              f"nothing to measure", flush=True)
        return
    from tensorflow_nufft_tpu.kernels.pallas_spread import (
        resident_group_size, streaming_group_size)
    print(f"width={width}: stream_group={streaming_group_size(op.geom)} "
          f"resident_group={resident_group_size(op.geom)}", flush=True)

    def make(k):
        def f(x):
            def body(i, acc):
                xp = x + 1e-3 * jnp.sin(x * i.astype(jnp.float32))
                o = jax.lax.optimization_barrier(op(xp))
                return acc + o[0, 0, 0, 0]
            return jax.lax.fori_loop(0, k, body, 0.0)
        return jax.jit(f)

    def timed(f):
        np.asarray(f(s))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(s))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = timed(make(1)), timed(make(K2))
    per = max((tk - t1) / (K2 - 1), 1e-9)
    print(f"width={width}: {per * 1e3:.3f} "
          f"ms/batch16-transform ({B * M / per / 1e6:.1f}M pts/s)",
          flush=True)


def main():
    for width in (8, 16, 32):
        print(f"=== MAX_CHANNELS={width} ===", flush=True)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(width)],
                cwd=REPO, timeout=2400)
            if r.returncode != 0:
                print(f"width={width}: FAILED rc={r.returncode}",
                      flush=True)
        except subprocess.TimeoutExpired:
            # One hung remote compile must not kill the sweep.
            print(f"width={width}: TIMEOUT after 2400s", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_one(int(sys.argv[1]))
    else:
        main()

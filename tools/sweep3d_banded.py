"""Banded 3D geometry sweep on TPU: (tile, chunk, RANK3_SUB) vs the
full planned t1 time at 128^3 / 800k. Each config in a subprocess
(fresh jit cache; survive compile hangs)."""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    # (tile, chunk, sub) ; None = auto
    (None, 0, 128),                    # current default (128,16,64)/1024
    ((256, 16, 64), 0, 128),
    ((128, 8, 64), 0, 128),
    ((128, 16, 64), 512, 128),
    ((128, 16, 64), 0, 256),
    ((256, 16, 64), 0, 256),
    # Round 4: shrink the fold's M = band*E1 from 384 (3 MXU blocks)
    # to 256 (2 full blocks) via tile_y=8 (E1=16); coarse-z variants
    # cut tile count (less chunk padding -> smaller values gather).
    ((128, 8, 64), 512, 128),          # cfg6: M=256, 256 tiles
    ((256, 8, 64), 512, 128),          # cfg7: M=256, 128 tiles
    ((256, 16, 64), 512, 128),         # cfg8: M=384 control, 64 tiles
]


def run_one(idx: int) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    import tensorflow_nufft_tpu as tfft
    from tensorflow_nufft_tpu.kernels import binning, pallas_spread
    from tensorflow_nufft_tpu.planar import to_planar

    tile, chunk, sub = CONFIGS[idx]
    pallas_spread.RANK3_SUB = sub
    binning.set_geometry_overrides(chunk=chunk, tile=tile)
    GRID, M = (128, 128, 128), 800_000
    rng = np.random.default_rng(7)
    pts = rng.uniform(-np.pi, np.pi, (M, 3)).astype(np.float32)
    zs = rng.standard_normal(M) + 1j * rng.standard_normal(M)
    s = jnp.asarray(to_planar(zs.astype(np.complex64)))[None]

    op = tfft.planar.PlannedNufft(pts, GRID, transform_type="type_1")
    if not op._planned:
        print(f"cfg{idx}: NOT PLANNED (config unsupported)", flush=True)
        return
    band = None if op.band_info is None else op.band_info[0]
    print(f"cfg{idx}: tile={op.geom.tile} chunk={op.geom.chunk} "
          f"chunks={op.geom.num_chunks} band={band} sub={sub}",
          flush=True)

    K1, K2 = 2, 12

    def make(k):
        @jax.jit
        def f(x):
            def body(i, acc):
                xp = x + 1e-3 * jnp.sin(x * i.astype(jnp.float32))
                o = jax.lax.optimization_barrier(op(xp))
                return acc + o[0, 0, 0, 0, 0]
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    def timed(f):
        np.asarray(f(s))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(s))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = timed(make(K1)), timed(make(K2))
    per = max((tk - t1) / (K2 - K1), 1e-9)
    print(f"cfg{idx}: {per * 1e3:.3f} ms/transform "
          f"({M / per / 1e6:.1f}M pts/s)", flush=True)


def main(only=None):
    for idx in (only if only is not None else range(len(CONFIGS))):
        print(f"=== cfg {idx}: {CONFIGS[idx]} ===", flush=True)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(idx)],
                cwd=REPO, timeout=2400)
            if r.returncode != 0:
                print(f"cfg{idx}: FAILED rc={r.returncode}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"cfg{idx}: TIMEOUT", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        main([int(i) for i in sys.argv[2].split(",")])
    elif len(sys.argv) > 1:
        run_one(int(sys.argv[1]))
    else:
        main()

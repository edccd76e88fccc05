"""Sweep rank-3 tile/chunk geometry on the TPU 3d_t1_128_800k case.

Each config rebuilds a PlannedNufft (fresh trace -> fresh compile) with
module-level tuning overrides, and times the marginal per-transform
cost. Run: python tools/sweep3d.py [config_idx ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import tensorflow_nufft_tpu as tfft                     # noqa: E402
from tensorflow_nufft_tpu.planar import to_planar       # noqa: E402
from tensorflow_nufft_tpu.kernels import binning        # noqa: E402

CONFIGS = [
    # (name, lead_prefs, chunk_override)
    ("lead8_auto", (8, 16, 24, 32, 40, 64, 48, 96, 128), 0),
    ("lead8_c512", (8, 16, 24, 32, 40, 64, 48, 96, 128), 512),
    ("lead8_c1024", (8, 16, 24, 32, 40, 64, 48, 96, 128), 1024),
    ("lead16_c1024", (16, 8, 24, 32, 40, 64, 48, 96, 128), 1024),
    ("lead8_c2048", (8, 16, 24, 32, 40, 64, 48, 96, 128), 2048),
    ("lead32_c2048", (32, 16, 24, 40, 64, 8, 48, 96, 128), 2048),
]


def run_case(lead_prefs, chunk):
    binning._TILE_PREFS_3D = (tuple(lead_prefs),) + binning._TILE_PREFS_3D[1:]
    binning.set_geometry_overrides(chunk=chunk)
    grid = (128, 128, 128)
    m = 800_000
    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.uniform(-np.pi, np.pi, (m, 3)).astype(np.float32))
    z = (rng.standard_normal((m,)) + 1j * rng.standard_normal((m,)))
    src = jnp.asarray(to_planar(z.astype(np.complex64)))[None]
    op = tfft.planar.PlannedNufft(pts, grid, transform_type="type_1")
    geom = binning.choose_geometry(grid, 8, m)
    print(f"  geom: tile={geom.tile} chunk={geom.chunk} "
          f"num_chunks={geom.num_chunks}", file=sys.stderr, flush=True)

    def make(k):
        def f(s):
            def body(i, acc):
                return acc + op(s * (1.0 + 1e-6 * i)).ravel()[0]
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    f1, f2 = jax.jit(make(1)), jax.jit(make(5))
    np.asarray(f1(src)); np.asarray(f2(src))
    b1 = b2 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(f1(src))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(f2(src))
        b2 = min(b2, time.perf_counter() - t0)
    per = max((b2 - b1) / 4, 1e-9)
    return per


def main():
    idxs = [int(a) for a in sys.argv[1:]] or range(len(CONFIGS))
    print("backend:", jax.devices()[0].platform, file=sys.stderr, flush=True)
    for i in idxs:
        name, lead, chunk = CONFIGS[i]
        print(f"[{i}] {name} ...", file=sys.stderr, flush=True)
        t0 = time.time()
        try:
            per = run_case(lead, chunk)
        except Exception as e:  # noqa: BLE001
            print(f"[{i}] {name}: ERROR {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            continue
        print(f"[{i}] {name}: {per*1e3:.3f} ms/transform "
              f"({8e5/per/1e6:.1f}M pts/s) [wall {time.time()-t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()

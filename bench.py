"""Headline benchmark: 2D type-1 NUFFT throughput on one TPU chip.

Config (BASELINE.md): 256x256 mode grid, 65536 uniform-random points,
eps=1e-6, complex64 (planar on TPU). Baseline target: 1e8 NU points/s.

Timing methodology: the relay to the TPU has ~30-100 ms fixed dispatch +
readback latency and an unreliable block_until_ready, so the transform is
iterated inside a single jit (lax.fori_loop, input perturbed per
iteration to prevent CSE) and the marginal time between K=1 and K=K2
runs is used. Accuracy is cross-checked against the dense oracle on a
point subset before timing.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "points/s", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np

BASELINE_PTS_PER_SEC = 1.0e8
GRID = 256
NUM_POINTS = 65536
TOL = 1e-6
K2 = 17


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import tensorflow_nufft_tpu as tfft
    from tensorflow_nufft_tpu.planar import to_planar

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    rng = np.random.default_rng(42)
    points = rng.uniform(-np.pi, np.pi,
                         (NUM_POINTS, 2)).astype(np.float32)
    z = (rng.standard_normal(NUM_POINTS)
         + 1j * rng.standard_normal(NUM_POINTS)).astype(np.complex64)
    strengths = to_planar(z)

    # --- Accuracy gate vs dense oracle (subset of modes).
    out = np.asarray(
        tfft.planar.nufft(strengths, points, grid_shape=(GRID, GRID),
                          transform_type="type_1", tol=TOL))
    sub = 64
    kv = np.arange(GRID) - GRID // 2
    krow = kv[:sub]
    # Check a band of modes: F[k] = sum_m c_m exp(-i k . x_m)
    phase = np.exp(-1j * (np.outer(krow, np.ones(NUM_POINTS))
                          * points[:, 0][None]
                          + kv[0] * points[:, 1][None]))
    oracle_band = phase @ z
    got_band = out[:sub, 0, 0] + 1j * out[:sub, 0, 1]
    err = np.max(np.abs(got_band - oracle_band)) / np.max(
        np.abs(oracle_band))
    log(f"accuracy vs oracle (mode band): {err:.2e} (tol {TOL:g})")
    accurate = err < 10 * TOL

    # --- Throughput (marginal-cost timing).
    pts_dev = jnp.asarray(points)
    s_dev = jnp.asarray(strengths)

    def make(k):
        def f(pts):
            def body(i, acc):
                o = tfft.planar.nufft(
                    s_dev * (1.0 + 1e-6 * i), pts,
                    grid_shape=(GRID, GRID), transform_type="type_1",
                    tol=TOL)
                return acc + o[0, 0, 0]
            return jax.lax.fori_loop(0, k, body, 0.0)
        return jax.jit(f)

    def timed(f):
        np.asarray(f(pts_dev))       # compile + warm
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(f(pts_dev))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(make(1))
    tk = timed(make(K2))
    per = max((tk - t1) / (K2 - 1), 1e-9)
    pts_per_sec = NUM_POINTS / per
    log(f"per-transform: {per * 1e3:.3f} ms")
    if not accurate:
        pts_per_sec = 0.0
        log("ACCURACY GATE FAILED - reporting 0")

    print(json.dumps({
        "metric": "nufft_2d_type1_256_eps1e-6_c64_throughput",
        "value": round(pts_per_sec, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_sec / BASELINE_PTS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()

"""TPU bisect of the 3D 128^3 planned-type-1 accuracy (VERDICT r3
item 5): where does the end-to-end error vs the f64 CPU census come
from? CPU interpret-mode at small scale shows ~1.3e-6 at tol 1e-5 with
banding exonerated (band covers the kernel support by construction;
see tools/study_yband.py neighborhood); the round-3 hardware spot read
was 2.37e-5 — this script attributes the gap on the real chip.

Dimensions:
  - full current path (banded + fused DFT-A + Pallas DFT)
  - XLA DFT post-stage (pallas_dft disabled)
  - direct vs horner kernel evaluation
  - tol in {1e-4, 1e-5, 1e-6} (floor vs tol-tracking)
  - M in {200k, 800k} (accumulation scaling)

Uses the cached f64 reference from bench_suite.census_3d_case (builds
it on first use). Run: python tools/census_bisect.py [--grid 128]
"""
import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def run_case(grid, m, tol, seed, use_pallas_dft=True, kev="auto"):
    import jax.numpy as jnp
    import tensorflow_nufft_tpu as tfft
    from tensorflow_nufft_tpu.planar import to_planar
    from tensorflow_nufft_tpu.kernels import pallas_dft, pallas_spread
    import bench_suite

    ref_path = (pathlib.Path(__file__).resolve().parents[1] / "build"
                / f"census3d_{grid}_{m}_{seed}_{tol:g}.npz")
    if not ref_path.exists():
        bench_suite.census_3d_case(grid=grid, m=m, tol=tol, seed=seed)
    data = np.load(ref_path)

    rng = np.random.default_rng(seed)
    gs = (grid,) * 3
    pts = rng.uniform(-np.pi, np.pi, (m, 3)).astype(np.float32)
    z = (rng.standard_normal(m)
         + 1j * rng.standard_normal(m)).astype(np.complex64)
    src = jnp.asarray(to_planar(z))[None]

    saved = (pallas_dft.supported, pallas_spread.fused_dfta_fits)
    try:
        if not use_pallas_dft:
            pallas_dft.supported = lambda *a, **k: False
            pallas_spread.fused_dfta_fits = lambda *a, **k: False
        opts = tfft.Options(kernel_evaluation_method=kev)
        op = tfft.planar.PlannedNufft(
            jnp.asarray(pts), gs, transform_type="type_1", tol=tol,
            options=opts)
        out = np.asarray(op(src))[0]
    finally:
        pallas_dft.supported, pallas_spread.fused_dfta_fits = saved
    got = out[..., 0] + 1j * out[..., 1]
    scale = float(data["scale"])
    err_impl = float(np.max(np.abs(got - data["cpu_ref"])) / scale)
    idx = data["subset_idx"]
    err_total = float(
        np.max(np.abs(got.reshape(-1)[idx] - data["subset_oracle"]))
        / scale)
    tag = (f"m={m} tol={tol:g} dft={'pallas' if use_pallas_dft else 'xla'}"
           f" kev={kev} level={op._level}"
           f" banded={getattr(op, 'band_info', None) is not None}")
    print(f"{tag}: err_impl={err_impl:.3e} err_total={err_total:.3e}",
          flush=True)
    return err_impl


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--grid", type=int, default=128)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()
    g, s = args.grid, args.seed
    # Baseline + DFT attribution at the headline config.
    run_case(g, 800_000, 1e-6, s, use_pallas_dft=True)
    run_case(g, 800_000, 1e-6, s, use_pallas_dft=False)
    # Kernel evaluation method.
    run_case(g, 800_000, 1e-6, s, kev="direct")
    # Tol tracking (the round-3 spot read was at 1e-5).
    run_case(g, 800_000, 1e-5, s)
    run_case(g, 800_000, 1e-4, s)
    # Accumulation scaling in M.
    run_case(g, 200_000, 1e-6, s)


if __name__ == "__main__":
    main()

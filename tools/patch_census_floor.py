"""Adds the f32-floor field to 3D census reference files built before
make_census_ref recorded it: recomputes the CPU float32 planar
pipeline at the same inputs and stores err vs the stored f64 reference
as ``floor_f32``. Forced-CPU; safe to run while the TPU is busy.

Usage: JAX_PLATFORMS=cpu python tools/patch_census_floor.py
"""
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import tensorflow_nufft_tpu as tfft  # noqa: E402
from tensorflow_nufft_tpu.planar import to_planar  # noqa: E402


def patch(path: pathlib.Path) -> None:
    data = dict(np.load(path))
    if "floor_f32" in data:
        print(f"{path.name}: already has floor_f32="
              f"{float(data['floor_f32']):.3e}")
        return
    # census3d_{grid}_{m}_{seed}_{tol}.npz
    stem = path.stem.split("_")
    grid, m, seed, tol = (int(stem[1]), int(stem[2]), int(stem[3]),
                          float(stem[4]))
    rng = np.random.default_rng(seed)
    gs = (grid,) * 3
    pts = rng.uniform(-np.pi, np.pi, (m, 3)).astype(np.float32)
    z = (rng.standard_normal(m)
         + 1j * rng.standard_normal(m)).astype(np.complex64)
    pf = np.asarray(tfft.planar.nufft(
        jnp.asarray(to_planar(z)), jnp.asarray(pts), grid_shape=gs,
        transform_type="type_1", tol=tol))
    got32 = pf[..., 0] + 1j * pf[..., 1]
    floor = float(np.max(np.abs(got32 - data["cpu_ref"]))
                  / float(data["scale"]))
    data["floor_f32"] = floor
    np.savez(path, **data)
    print(f"{path.name}: floor_f32={floor:.3e}")


if __name__ == "__main__":
    for p in sorted((REPO / "build").glob("census3d_*.npz")):
        patch(p)

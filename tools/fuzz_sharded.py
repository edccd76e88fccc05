"""Fuzz the sharded paths on the 8-device CPU mesh vs unsharded."""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh
import tensorflow_nufft_tpu as tfft
from tensorflow_nufft_tpu.parallel import (
    sharded_nufft, sharded_nufft_grid, sharded_nufft_type3)
from tensorflow_nufft_tpu.planar import from_planar, to_planar

rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
N = int(sys.argv[2]) if len(sys.argv) > 2 else 15
fails = 0


def relerr(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) or 1.0)


for i in range(N):
    shape = [(2, 4), (4, 2), (8, 1), (1, 8)][int(rng.integers(0, 4))]
    devs = np.array(jax.devices()[:8]).reshape(shape)
    mesh = Mesh(devs, ("data", "points"))
    rank = int(rng.integers(1, 4))
    dims = tuple(int(rng.choice([8, 12, 16])) for _ in range(rank))
    npts_ax = shape[1]
    m = int(rng.integers(1, 6)) * npts_ax * 8
    b = int(rng.integers(1, 3)) * shape[0]
    tt = str(rng.choice(["type_1", "type_2"]))
    fd = str(rng.choice(["forward", "backward"]))
    tol = 1e-5
    pts = rng.uniform(-np.pi*0.99, np.pi*0.99, (m, rank)).astype(np.float32)
    desc = f"[{i}] mesh={shape} {tt} {fd} dims={dims} m={m} b={b}"
    try:
        if tt == "type_1":
            z = (rng.standard_normal((b, m))
                 + 1j*rng.standard_normal((b, m))).astype(np.complex64)
            src = to_planar(z)
            got = sharded_nufft(jnp.asarray(src), jnp.asarray(pts), mesh,
                                grid_shape=dims, transform_type=tt,
                                fft_direction=fd, tol=tol)
            ref = tfft.planar.nufft(src, pts, grid_shape=dims,
                                    transform_type=tt, fft_direction=fd,
                                    tol=tol)
        else:
            z = (rng.standard_normal((b,) + dims)
                 + 1j*rng.standard_normal((b,) + dims)).astype(np.complex64)
            src = to_planar(z)
            got = sharded_nufft(jnp.asarray(src), jnp.asarray(pts), mesh,
                                transform_type=tt, fft_direction=fd,
                                tol=tol)
            ref = tfft.planar.nufft(src, pts, transform_type=tt,
                                    fft_direction=fd, tol=tol)
        e = relerr(got, ref)
        if e > 1e-5:
            fails += 1
            print(f"FAIL {desc} sharded: {e:.2e}", flush=True)

        # grid sharding (leading dim must divide npts_ax): adjust dims.
        gdims = (npts_ax * max(1, dims[0] // npts_ax),) + dims[1:]
        if tt == "type_1":
            gotg = sharded_nufft_grid(
                jnp.asarray(src), jnp.asarray(pts), mesh,
                grid_shape=gdims, transform_type=tt, fft_direction=fd,
                tol=tol, grid_axis="points")
            refg = tfft.planar.nufft(src, pts, grid_shape=gdims,
                                     transform_type=tt, fft_direction=fd,
                                     tol=tol)
            e = relerr(gotg, refg)
            if e > 1e-5:
                fails += 1
                print(f"FAIL {desc} grid-sharded: {e:.2e}", flush=True)

        # type-3 (M and K divide npts_ax)
        k = m
        t3t = rng.uniform(-10, 10, (k, rank)).astype(np.float32)
        x3 = rng.uniform(-2, 2, (m, rank)).astype(np.float32)
        c3 = to_planar((rng.standard_normal((b, m)) +
                        1j*rng.standard_normal((b, m))).astype(np.complex64))
        got3 = sharded_nufft_type3(jnp.asarray(c3), x3, t3t, mesh,
                                   fft_direction=fd, tol=tol)
        ref3 = tfft.planar.Type3Plan(x3, t3t, fft_direction=fd,
                                     tol=tol)(jnp.asarray(c3))
        e = relerr(got3, ref3)
        if e > 1e-5:
            fails += 1
            print(f"FAIL {desc} type3-sharded: {e:.2e}", flush=True)
    except Exception as ex:
        fails += 1
        print(f"ERROR {desc}: {type(ex).__name__}: {str(ex)[:200]}",
              flush=True)

print(f"done: {N} cases, {fails} failures", flush=True)

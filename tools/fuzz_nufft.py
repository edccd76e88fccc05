"""Differential fuzz: random configs vs the dense oracle, CPU."""
import sys, traceback
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import tensorflow_nufft_tpu as tfft

rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
N_CASES = int(sys.argv[2]) if len(sys.argv) > 2 else 40
fails = 0

for i in range(N_CASES):
    rank = int(rng.integers(1, 4))
    # odd, even, prime, tiny dims all allowed for full nufft
    dims = tuple(int(rng.integers(3, 20)) for _ in range(rank))
    m = int(rng.integers(1, 60))
    dtype = rng.choice([np.complex64, np.complex128])
    rdt = np.float32 if dtype == np.complex64 else np.float64
    tol = float(rng.choice([1e-2, 1e-4, 1e-6, 1e-8]))
    tt = rng.choice(["type_1", "type_2", "type_3"])
    fd = rng.choice(["forward", "backward"])
    prange = int(rng.choice([0, 1, 2]))
    span = [np.pi, 3*np.pi, 30.0][prange]
    kev = rng.choice(["auto", "direct"])
    sb = tuple(int(d) for d in rng.integers(1, 3, size=rng.integers(0, 3)))
    gate = 50 * max(tol, 4e-6 if dtype == np.complex64 else 0)
    gate = max(gate, 1e-4 if dtype == np.complex64 else 1e-11)
    # type-3 takes arbitrary-range points by design: points_range does
    # not apply, so log pr=na there (the call below omits it).
    pr_desc = "na" if tt == "type_3" else str(prange)
    desc = f"[{i}] {tt} {fd} r{rank} dims={dims} m={m} {np.dtype(dtype).name} tol={tol:g} pr={pr_desc} kev={kev} sb={sb}"
    try:
        opts = tfft.Options(points_range=tfft.PointsRange(prange),
                            kernel_evaluation_method=str(kev))
        if tt == "type_3":
            x = rng.uniform(-4, 4, (m, rank)).astype(np.float64)
            t = rng.uniform(-15, 15, (max(1, m//2), rank)).astype(np.float64)
            if dtype == np.complex64:
                x, t = x.astype(np.float32), t.astype(np.float32)
            c = (rng.standard_normal(sb + (m,))
                 + 1j*rng.standard_normal(sb + (m,))).astype(dtype)
            got = tfft.nufft_type3(c, x, t, fft_direction=str(fd), tol=tol,
                                   options=tfft.Options(
                                       kernel_evaluation_method=str(kev)))
            want = tfft.nudft_type3(c, x, t, fft_direction=str(fd))
        else:
            pts = rng.uniform(-span*0.999, span*0.999, (m, rank)).astype(rdt)
            if tt == "type_1":
                c = (rng.standard_normal(sb + (m,))
                     + 1j*rng.standard_normal(sb + (m,))).astype(dtype)
                got = tfft.nufft(c, pts, grid_shape=dims, transform_type="type_1",
                                 fft_direction=str(fd), tol=tol, options=opts)
                want = tfft.nudft(c, pts, grid_shape=dims,
                                  transform_type="type_1", fft_direction=str(fd))
            else:
                f = (rng.standard_normal(sb + dims)
                     + 1j*rng.standard_normal(sb + dims)).astype(dtype)
                got = tfft.nufft(f, pts, transform_type="type_2",
                                 fft_direction=str(fd), tol=tol, options=opts)
                want = tfft.nudft(f, pts, transform_type="type_2",
                                  fft_direction=str(fd))
        g, w = np.asarray(got), np.asarray(want)
        scale = np.max(np.abs(w)) or 1.0
        err = np.max(np.abs(g - w)) / scale
        ok = err <= gate and g.shape == w.shape
        if not ok:
            fails += 1
            print(f"FAIL {desc}: err={err:.3e} gate={gate:.1e} shapes {g.shape} {w.shape}", flush=True)
    except Exception as e:
        fails += 1
        print(f"ERROR {desc}: {type(e).__name__}: {e}", flush=True)
        traceback.print_exc(limit=3)

print(f"done: {N_CASES} cases, {fails} failures", flush=True)

"""Differential fuzz of the planar pipeline (XLA + forced-pallas
interpret mode + PlannedNufft) vs the complex oracle, CPU."""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import tensorflow_nufft_tpu as tfft
from tensorflow_nufft_tpu.planar import from_planar, to_planar

rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
N = int(sys.argv[2]) if len(sys.argv) > 2 else 30
fails = 0

for i in range(N):
    rank = int(rng.integers(1, 4))
    dims = tuple(int(rng.integers(4, 24)) for _ in range(rank))
    m = int(rng.integers(2, 80))
    tol = float(rng.choice([1e-3, 1e-5, 1e-6]))
    tt = str(rng.choice(["type_1", "type_2"]))
    fd = str(rng.choice(["forward", "backward"]))
    batch = int(rng.integers(1, 4))
    pts = rng.uniform(-np.pi*0.999, np.pi*0.999, (m, rank)).astype(np.float32)
    z = (rng.standard_normal((batch,) + (dims if tt == "type_2" else (m,)))
         + 1j*rng.standard_normal((batch,) + (dims if tt == "type_2" else (m,)))
         ).astype(np.complex64)
    kw = dict(grid_shape=dims) if tt == "type_1" else {}
    desc = f"[{i}] {tt} {fd} dims={dims} m={m} b={batch} tol={tol:g}"
    try:
        want = np.asarray(tfft.nudft(
            z.astype(np.complex128), pts.astype(np.float64),
            transform_type=tt, fft_direction=fd, **kw))
        scale = np.max(np.abs(want)) or 1.0
        gate = max(50*tol, 2e-4)

        outs = {}
        outs["xla"] = tfft.planar.nufft(
            to_planar(z), pts, transform_type=tt, fft_direction=fd,
            tol=tol, options=tfft.Options(backend="xla"), **kw)
        try:
            outs["pallas"] = tfft.planar.nufft(
                to_planar(z), pts, transform_type=tt, fft_direction=fd,
                tol=tol, options=tfft.Options(backend="pallas"), **kw)
        except ValueError as e:
            if "pallas" not in str(e):
                raise
        try:
            op = tfft.planar.PlannedNufft(
                pts, dims, transform_type=tt, fft_direction=fd, tol=tol,
                options=tfft.Options(backend="pallas"))
            outs["planned"] = op(to_planar(z))
            # Slot-order surface: the slot-space apply conjugated back
            # to point order must match the point-order apply.
            if op._planned:
                if tt == "type_2":
                    outs["slots"] = op.from_slots(
                        op.apply_to_slots(to_planar(z)))
                else:
                    outs["slots"] = op.apply_from_slots(
                        op.to_slots(to_planar(z)))
        except ValueError as e:
            if "pallas" not in str(e):
                raise
        for name, out in outs.items():
            g = from_planar(np.asarray(out))
            err = np.max(np.abs(g - want)) / scale
            if err > gate or g.shape != want.shape:
                fails += 1
                print(f"FAIL {desc} [{name}]: err={err:.3e} gate={gate:.1e}",
                      flush=True)
    except Exception as e:
        fails += 1
        print(f"ERROR {desc}: {type(e).__name__}: {str(e)[:160]}", flush=True)

print(f"done: {N} cases, {fails} failures", flush=True)

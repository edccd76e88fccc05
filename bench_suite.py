"""Full benchmark suite: the reference's 8 cases plus BASELINE configs.

Reference harness (nufft_ops_test.py:728-809): 2D 256^2 type-1/2 with
200k points (single / batch-16 shared points / batch-16 per-batch
points), 3D 128^3 type-1/2 with 800k points. BASELINE.md adds the 65k 2D
case, a radial multicoil case, and a CG-SENSE autodiff case.

Run: python bench_suite.py [--quick] [--case NAME] [--timeout SECS]
Prints one JSON line per case to stdout (suite results; the driver's
single-line benchmark is bench.py).

By default each case runs in its own subprocess with a wall-clock
timeout and one retry: the remote TPU compile service occasionally
hangs or 500s (see CLAUDE.md), and one stuck case must not block the
rest of the suite. ``--case NAME`` runs a single case in-process.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def peak_bytes():
    """Best-effort device peak-memory counter (the reference harness
    records memory via run_op_benchmark, nufft_ops_test.py:728-809).
    None where the backend does not expose allocator stats."""
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return stats.get("peak_bytes_in_use")
    except Exception:
        return None


def attach_peak(result, base):
    """Adds peak_bytes to a case result — only when this case raised
    the process-cumulative peak past ``base`` (the value at case start),
    so --inprocess runs never report an earlier, larger case's peak as
    their own. In the default one-subprocess-per-case mode the baseline
    is just this case's setup."""
    p = peak_bytes()
    if p is not None and (base is None or p > base):
        result["peak_bytes"] = p
    return result


def marginal_time(make_fn, args, k2=9):
    """Marginal per-iteration time between K-chained runs.

    Jitter guard: relay dispatch+readback noise is several to tens of
    ms (BENCH_NOTES "round 3 — timing reconciliation"; an un-guarded
    k2=9 once recorded 11.9e9 pts/s for the 65k case). If the first
    (k2-1)-iteration delta spans < 50 ms of device time, re-measure
    with a K pair scaled to span ~100 ms, where the noise contributes
    < ~10%.
    """
    import jax

    def measure(k_lo, k_hi, repeats=3):
        f1, f2 = jax.jit(make_fn(k_lo)), jax.jit(make_fn(k_hi))
        np.asarray(f1(*args))
        np.asarray(f2(*args))
        b1 = b2 = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(f1(*args))
            b1 = min(b1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(f2(*args))
            b2 = min(b2, time.perf_counter() - t0)
        return max((b2 - b1) / (k_hi - k_lo), 1e-9), b2 - b1

    per, delta = measure(1, k2)
    if delta < 0.05:
        scale = int(np.ceil(0.1 / max(per * (k2 - 1), 1e-4)))
        k_lo = max(2, (k2 - 1) // 2)
        k_hi = min(k_lo + (k2 - 1) * scale, 1024)
        per, _ = measure(k_lo, k_hi, repeats=4)
    return per


# --- Hardware accuracy gates (VERDICT r4 item 3) --------------------------
# Every throughput row checks one unperturbed device apply against a
# cached forced-CPU f32 reference at GATE_MULT * tol before timing (the
# reference's own harness asserts accuracy in every test,
# nufft_ops_test.py:812; round 4's 72^3 Mosaic crash showed that
# hardware-only branches exist which CPU interpret tests cannot reach).
# References are keyed by TRANSFORM CONFIG (not row name), so e.g. the
# slot rows share the base row's reference. Generation runs in a
# forced-CPU subprocess (`--make-case-ref ROW`) and is cached in build/.

CASE_TOL = 1e-6
GATE_MULT = 10.0
_REF_MODE = False          # set by --make-case-ref: compute CPU refs


def _ref_path(key):
    import pathlib
    return (pathlib.Path(__file__).parent / "build"
            / f"caseref_{key}.npz")


def _case_key(grid_shape, num_points, transform_type, batch,
              shared_points, radial):
    g = "x".join(str(d) for d in grid_shape)
    b = f"b{batch}" if batch else "b1"
    s = "shared" if (shared_points or batch is None) else "perbatch"
    r = "radial" if radial else "uniform"
    return f"{g}_{num_points}_{transform_type}_{b}_{s}_{r}"


def _write_case_ref(key, src_np, pts_np, transform_type, grid_shape):
    """Forced-CPU f32 reference via the unplanned planar pipeline with
    the native (C++/OpenMP) spread/interp engine — a code path disjoint
    from the TPU Pallas kernels being gated."""
    import tensorflow_nufft_tpu as tfft
    from tensorflow_nufft_tpu.options.options import Options
    kwargs = (dict(grid_shape=grid_shape)
              if transform_type == "type_1" else {})
    # The native OpenMP engine can deadlock when invoked from JAX's
    # CPU-backend callback thread at large fine grids (XLA's spinning
    # worker threads starve the OpenMP team — observed on the radial
    # 512^2 and 3D 128^3 type-2 refs, fine arrays >= ~16M elements).
    # Route those through the XLA scan kernels; BENCH_REF_BACKEND
    # overrides either way.
    fine_elems = int(np.prod([2 * g for g in grid_shape]))
    elem_rank = 2 if transform_type == "type_1" else len(grid_shape) + 1
    chans = 2 * int(np.prod(src_np.shape[:src_np.ndim - elem_rank],
                            dtype=np.int64) or 1)
    big = chans * fine_elems >= (1 << 24)
    backend = os.environ.get("BENCH_REF_BACKEND",
                             "xla" if big else "native")
    try:
        opts = Options(backend=backend)
        ref = np.asarray(tfft.planar.nufft(
            src_np, pts_np, transform_type=transform_type,
            tol=CASE_TOL, options=opts, **kwargs))
    except Exception as e:  # engine unavailable: default path
        log(f"{backend} backend failed ({e}); using default CPU path")
        ref = np.asarray(tfft.planar.nufft(
            src_np, pts_np, transform_type=transform_type,
            tol=CASE_TOL, **kwargs))
    p = _ref_path(key)
    p.parent.mkdir(parents=True, exist_ok=True)
    np.savez(p, ref=ref, scale=float(np.max(np.abs(ref))))
    log(f"wrote {p}")
    return {"metric": key, "ref": "written"}


def _ensure_case_ref(row_name, key, timeout=3600.0):
    """Loads the cached CPU reference for ``key``, generating it via a
    forced-CPU `--make-case-ref row_name` subprocess on first use.
    Returns None (never raises) when generation fails — the perf row
    then reports acc_pass=None instead of blocking."""
    p = _ref_path(key)
    if not p.exists():
        log(f"computing CPU reference for {row_name} (key {key}) ...")
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--make-case-ref", row_name],
                env=env, timeout=timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)))
        except subprocess.TimeoutExpired:
            return None
        if r.returncode != 0 or not p.exists():
            return None
    try:
        return np.load(p)
    except Exception:
        return None


def _acc_fields(row_name, key, out_np):
    """err/pass fields for one device output vs the cached CPU
    reference (max abs err normalized by the reference's own scale)."""
    data = _ensure_case_ref(row_name, key)
    if data is None:
        log(f"{row_name}: no CPU reference available; not gated")
        return {"acc_pass": None}
    ref = data["ref"]
    scale = float(data["scale"]) or 1.0
    if out_np.shape != ref.shape:
        log(f"{row_name}: output shape {out_np.shape} != reference "
            f"{ref.shape}")
        return {"acc_err": float("inf"), "acc_gate": GATE_MULT * CASE_TOL,
                "pass": False}
    err = float(np.max(np.abs(out_np - ref)) / scale)
    gate = GATE_MULT * CASE_TOL
    ok = bool(err < gate)
    log(f"{row_name}: acc_err={err:.3e} (gate < {gate:g}) pass={ok}")
    return {"acc_err": err, "acc_gate": gate, "pass": ok}


def nufft_case(name, grid_shape, num_points, transform_type,
               batch=None, shared_points=True, k2=9, points_arr=None,
               slots=False, check=True):
    import jax
    import jax.numpy as jnp
    import tensorflow_nufft_tpu as tfft
    from tensorflow_nufft_tpu.planar import to_planar

    mem_base = peak_bytes()

    rng = np.random.default_rng(7)
    rank = len(grid_shape)
    pts_batch = () if (shared_points or batch is None) else (batch,)
    src_batch = () if batch is None else (batch,)
    if points_arr is not None:
        points = np.broadcast_to(
            points_arr.astype(np.float32),
            pts_batch + points_arr.shape).copy()
        num_points = points.shape[-2]
    else:
        points = rng.uniform(-np.pi, np.pi,
                             pts_batch + (num_points, rank)).astype(
            np.float32)
    if transform_type == "type_1":
        z = (rng.standard_normal(src_batch + (num_points,))
             + 1j * rng.standard_normal(src_batch + (num_points,)))
        kwargs = dict(grid_shape=grid_shape)
    else:
        z = (rng.standard_normal(src_batch + grid_shape)
             + 1j * rng.standard_normal(src_batch + grid_shape))
        kwargs = {}
    key = _case_key(grid_shape, num_points, transform_type, batch,
                    shared_points, points_arr is not None)
    src_np = to_planar(z.astype(np.complex64))
    if _REF_MODE:
        return _write_case_ref(key, src_np, points, transform_type,
                               grid_shape)
    src = jnp.asarray(src_np)
    pts = jnp.asarray(points)

    # Shared fixed points: time the planned transform (the repeated-
    # transform regime; falls back internally where unsupported).
    # Per-batch trajectories: the batched planned op (one planned
    # transform per trajectory, one vmapped prep — VERDICT r4 item 4;
    # reference analog: the outer points-batch loop,
    # cc/kernels/nufft_kernels.cc:491).
    op = None
    bop = None
    if shared_points:
        op = tfft.planar.PlannedNufft(
            pts, grid_shape, transform_type=transform_type)
        src_b = src if batch is not None else src[None]
    elif batch is not None:
        bop = tfft.planar.BatchedPlannedNufft(
            pts, grid_shape, transform_type=transform_type)
    if slots:
        # Slot-order apply surface (VERDICT r3 item 6): the iterative-
        # pipeline regime where per-point vectors stay in the plan's
        # chunk-slot layout — skips the per-call point-order
        # permutation gather. Loop-invariant conversion done once here.
        assert op is not None and op._planned, name
        if transform_type == "type_1":
            src_b = op.to_slots(src_b)

    acc = {}
    if check:
        # One unperturbed apply, gated vs the cached CPU reference.
        # Slot rows convert back to point/grid order (one extra gather)
        # so the SAME reference serves slot and point-order rows.
        def once():
            if slots and transform_type == "type_1":
                return op.apply_from_slots(src_b)
            if slots:
                return op.from_slots(op.apply_to_slots(src_b))
            if op is not None:
                return op(src_b)
            if bop is not None:
                return bop(src)
            return tfft.planar.nufft(
                src, pts, transform_type=transform_type, **kwargs)
        out_np = np.asarray(jax.jit(once)())
        if op is not None and batch is None:
            out_np = out_np[0]
        acc = _acc_fields(name, key, out_np)

    def make(k):
        def f(p):
            def body(i, acc_):
                # Nonlinear perturbation + output barrier (see bench.py
                # and BENCH_NOTES "honest timing").
                def perturb(x):
                    return x + 1e-3 * jnp.sin(x * i.astype(jnp.float32))
                if slots and transform_type == "type_1":
                    out = op.apply_from_slots(perturb(src_b))
                elif slots:
                    out = op.apply_to_slots(perturb(src_b))
                elif op is not None:
                    out = op(perturb(src_b))
                elif bop is not None:
                    out = bop(perturb(src))
                else:
                    out = tfft.planar.nufft(
                        perturb(src), p,
                        transform_type=transform_type, **kwargs)
                out = jax.lax.optimization_barrier(out)
                return acc_ + out.ravel()[0]
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    per = marginal_time(make, (pts,), k2=k2)
    total_pts = num_points * (batch or 1)
    result = {
        "metric": name,
        "value": round(total_pts / per, 1),
        "unit": "points/s",
        "ms_per_transform": round(per * 1e3, 3),
        "planned": bool(op is not None and op._planned
                        or bop is not None and bop._planned),
    }
    result.update(acc)
    return attach_peak(result, mem_base)


def _write_t3_ref(key, src_np, x, t):
    """Forced-CPU f32 type-3 reference (XLA pipeline — disjoint from
    the TPU Pallas path being gated)."""
    import tensorflow_nufft_tpu as tfft
    ref = np.asarray(tfft.planar.nufft_type3(src_np, x, t,
                                             tol=CASE_TOL))
    p = _ref_path(key)
    p.parent.mkdir(parents=True, exist_ok=True)
    np.savez(p, ref=ref, scale=float(np.max(np.abs(ref))))
    log(f"wrote {p}")
    return {"metric": key, "ref": "written"}


def type3_case(name="2d_t3_200k_200k", rank=2, m=200_000,
               k_targets=200_000, t_range=64.0, k2=7, planned=True,
               check=True):
    """Type-3 (nonuniform -> nonuniform): m source points -> k_targets
    target frequencies, planned (Type3Plan) or unplanned (the
    functional nufft_type3, re-planning statics every call inside the
    jit). No reference counterpart (the reference never implemented
    type-3); throughput counts source + target points per second."""
    import jax
    import jax.numpy as jnp
    import tensorflow_nufft_tpu as tfft
    from tensorflow_nufft_tpu.planar import to_planar

    mem_base = peak_bytes()
    rng = np.random.default_rng(7)
    x = rng.uniform(-np.pi, np.pi, (m, rank)).astype(np.float32)
    t = rng.uniform(-t_range, t_range,
                    (k_targets, rank)).astype(np.float32)
    z = (rng.standard_normal(m) + 1j * rng.standard_normal(m))
    src_np = to_planar(z.astype(np.complex64))[None]
    key = f"t3_{rank}d_{m}_{k_targets}_{t_range:g}"
    if _REF_MODE:
        return _write_t3_ref(key, src_np, x, t)
    src = jnp.asarray(src_np)
    op = tfft.planar.Type3Plan(x, t)
    xj, tj = jnp.asarray(x), jnp.asarray(t)

    acc = {}
    if check:
        # One unperturbed apply vs the cached CPU reference (both the
        # planned and unplanned rows gate the same transform).
        fn = (lambda s: op(s)) if planned else (
            lambda s: tfft.planar.nufft_type3(s, xj, tj))
        out_np = np.asarray(jax.jit(fn)(src))
        acc = _acc_fields(name, key, out_np)

    def make(k):
        def f(s):
            def body(i, acc):
                sp = s + 1e-3 * jnp.sin(s * i.astype(jnp.float32))
                if planned:
                    out = op(sp)
                else:
                    out = tfft.planar.nufft_type3(sp, xj, tj)
                out = jax.lax.optimization_barrier(out)
                return acc + out.ravel()[0]
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    per = marginal_time(make, (src,), k2=k2)
    result = {
        "metric": name,
        "value": round((m + k_targets) / per, 1),
        "unit": "points/s",
        "ms_per_transform": round(per * 1e3, 3),
        "fine_shape": list(op.fine_shape),
        "planned": planned,
        "planned_spread": op._spread_level if planned else "none",
    }
    result.update(acc)
    return attach_peak(result, mem_base)


def census_3d_case(grid=128, m=800_000, tol=1e-6, seed=42):
    """3D accuracy census on hardware (VERDICT r3 item 5): the banded +
    Pallas-DFT planned type-1 path at 128^3/800k vs a float64 CPU NUFFT
    at the same tol (err_impl, full mode census) and an exact f64 NUDFT
    on a 4096-mode subset (err_total). The f64 references are computed
    in a forced-CPU x64 subprocess and cached in build/.

    Gate: unlike the 2D headline (f32 floor 2.5e-7 << tol), the rank-3
    f32 precision floor at this scale is ~3.6e-6 — already above
    tol=1e-6 on the CPU float32 pipeline — so "err_impl < tol" is not
    an implementation property at rank 3. The census therefore gates
    err_impl < max(tol, 4 * floor_f32) (TPU parity with the measured
    f32 floor; 4x allows the MXU's bf16x6 f32 emulation) plus the
    same err_total < 10*tol total-error bar as 2D."""
    import pathlib
    import jax
    import jax.numpy as jnp
    import tensorflow_nufft_tpu as tfft
    from tensorflow_nufft_tpu.planar import to_planar

    ref_path = (pathlib.Path(__file__).parent / "build"
                / f"census3d_{grid}_{m}_{seed}_{tol:g}.npz")
    if ref_path.exists() and "floor_f32" not in np.load(ref_path):
        # Stale ref from before the floor was recorded: gating at bare
        # tol would be a guaranteed-false failure at rank 3 (the f32
        # floor sits above tol) — regenerate instead.
        log(f"census ref {ref_path.name} predates floor_f32; "
            f"regenerating")
        ref_path.unlink()
    if not ref_path.exists():
        log("computing 3D float64 CPU references in a subprocess ...")
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--make-census-ref", str(grid), str(m), str(tol),
             str(seed)],
            check=True, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    data = np.load(ref_path)

    rng = np.random.default_rng(seed)
    gs = (grid,) * 3
    pts = rng.uniform(-np.pi, np.pi, (m, 3)).astype(np.float32)
    z = (rng.standard_normal(m)
         + 1j * rng.standard_normal(m)).astype(np.complex64)
    src = jnp.asarray(to_planar(z))[None]
    op = tfft.planar.PlannedNufft(jnp.asarray(pts), gs,
                                  transform_type="type_1", tol=tol)
    out = np.asarray(op(src))[0]
    got = out[..., 0] + 1j * out[..., 1]
    scale = float(data["scale"])
    err_impl = float(np.max(np.abs(got - data["cpu_ref"])) / scale)
    idx = data["subset_idx"]
    sub = got.reshape(-1)[idx]
    err_total = float(np.max(np.abs(sub - data["subset_oracle"]))
                      / scale)
    floor = float(data["floor_f32"]) if "floor_f32" in data else None
    gate_impl = max(tol, 4 * floor) if floor is not None else tol
    log(f"3d census: err_impl={err_impl:.3e} (gate < {gate_impl:g}; "
        f"f32 floor {floor if floor is not None else float('nan'):.3e}), "
        f"err_total={err_total:.3e} (gate < {10 * tol:g})")
    return {
        "metric": f"3d_census_{grid}_{m // 1000}k",
        "value": err_impl,
        "unit": "err_impl",
        "err_total_subset": err_total,
        "tol": tol,
        "floor_f32": floor,
        "gate_impl": gate_impl,
        "planned_level": op._level,
        "banded": bool(getattr(op, "band_info", None) is not None),
        "pass": bool(err_impl < gate_impl and err_total < 10 * tol),
    }


def make_census_ref(grid, m, tol, seed):
    """Forced-CPU x64 subprocess: f64 same-tol NUFFT (full census) +
    exact NUDFT on a 4096-mode subset (chunked; the full 128^3 dense
    oracle is infeasible)."""
    import pathlib
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import tensorflow_nufft_tpu as tfft

    rng = np.random.default_rng(seed)
    gs = (grid,) * 3
    pts = rng.uniform(-np.pi, np.pi, (m, 3)).astype(np.float64)
    z = (rng.standard_normal(m)
         + 1j * rng.standard_normal(m)).astype(np.complex128)
    cpu_ref = np.asarray(tfft.nufft(z, pts, grid_shape=gs,
                                    transform_type="type_1", tol=tol))
    scale = float(np.abs(cpu_ref).max())

    # f32 precision floor of the same transform: the CPU float32
    # planar pipeline vs the f64 reference. At 128^3/800k this is
    # ~3.6e-6 — ABOVE tol=1e-6 — so "err_impl < tol" is unachievable
    # in f32 for ANY implementation; the census gates the TPU path
    # against a small multiple of this floor instead (matching the
    # reference's own f32 positioning: its c64 CI bar is 1e-3,
    # nufft_ops_test.py:198-202).
    from tensorflow_nufft_tpu.planar import to_planar
    import jax.numpy as jnp
    pf = np.asarray(tfft.planar.nufft(
        jnp.asarray(to_planar(z.astype(np.complex64))),
        jnp.asarray(pts.astype(np.float32)), grid_shape=gs,
        transform_type="type_1", tol=tol))
    got32 = pf[..., 0] + 1j * pf[..., 1]
    floor_f32 = float(np.max(np.abs(got32 - cpu_ref)) / scale)

    sub_rng = np.random.default_rng(seed + 1)
    idx = np.sort(sub_rng.choice(grid ** 3, 4096, replace=False))
    kk = np.stack(np.unravel_index(idx, gs), axis=-1) - grid // 2
    oracle = np.empty(len(idx), np.complex128)
    for lo in range(0, len(idx), 256):
        k = kk[lo:lo + 256]
        phase = pts @ k.T                     # [m, <=256]
        oracle[lo:lo + k.shape[0]] = (
            np.exp(-1j * phase) * z[:, None]).sum(axis=0)
    ref_path = (pathlib.Path(__file__).parent / "build"
                / f"census3d_{grid}_{m}_{seed}_{tol:g}.npz")
    ref_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(ref_path, cpu_ref=cpu_ref, scale=scale, subset_idx=idx,
             subset_oracle=oracle, floor_f32=floor_f32)
    log(f"wrote {ref_path}")


def bigm_case(name="2d_t1_512_20m_bigm", grid_shape=(512, 512),
              num_points=20_000_000, k2=3, check=True):
    """Big-M regime (VERDICT r3 item 4 / r4 item 2): 20M points at
    512^2 pushes the padded slot count past 2^24, exercising the
    sort-based int32 binning (binning._ranks_and_starts_bigm) on
    hardware.

    Compiled as TWO separately-jitted stages with runtime-arg
    artifacts (VERDICT r4 item 2's restructure): a monolithic
    unplanned 20M-point graph never survived the flapping remote
    compile service (6 attempts, round 4), and planned payload
    literals at this M would blow the compile-body cap. Stage A is
    the points-side prep (fold + sort-based binning + coords payload);
    stage B is the apply (values payload + Pallas spread + mode-DFT).
    Each stage compiles small and is timed marginally with its own
    perturbation; the row reports the summed per-iteration time —
    the same work the unplanned monolith does per call."""
    import functools
    import jax
    import jax.numpy as jnp
    import tensorflow_nufft_tpu as tfft
    from tensorflow_nufft_tpu.planar import to_planar, _planned_prep
    from tensorflow_nufft_tpu.kernels import binning
    from tensorflow_nufft_tpu.kernels.pallas_dft import spread_dft_fused
    from tensorflow_nufft_tpu.plan.plan import PlanSpec, make_plan

    mem_base = peak_bytes()
    rng = np.random.default_rng(7)
    rank = len(grid_shape)
    points = rng.uniform(-np.pi, np.pi,
                         (num_points, rank)).astype(np.float32)
    z = (rng.standard_normal(num_points)
         + 1j * rng.standard_normal(num_points))
    src_np = to_planar(z.astype(np.complex64))
    key = _case_key(grid_shape, num_points, "type_1", None, False,
                    False)
    if _REF_MODE:
        return _write_case_ref(key, src_np, points, "type_1",
                               grid_shape)
    src = jnp.asarray(src_np)
    pts = jnp.asarray(points)

    spec = PlanSpec(
        transform_type="type_1", fft_direction="forward", rank=rank,
        grid_shape=grid_shape, dtype_name="complex64", tol=CASE_TOL,
        points_range=0, spread_only=False)
    plan = make_plan(spec)
    geom = binning.choose_geometry(plan.fine_shape, plan.width,
                                   num_points)
    slots = geom.num_chunks * geom.chunk
    log(f"bigm: geom tile={geom.tile} chunk={geom.chunk} "
        f"num_chunks={geom.num_chunks} slots={slots} "
        f"sort_path={slots > 2 ** 24}")

    stage_a = jax.jit(functools.partial(
        _planned_prep, plan=plan, geom=geom, level="binned",
        points_range=0))

    @jax.jit
    def stage_b(s, arts):
        pr, binned_arts, coords = arts
        cm = jnp.moveaxis(s[None], -1, 1).reshape(2, num_points)
        return spread_dft_fused(
            cm.astype(jnp.float32), pr, plan, geom, 1,
            binned=binned_arts, mats=None, coords=coords)

    arts = jax.tree.map(jnp.asarray, stage_a(pts))

    acc = {}
    if check:
        out_np = np.asarray(stage_b(src, arts))[0]
        acc = _acc_fields(name, key, out_np)

    def make_a(k):
        def f(p):
            def body(i, acc_):
                pp = p + 1e-6 * jnp.sin(p * i.astype(jnp.float32))
                a = stage_a(pp)
                a = jax.lax.optimization_barrier(a)
                return acc_ + a[0][0].ravel()[0]
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    def make_b(k):
        # src and arts are RUNTIME ARGS (not closures): closed-over
        # concrete arrays become MLIR literals, and the 20M-point
        # coords payload (~644 MB) would blow the compile-body cap.
        def f(s, arts_):
            def body(i, acc_):
                sp = s + 1e-3 * jnp.sin(s * i.astype(jnp.float32))
                out = jax.lax.optimization_barrier(stage_b(sp, arts_))
                return acc_ + out.ravel()[0]
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    per_a = marginal_time(make_a, (pts,), k2=k2)
    per_b = marginal_time(make_b, (src, arts), k2=k2)
    per = per_a + per_b
    result = {
        "metric": name,
        "value": round(num_points / per, 1),
        "unit": "points/s",
        "ms_per_transform": round(per * 1e3, 3),
        "ms_prep": round(per_a * 1e3, 3),
        "ms_apply": round(per_b * 1e3, 3),
        "sort_path": bool(slots > 2 ** 24),
        "staged_compile": True,
    }
    result.update(acc)
    return attach_peak(result, mem_base)


def cg_sense_case(k2=5, toeplitz=False):
    import jax
    import jax.numpy as jnp
    from tensorflow_nufft_tpu.models import mri

    mem_base = peak_bytes()
    grid = (128, 128)
    coils = 8
    spokes, samples = 128, 256
    pts = jnp.asarray(mri.radial_trajectory(spokes, samples))
    maps = jnp.asarray(mri.birdcage_maps(coils, grid))
    phantom = jnp.asarray(mri.shepp_logan(grid))
    density = jnp.asarray(mri.radial_density(spokes, samples))
    op = mri.SenseNufft(pts, maps, grid, density=density,
                        toeplitz=toeplitz)
    kspace = jax.jit(op.forward)(phantom)

    def make(k):
        def f(ksp):
            def body(i, acc):
                kp = ksp + 1e-3 * jnp.sin(ksp * i.astype(jnp.float32))
                rec = mri.cg_sense(kp, op,
                                   num_iters=10)
                rec = jax.lax.optimization_barrier(rec)
                return acc + rec[0, 0, 0]
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    per = marginal_time(make, (kspace,), k2=k2)
    suffix = "_toeplitz" if toeplitz else ""
    result = {
        "metric": f"cg_sense_10iter_128_8coil_radial{suffix}",
        "value": round(per * 1e3, 2),
        "unit": "ms/recon",
    }
    return attach_peak(result, mem_base)


def _case_registry(quick: bool):
    """Ordered {name: thunk} of all suite cases."""
    cases = [
        ("2d_t2_256_200k", (256, 256), 200_000, "type_2", None, True),
        ("2d_t1_256_200k", (256, 256), 200_000, "type_1", None, True),
        ("2d_t1_256_65k", (256, 256), 65_536, "type_1", None, True),
        ("2d_t2_256_200k_b16_shared", (256, 256), 200_000, "type_2",
         16, True),
        ("2d_t1_256_200k_b16_shared", (256, 256), 200_000, "type_1",
         16, True),
    ]
    if not quick:
        cases += [
            ("2d_t2_256_200k_b16_perbatch", (256, 256), 200_000,
             "type_2", 16, False),
            ("3d_t2_128_800k", (128, 128, 128), 800_000, "type_2",
             None, True),
            ("3d_t1_128_800k", (128, 128, 128), 800_000, "type_1",
             None, True),
            ("3d_t1_128_1m", (128, 128, 128), 1_000_000, "type_1",
             None, True),
        ]
    reg = {}
    for name, gs, m, tt, batch, shared in cases:
        reg[name] = (lambda n=name, g=gs, mm=m, t=tt, b=batch, s=shared:
                     nufft_case(n, g, mm, t, b, s,
                                k2=5 if len(g) == 3 else 9))

    if not quick:
        def radial_case():
            # BASELINE config 2: 512^2 grid, radial MRI trajectory,
            # 8 coils sharing points, type-2.
            from tensorflow_nufft_tpu.models import mri
            radial = np.asarray(mri.radial_trajectory(512, 1024))
            return nufft_case("2d_t2_512_radial_b8", (512, 512), 0,
                              "type_2", batch=8, shared_points=True,
                              k2=9, points_arr=radial)
        reg["2d_t2_512_radial_b8"] = radial_case
        # Slot-order apply rows (VERDICT r3 item 6): same transforms
        # with per-point vectors kept in the plan's chunk-slot layout.
        reg["2d_t1_256_65k_slots"] = (
            lambda: nufft_case("2d_t1_256_65k_slots", (256, 256),
                               65_536, "type_1", None, True, k2=9,
                               slots=True))
        reg["2d_t1_256_200k_slots"] = (
            lambda: nufft_case("2d_t1_256_200k_slots", (256, 256),
                               200_000, "type_1", None, True, k2=9,
                               slots=True))
        reg["3d_t1_128_800k_slots"] = (
            lambda: nufft_case("3d_t1_128_800k_slots",
                               (128, 128, 128), 800_000, "type_1",
                               None, True, k2=5, slots=True))
        reg["3d_t2_128_800k_slots"] = (
            lambda: nufft_case("3d_t2_128_800k_slots",
                               (128, 128, 128), 800_000, "type_2",
                               None, True, k2=5, slots=True))

        def radial_slots_case():
            from tensorflow_nufft_tpu.models import mri
            radial = np.asarray(mri.radial_trajectory(512, 1024))
            return nufft_case("2d_t2_512_radial_b8_slots", (512, 512),
                              0, "type_2", batch=8, shared_points=True,
                              k2=9, points_arr=radial, slots=True)
        reg["2d_t2_512_radial_b8_slots"] = radial_slots_case
        reg["2d_t3_200k_200k"] = type3_case
        # 3D type-3 at MRI field-map scale (VERDICT r2 #8): planned vs
        # unplanned on the same 500k->500k problem. t_range 16 keeps
        # the internal fine grid ~64^3 (nf ~ 2*sigma*X*S/pi + w).
        reg["3d_t3_500k_500k"] = (
            lambda: type3_case("3d_t3_500k_500k", rank=3, m=500_000,
                               k_targets=500_000, t_range=16.0, k2=5))
        reg["3d_t3_500k_500k_unplanned"] = (
            lambda: type3_case("3d_t3_500k_500k_unplanned", rank=3,
                               m=500_000, k_targets=500_000,
                               t_range=16.0, k2=5, planned=False))
        reg["cg_sense"] = cg_sense_case
        reg["cg_sense_toeplitz"] = (
            lambda: cg_sense_case(toeplitz=True))
        reg["3d_census_128_800k"] = census_3d_case
        # Big-M regime (VERDICT r3 item 4): 20M points at 512^2 pushes
        # the padded slot count past 2^24, exercising the sort-based
        # int32 binning (binning._ranks_and_starts_bigm) on hardware.
        # Two-stage compile (see bigm_case): the monolithic graph
        # never survived the flapping compile service.
        reg["2d_t1_512_20m_bigm"] = bigm_case
    return reg


def _compile_service_ok(timeout=240.0) -> bool:
    """Probes the remote TPU compile service with a FRESH (uncached)
    tiny graph in a subprocess. False means wedged or down — the child
    is killed (outages HANG rather than raise, see CLAUDE.md). A
    random literal salt busts the compile cache so the probe really
    exercises a compile round-trip."""
    import random
    salt = random.random()
    code = (
        "import jax, jax.numpy as jnp\n"
        f"x = jnp.arange(8.0) * {salt!r}\n"
        f"print(float(jax.jit(lambda v: (v + {salt!r}).sum())(x)))\n")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _await_compile_service(max_wait=7200.0):
    """Blocks until the compile service answers a fresh probe (up to
    ``max_wait`` seconds); returns False if it never came back."""
    t0 = time.time()
    first = True
    while time.time() - t0 < max_wait:
        if _compile_service_ok():
            if not first:
                log("compile service back; resuming")
            return True
        first = False
        log(f"compile service unresponsive "
            f"({time.time() - t0:.0f}s); sleeping 300s")
        time.sleep(300)
    return False


def _run_subprocess(name: str, timeout: float):
    """Runs one case as `bench_suite.py --case name`, returns its JSON
    result (or an error record on timeout / crash)."""
    cmd = [sys.executable, os.path.abspath(__file__), "--case", name]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout,
                              cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return {"metric": name, "error": f"timeout after {timeout:.0f}s "
                                         f"(remote compile hang?)"}
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                pass
    tail = (proc.stderr or proc.stdout or "")[-300:]
    return {"metric": name, "error": f"rc={proc.returncode}: {tail}"}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--case", default=None,
                        help="run one case in-process")
    parser.add_argument("--timeout", type=float, default=0.0,
                        help="per-case wall clock (default: 900s 2D, "
                             "4200s 3D first-compile headroom)")
    parser.add_argument("--inprocess", action="store_true",
                        help="run all cases in this process (no "
                             "isolation; old behavior)")
    parser.add_argument("--make-census-ref", nargs=4, default=None,
                        metavar=("GRID", "M", "TOL", "SEED"),
                        help="internal: build the 3D census f64 "
                             "references (forced-CPU subprocess)")
    parser.add_argument("--make-case-ref", default=None, metavar="ROW",
                        help="internal: build one row's CPU f32 "
                             "accuracy reference (forced-CPU "
                             "subprocess; refs are keyed by transform "
                             "config and cached in build/)")
    args = parser.parse_args()

    if args.make_census_ref is not None:
        g, m, tol, seed = args.make_census_ref
        make_census_ref(int(g), int(m), float(tol), int(seed))
        return

    if args.make_case_ref is not None:
        # FORCE the CPU backend in-process: the JAX_PLATFORMS env var
        # alone is overridden by sitecustomize (which registers the
        # axon TPU backend), and a reference silently computed through
        # the same TPU pipeline it is meant to gate is vacuous — the
        # 3d_t3 row once measured acc_err == 0.0 exactly that way.
        import jax
        jax.config.update("jax_platforms", "cpu")
        assert jax.default_backend() == "cpu", jax.default_backend()
        global _REF_MODE
        _REF_MODE = True
        reg = _case_registry(quick=False)
        print(json.dumps(reg[args.make_case_ref]()), flush=True)
        return

    reg = _case_registry(args.quick)

    if args.case is not None:
        import jax
        log(f"backend: {jax.default_backend()}")
        print(json.dumps(reg[args.case]()), flush=True)
        return

    if args.inprocess:
        import jax
        log(f"backend: {jax.default_backend()}")
        for name, thunk in reg.items():
            try:
                print(json.dumps(thunk()), flush=True)
            except Exception as e:  # keep the suite going
                print(json.dumps({"metric": name, "error": str(e)[:200]}),
                      flush=True)
        return

    for name in reg:
        # Budgets sized to survive compile-service flaps: an outage
        # mid-case HANGS the compile (never raises) and resumes when
        # the service returns, so a budget spanning a flap window lets
        # the case finish instead of burning a retry (observed round
        # 4: 480s attempts chronically died across ~10-min flaps).
        timeout = args.timeout or (2400.0 if name.startswith("3d")
                                   else 1500.0)
        # Gate on a live compile service (outage = hang, not error);
        # then several short attempts beat one long one: the service
        # caches every graph it finishes, so a killed attempt resumes
        # from cache — only a HUNG compile wastes its timeout.
        if not _await_compile_service():
            print(json.dumps({"metric": name,
                              "error": "compile service down"}),
                  flush=True)
            continue
        res = _run_subprocess(name, timeout)
        for attempt in range(3):
            if "error" not in res:
                break
            log(f"{name}: failed ({res['error'][:80]}), retry "
                f"{attempt + 1}/3")
            if not _await_compile_service():
                break
            res = _run_subprocess(name, timeout)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()

"""b16 type-1 spread levers (VERDICT r4 item 1), measured on TPU.

Round-4 stage split (tools/probe_b16_t1.py): the batch-16 shared-points
2D type-1 spread kernel burns ~17 ms where its MXU floor is ~4.4 ms,
against a type-2 interp dual that runs the whole batch in ~10 ms. Two
candidate levers:
  (a) mats payload re-streaming (4 groups x ~129 MB): does it pipeline
      at DMA rate or serialize against the per-channel contractions?
      -> group-scaling measurement: spread at B2=8 (1 group) vs B2=32
      (4 groups). Constant per-group time = per-group bound (DMA or
      otherwise); 4x scaling of compute-only = MXU bound.
  (b) binned-level coords streaming for wide channel groups: the
      coords payload is 8 rows/chunk vs sum(ext)=144 (17x smaller);
      in-kernel Horner costs ~0.5 ms/group at this geometry.
      -> pallas_spread.WIDE_COORDS_STREAMING knob.

Variants (2D 256^2 / 200k, mats-level plan, honest timing body):
  spread_mats_b32    : baseline dispatch (4 streaming-mats groups of 8)
  spread_coords_b32  : forced split coords/values kernels (lever b)
  spread_mats_b8     : one mats group (scaling point for lever a)
  spread_coords_b8   : one split group
  t1_full_coords_b32 : full planned t1 with lever (b) active
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import tensorflow_nufft_tpu as tfft                     # noqa: E402
from tensorflow_nufft_tpu.kernels import (              # noqa: E402
    pallas_spread as ps)
from tensorflow_nufft_tpu.kernels.binning import (      # noqa: E402
    build_coords_payload)
from tensorflow_nufft_tpu.fft.planar_fft import (       # noqa: E402
    dft_truncate_deconvolve_tiled)

K1, K2 = 2, 18
GRID = (256, 256)
M, B = 200_000, 16
B2 = 2 * B

rng = np.random.default_rng(7)
pts = jnp.asarray(rng.uniform(-np.pi, np.pi, (M, 2)).astype(np.float32))
z = (rng.standard_normal((B, M))
     + 1j * rng.standard_normal((B, M))).astype(np.complex64)
strengths = jnp.asarray(np.stack([z.real, z.imag], axis=-1))  # [B,M,2]

op = tfft.planar.PlannedNufft(pts, GRID, transform_type="type_1")
coords = jax.jit(build_coords_payload, static_argnums=1)(
    op.binned, op.geom)
coords.block_until_ready()
print(f"level={op._level} tile={op.geom.tile} chunk={op.geom.chunk} "
      f"ext={op.geom.ext} num_chunks={op.geom.num_chunks} "
      f"sgroup={ps.streaming_group_size(op.geom)} "
      f"rgroup={ps.resident_group_size(op.geom)}",
      file=sys.stderr, flush=True)


def log(m):
    print(m, file=sys.stderr, flush=True)


def marginal(stage_fn, label, x):
    def make(k):
        @jax.jit
        def f(v):
            def body(i, acc):
                out = stage_fn(v + 1e-3 * jnp.sin(
                    v * i.astype(jnp.float32)))
                out = jax.lax.optimization_barrier(out)
                return acc + out.ravel()[0]
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    def timed(f):
        np.asarray(f(x))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(f(x))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, tk = timed(make(K1)), timed(make(K2))
    per = max((tk - t1) / (K2 - K1), 1e-9)
    log(f"{label:30s}: {per * 1e3:9.3f} ms")
    return per


def fold(x):
    b = x.shape[0]
    return jnp.moveaxis(x, -1, 1).reshape(2 * b, x.shape[1])


def spread_mats(x):
    ps.WIDE_COORDS_STREAMING = False
    tiles, _ = ps.spread_pallas_tiles(
        fold(x).astype(jnp.float32), op.points_resc, op.plan,
        binned=op.binned, mats=op.mats, coords=None, geom=op.geom)
    return tiles


def spread_coords(x):
    ps.WIDE_COORDS_STREAMING = True
    tiles, _ = ps.spread_pallas_tiles(
        fold(x).astype(jnp.float32), op.points_resc, op.plan,
        binned=op.binned, mats=op.mats, coords=coords, geom=op.geom)
    return tiles


def t1_full_coords(x):
    tiles = spread_coords(x)
    return dft_truncate_deconvolve_tiled(tiles, op.plan, op.geom,
                                         x.shape[0])


# Accuracy cross-check first (one apply each path, B=2 to keep it
# cheap): the two dispatches must agree to f32 roundoff.
small = strengths[:2]
a = np.asarray(spread_mats(small))
b = np.asarray(spread_coords(small))
scale = max(np.abs(a).max(), 1e-30)
log(f"mats-vs-coords spread max rel diff (B2=4): "
    f"{np.abs(a - b).max() / scale:.3e}")

marginal(spread_mats, "spread_mats_b32", strengths)
marginal(spread_coords, "spread_coords_b32", strengths)
marginal(spread_mats, "spread_mats_b8", strengths[:4])
marginal(spread_coords, "spread_coords_b8", strengths[:4])
marginal(t1_full_coords, "t1_full_coords_b32", strengths)
ps.WIDE_COORDS_STREAMING = None

"""Spread-kernel anatomy bisect (b16 t1, VERDICT r4 item 1).

probe_mxu_orient.py put the per-chunk contraction at its MXU roofline
(~1.1 us/chunk-channel at HIGHEST), yet the real streaming-mats kernel
measures ~38 us/chunk for 8 channels (~9 us of which is MXU). This
probe re-creates _spread_kernel_mats locally and knocks out one
subsystem at a time on the real b16 payloads (2D 256^2/200k, group=8):

  base     : faithful copy (expect ~6.2 ms = tools/probe_b16_levers)
  nodma    : no per-chunk DMAs (compute on stale scratch)
  nocomp   : DMAs only (accumulate a cheap VPU touch of the data)
  noacc    : matmuls kept, tile_ref += replaced by a final single write
  defprec  : base at DEFAULT matmul precision (numerics irrelevant)
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
from jax.experimental import pallas as pl               # noqa: E402
from jax.experimental.pallas import tpu as pltpu        # noqa: E402

import tensorflow_nufft_tpu as tfft                     # noqa: E402
from tensorflow_nufft_tpu.kernels.binning import (      # noqa: E402
    build_values_payload)
from tensorflow_nufft_tpu.kernels.pallas_spread import (  # noqa: E402
    NBUF, _linear_tile_id, _mats_slices, accumulate_spread,
    chunk_contribution, use_interpret)

import os
K1, K2 = 2, 18
GRID = (256, 256)
M = 200_000
B = int(os.environ.get("ANATOMY_B", "4"))  # B2 = 2B channels, 1 group
B2 = 2 * B

rng = np.random.default_rng(7)
pts = jnp.asarray(rng.uniform(-np.pi, np.pi, (M, 2)).astype(np.float32))
z = (rng.standard_normal((B, M))
     + 1j * rng.standard_normal((B, M))).astype(np.complex64)
strengths = jnp.asarray(np.stack([z.real, z.imag], axis=-1))

op = tfft.planar.PlannedNufft(pts, GRID, transform_type="type_1")
geom = op.geom
print(f"tile={geom.tile} chunk={geom.chunk} ext={geom.ext} "
      f"num_chunks={geom.num_chunks} tiles={geom.tiles}",
      file=sys.stderr, flush=True)


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_kernel(variant, prec):
    def kernel(bounds_ref, ct1_ref, mats_hbm, values_hbm, tile_ref,
               m_scratch, v_scratch, sems):
        if variant.startswith("slab"):
            # One program per ROW of tiles: 8x fewer programs, so the
            # per-program pipeline cost (NBUF serial prefetch preamble
            # + block init/writeback) amortizes over ~8x more chunks.
            # The within-row tile column comes from the ct1 prefetch
            # (dynamic accumulate index, like the resident kernels).
            p = pl.program_id(0)
            nt1 = geom.tiles[1]
            start = bounds_ref[p * nt1]
            end = bounds_ref[(p + 1) * nt1]
        else:
            t = _linear_tile_id(geom)
            start = bounds_ref[t]
            end = bounds_ref[t + 1]
        tile_ref[...] = jnp.zeros_like(tile_ref)

        def chunk_dmas(slot, k):
            return [
                pltpu.make_async_copy(mats_hbm.at[k], m_scratch.at[slot],
                                      sems.at[slot, 0]),
                pltpu.make_async_copy(
                    values_hbm.at[:, pl.ds(jnp.minimum(
                        k, geom.num_chunks - 1) * geom.chunk,
                        geom.chunk)],
                    v_scratch.at[slot], sems.at[slot, 1]),
            ]

        if variant not in ("nodma", "empty"):
            for j in range(NBUF - 1):
                @pl.when(start + j < end)
                def _(j=j):
                    for dma in chunk_dmas(j, start + j):
                        dma.start()

        def body(k, _):
            d = k - start
            slot = jax.lax.rem(d, jnp.asarray(NBUF, d.dtype))
            if variant not in ("nodma", "empty"):
                @pl.when(k + NBUF - 1 < end)
                def _():
                    nslot = jax.lax.rem(d + NBUF - 1,
                                        jnp.asarray(NBUF, d.dtype))
                    for dma in chunk_dmas(nslot, k + NBUF - 1):
                        dma.start()
                for dma in chunk_dmas(slot, k):
                    dma.wait()
            if variant == "empty":
                # Pure loop floor: no DMA, no slices, one scalar RMW.
                tile_ref[0, 0, 0, 0, 0] += 1.0
                return 0
            if variant == "nocomp":
                tile_ref[0, 0, 0, 0:8, 0:72] += (
                    m_scratch[slot, 0:8, 0:72]
                    + v_scratch[slot, 0:8, 0:72])
                return 0
            mats_t = _mats_slices(m_scratch, slot, geom)
            dn = (((1,), (1,)), ((), ()))
            if variant.endswith("fused"):
                # ONE [B2*E0, C] x [E1, C]^T contraction per chunk:
                # the shared A_y operand loads once, M-padding waste
                # drops (B2*72=576 rows vs 8 x 128-padded), and the
                # per-channel output slices are 8-aligned sublane
                # offsets.
                pm = (mats_t[1][None, :, :]
                      * v_scratch[slot, 0:B2, :][:, None, :]).reshape(
                          B2 * geom.ext[1], geom.chunk)
                contrib = jax.lax.dot_general(
                    pm, mats_t[0], dn,
                    preferred_element_type=jnp.float32,
                    precision=prec)                   # [B2*Ex, Ey]^T!
                e1 = geom.ext[1]
                for b in range(B2):
                    blk = contrib[b * e1:(b + 1) * e1]
                    if variant.startswith("slab"):
                        tile_ref[0, ct1_ref[k], b] += blk
                    else:
                        tile_ref[0, 0, b] += blk
                return 0
            if variant == "pair":
                # TWO channels per dot: planar re/im pairs share the
                # windowed operand; K stays 2048 but the rhs N doubles
                # via lane-concat of the two channel products.
                for b in range(0, B2, 2):
                    p0 = mats_t[1] * v_scratch[slot, b, :][None, :]
                    p1 = mats_t[1] * v_scratch[slot, b + 1, :][None, :]
                    pq = jnp.concatenate([p0, p1], axis=0)
                    contrib = jax.lax.dot_general(
                        mats_t[0], pq, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec)           # [Ey, 2*Ex]
                    tile_ref[0, 0, b] += contrib[:, 0:geom.ext[1]]
                    tile_ref[0, 0, b + 1] += contrib[:, geom.ext[1]:]
                return 0
            for b in range(B2):
                p = mats_t[1] * v_scratch[slot, b, :][None, :]
                contrib = jax.lax.dot_general(
                    mats_t[0], p, dn,
                    preferred_element_type=jnp.float32,
                    precision=prec)
                if variant == "oneacc":
                    # Wrong numerics, right register liveness: ALL
                    # channels accumulate into channel 0 — matmul
                    # count unchanged, accumulator count 1. If this
                    # matches the B2=2 speed, the >=4-channel cliff is
                    # accumulator spill.
                    tile_ref[0, 0, 0] += contrib
                elif variant == "noacc":
                    tile_ref[0, 0, b, 0:8] += contrib[0:8]
                elif variant.startswith("slab"):
                    tile_ref[0, ct1_ref[k], b] += contrib
                else:
                    tile_ref[0, 0, b] += contrib
            return 0

        jax.lax.fori_loop(start, end, body, 0)

    return kernel


values_pl = None
mats = op.mats


def spread_variant(x, variant, prec=jax.lax.Precision.HIGHEST):
    b2 = 2 * x.shape[0]
    cm = jnp.moveaxis(x, -1, 1).reshape(b2, M).astype(jnp.float32)
    vp = build_values_payload(cm, op.binned, geom)
    nt0, nt1 = geom.tiles
    if variant.startswith("slab"):
        grid = (nt0,)
        out_spec = pl.BlockSpec(
            (1, nt1, b2) + geom.ext,
            lambda *ids: (ids[0], 0, 0, 0, 0),
            memory_space=pltpu.VMEM)
    else:
        grid = geom.tiles
        out_spec = pl.BlockSpec(
            (1, 1, b2) + geom.ext,
            lambda *ids: tuple(ids[:2]) + (0, 0, 0),
            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((NBUF, mats.shape[1], geom.chunk), jnp.float32),
            pltpu.VMEM((NBUF, vp.shape[0], geom.chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
        ],
    )
    return pl.pallas_call(
        make_kernel(variant, prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            geom.tiles + (b2,) + geom.ext, jnp.float32),
        interpret=use_interpret(),
    )(op.binned.tile_bounds, op.binned.chunk_tidx[1], mats, vp)


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


RUN = os.environ.get("ANATOMY_VARIANTS",
                     "base,nodma,nocomp,noacc,defprec").split(",")
LABELS = {
    "base": "base (faithful copy)",
    "nodma": "nodma (compute only)",
    "nocomp": "nocomp (DMA only)",
    "empty": "empty (bare loop floor)",
    "noacc": "noacc (thin accumulate)",
    "defprec": "defprec (bf16 matmuls)",
    "slab": "slab (1 program/tile row)",
    "slab_fused": "slab + fused [B2*E,C] matmul",
    "fused": "fused [B2*E,C] matmul",
    "pair": "pairwise 2-channel dots",
    "oneacc": "single shared accumulator",
}
for v in RUN:
    prec = (jax.lax.Precision.DEFAULT if v == "defprec"
            else jax.lax.Precision.HIGHEST)
    kv = "base" if v == "defprec" else v
    marginal(lambda x, kv=kv, prec=prec: spread_variant(x, kv, prec),
             LABELS[v], strengths)

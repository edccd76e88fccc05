"""Pallas rank-3 tiled mode-DFT (the type-1 post-stage).

``fft.planar_fft.dft_truncate_deconvolve_tiled`` computes the fused
overlap-add + DFT + truncation + deconvolution as three XLA
dot_generals, each contracting a (tile, ext) dim pair. On real v5e
hardware those contractions run ~5x off roofline at 3D scale: the
(nt_d, E_d) pairs are non-adjacent in the [*tiles, B2, *ext] layout,
and XLA's internal relayout of the 241 MB tile array moves at
~60 GB/s (measured; reordering the contraction chain or pre-swapping
operands does not help — tools/probe_dft4.py, probe_dft5.py).

This module runs the same three contractions as Pallas kernels whose
block shapes put every dot on the layout the data already has — no
relayout exists anywhere:

  pass A  [nt0, nt1, nt2, B2, E0, E1, E2] -> [nt0, nt1, B2, E0, E1, n2]
          per (t0, t1, pair, E0-block): dot([blk*E1, E2], [E2, n2]),
          accumulated over nt2 (the E2 lanes are already minor).
  pass B  -> [nt0, B2, E0, n1, n2]
          per (t0, pair, E0-block): dot([n1, K], [K, n2]) with K
          merging ceil(128/E1) t1-slices through a VMEM staging ref
          (E1 is typically 24 — per-slice dots would waste 5.3x of
          every MXU pass on K padding).
  pass C  -> 2 x [batch, n0, n1, n2] (planar parts)
          per (pair, n1-block): dot([n0, E0], [E0, blk*n2]),
          accumulated over nt0.

Complex arithmetic uses the same Gauss 3-multiplication trick as the
XLA formulation (the (s-c)/(s+c) twiddles are precomputed statics).
All dots run at HIGHEST precision (bf16 multiplies are ~2e-3 relative
error — far above tolerance; see fft/planar_fft.py).

Replaces the FFT+deconvolve stages of the reference
(cc/kernels/nufft_plan.cc:364-430,705-881) on the TPU planned path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorflow_nufft_tpu.kernels.binning import TileGeometry
from tensorflow_nufft_tpu.kernels.pallas_spread import (
    VMEM_RESIDENT_BUDGET,
    _MXU_PRECISION,
    use_interpret,
)

# Cap on the statically-unrolled in-kernel loops (pass A's nt2, pass
# B's nt1 staging, pass C's nt0): larger tile counts would inflate the
# Mosaic compile; such geometries fall back to the XLA formulation.
_MAX_UNROLL = 64


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_MXU_PRECISION)


def _lane_pad(n: int) -> int:
    return -(-n // 128) * 128


def supported(geom: TileGeometry, grid_shape) -> bool:
    """Whether the Pallas pass chain serves this geometry: rank 3,
    sublane-aligned extended dims (E_d are block minor dims in passes
    A/B), an 8-aligned middle grid dim (n1 is a block sublane dim in
    passes B/C) and unroll-bounded tile counts."""
    if geom.rank != 3:
        return False
    if any(e % 8 for e in geom.ext):
        return False
    if grid_shape[1] % 8:
        return False
    if max(geom.tiles) > _MAX_UNROLL:
        return False
    return _block_plan(geom, tuple(grid_shape)) is not None


@functools.lru_cache(maxsize=64)
def _block_plan(geom: TileGeometry, grid_shape):
    """(blkA, blkB, blk1) block lengths for the three passes, or None
    if no choice fits the VMEM budget. Budget counts the double-
    buffered in/out blocks at 128-lane padding."""
    nt, e = geom.tiles, geom.ext
    n0, n1, n2 = grid_shape
    n2p = _lane_pad(n2)

    def divisors_desc(n):
        return [d for d in range(n, 0, -1) if n % d == 0]

    blk_a = blk_b = blk1 = None
    for d in divisors_desc(e[0]):
        bytes_in = 4 * nt[2] * 2 * d * e[1] * _lane_pad(e[2])
        bytes_out = 4 * 2 * d * e[1] * n2p
        if 2 * (bytes_in + bytes_out) <= VMEM_RESIDENT_BUDGET:
            blk_a = d
            break
    for d in divisors_desc(e[0]):
        bytes_in = 4 * nt[1] * 2 * d * e[1] * n2p
        bytes_out = 4 * 2 * d * n1 * n2p
        if 2 * (bytes_in + bytes_out) <= VMEM_RESIDENT_BUDGET:
            blk_b = d
            break
    # Pass C merges (blk1, n2) into the minor (lane) axis when n2 is
    # 128-aligned; otherwise the kernels loop the blk1 sublane slices
    # (Mosaic can lower neither the merged reshape — observed crash
    # vector<1x72x8x72> -> vector<72x576> on the 3d_t3 inner type-2,
    # modes 72^3 — nor a blk1=1 block, whose sublane dim violates the
    # 8-divisibility rule). blk1 itself stays 8-aligned either way.
    for d in [b for b in divisors_desc(n1) if b % 8 == 0 or b == n1]:
        bytes_in = 4 * nt[0] * 2 * e[0] * d * n2p
        bytes_out = 2 * 4 * n0 * d * n2p
        if 2 * (bytes_in + bytes_out) <= VMEM_RESIDENT_BUDGET:
            blk1 = d
            break
    if blk_a is None or blk_b is None or blk1 is None:
        return None
    return blk_a, blk_b, blk1


@functools.lru_cache(maxsize=64)
def _twiddle_statics(spec, geom: TileGeometry, grid_shape):
    """Static twiddle tensors for the three passes (numpy, float32).

    A: (c, s-c, s+c) as [nt2, E2, n2] (rhs orientation).
    B: [ng, n1, gs*E1] — per-group merged transposes; rows for t1
       beyond nt1 are zero, so the staging ref's stale tail rows are
       annihilated without a per-group zero-fill.
    C: [nt0, n0, E0] (lhs orientation).
    """
    from tensorflow_nufft_tpu.fft.planar_fft import _ext_mode_twiddles
    from tensorflow_nufft_tpu.plan.plan import make_plan
    plan = make_plan(spec)
    sign = -1.0 if spec.fft_direction == "forward" else 1.0
    out = []
    for d in range(3):
        c, s = _ext_mode_twiddles(
            plan.fine_shape[d], plan.grid_shape[d], geom.tiles[d],
            geom.tile[d], geom.pad, sign, plan.deconv_weights(d),
            truncating=True)
        nt, e, n = geom.tiles[d], geom.ext[d], grid_shape[d]
        trip = [m.reshape(nt, e, n).astype(np.float32)
                for m in (c, s - c, s + c)]
        out.append(trip)
    wa = tuple(out[2])
    gs = max(1, 128 // geom.ext[1])
    ng = -(-geom.tiles[1] // gs)
    wb = []
    e1, n1 = geom.ext[1], grid_shape[1]
    for m in out[1]:
        merged = np.zeros((ng, n1, gs * e1), np.float32)
        for t1 in range(geom.tiles[1]):
            g, u = divmod(t1, gs)
            merged[g, :, u * e1:(u + 1) * e1] = m[t1].T
        wb.append(merged)
    wc = tuple(np.ascontiguousarray(m.transpose(0, 2, 1))
               for m in out[0])
    return wa, tuple(wb), wc, gs, ng


@functools.lru_cache(maxsize=64)
def _twiddle_statics_dual(spec, geom: TileGeometry, grid_shape):
    """Static twiddles for the type-2 (amplify) direction, oriented
    for the dual pass chain:

    C': [nt0, E0, n0] (lhs; K = n0 is exact-128 class).
    B': [ng, gs*E1, n1] — M-merged per-group transposes (rows beyond
        nt1 zero; never read back).
    A': [nt2, n2, E2] (rhs).
    """
    from tensorflow_nufft_tpu.fft.planar_fft import _ext_mode_twiddles
    from tensorflow_nufft_tpu.plan.plan import make_plan
    plan = make_plan(spec)
    sign = -1.0 if spec.fft_direction == "forward" else 1.0
    trips = []
    for d in range(3):
        ct, st = _ext_mode_twiddles(
            plan.fine_shape[d], plan.grid_shape[d], geom.tiles[d],
            geom.tile[d], geom.pad, sign, plan.deconv_weights(d),
            truncating=False)                       # [n_d, nt_d*E_d]
        nt, e, n = geom.tiles[d], geom.ext[d], grid_shape[d]
        trips.append([m.reshape(n, nt, e).astype(np.float32)
                      for m in (ct, st - ct, st + ct)])
    wc = tuple(np.ascontiguousarray(m.transpose(1, 2, 0))
               for m in trips[0])                   # [nt0, E0, n0]
    gs = max(1, 128 // geom.ext[1])
    ng = -(-geom.tiles[1] // gs)
    e1, n1 = geom.ext[1], grid_shape[1]
    wb = []
    for m in trips[1]:                              # [n1, nt1, E1]
        merged = np.zeros((ng, gs * e1, n1), np.float32)
        for t1 in range(geom.tiles[1]):
            g, u = divmod(t1, gs)
            merged[g, u * e1:(u + 1) * e1, :] = m[:, t1, :].T
        wb.append(merged)
    wa = tuple(np.ascontiguousarray(m.transpose(1, 0, 2))
               for m in trips[2])                   # [nt2, n2, E2]
    return wa, tuple(wb), wc, gs, ng


def _gauss(dot, xr, xi, c, smc, spc):
    t1_ = dot(xr + xi, c)
    t2_ = dot(xr, smc)
    t3_ = dot(xi, spc)
    return t1_ - t3_, t1_ + t2_


def _gauss_l(dot, c, smc, spc, xr, xi):
    t1_ = dot(c, xr + xi)
    t2_ = dot(smc, xr)
    t3_ = dot(spc, xi)
    return t1_ - t3_, t1_ + t2_


def _dual_c_kernel(xr_ref, xi_ref, c_ref, smc_ref, spc_ref, o_ref,
                   *, nt0, e0, n0, blk1, n2):
    if n2 % 128:
        # Unaligned lane dim: merging (blk1, n2) into lanes is a
        # shuffle Mosaic cannot lower — process the blk1 sublane
        # slices with a static loop instead.
        for k in range(blk1):
            xr = xr_ref[0, :, k, :]
            xi = xi_ref[0, :, k, :]
            for t0 in range(nt0):
                yr, yi = _gauss_l(_dot, c_ref[t0], smc_ref[t0],
                                  spc_ref[t0], xr, xi)
                o_ref[t0, 0, :, k, :] = yr
                o_ref[t0, 1, :, k, :] = yi
        return
    xr = xr_ref[0].reshape(n0, blk1 * n2)
    xi = xi_ref[0].reshape(n0, blk1 * n2)
    for t0 in range(nt0):
        yr, yi = _gauss_l(_dot, c_ref[t0], smc_ref[t0], spc_ref[t0],
                          xr, xi)
        o_ref[t0, 0] = yr.reshape(e0, blk1, n2)
        o_ref[t0, 1] = yi.reshape(e0, blk1, n2)


def _dual_b_kernel(x_ref, c_ref, smc_ref, spc_ref, o_ref,
                   *, nt1, blk, e1, n2, gs, ng):
    for e0 in range(blk):
        xr = x_ref[0, 0, e0]
        xi = x_ref[0, 1, e0]
        for g in range(ng):
            yr, yi = _gauss_l(_dot, c_ref[g], smc_ref[g], spc_ref[g],
                              xr, xi)
            for u in range(gs):
                t1 = g * gs + u
                if t1 < nt1:
                    o_ref[0, t1, 0, e0] = yr[u * e1:(u + 1) * e1]
                    o_ref[0, t1, 1, e0] = yi[u * e1:(u + 1) * e1]


def _dual_a_kernel(x_ref, c_ref, smc_ref, spc_ref, o_ref,
                   *, nt2, blk, e1, e2, n2):
    xr = x_ref[0, 0, 0].reshape(blk * e1, n2)
    xi = x_ref[0, 0, 1].reshape(blk * e1, n2)
    for t2 in range(nt2):
        yr, yi = _gauss(_dot, xr, xi, c_ref[t2], smc_ref[t2],
                        spc_ref[t2])
        o_ref[0, 0, t2, 0] = yr.reshape(blk, e1, e2)
        o_ref[0, 0, t2, 1] = yi.reshape(blk, e1, e2)


def amplify_pad_dft_tiled_pallas(modes: jax.Array, plan,
                                 geom: TileGeometry) -> jax.Array:
    """Drop-in Pallas service of
    ``fft.planar_fft.amplify_pad_dft_tiled`` (rank 3 only; gate with
    ``supported``). Runs the dual pass chain n0->(nt0,E0) ->
    n1->(nt1,E1) -> n2->(nt2,E2); the output is written tiles-major
    directly, so the XLA formulation's trailing 7-dim transpose never
    exists."""
    nt, e = geom.tiles, geom.ext
    n0, n1, n2 = plan.grid_shape
    batch = modes.shape[0]
    b2 = 2 * batch
    wa, wb, wc, gs, ng = _twiddle_statics_dual(
        plan.spec, geom, tuple(plan.grid_shape))
    blk_a, blk_b, blk1 = _block_plan(geom, tuple(plan.grid_shape))
    interp = use_interpret()
    xr = modes[..., 0]
    xi = modes[..., 1]

    wc_j = [jnp.asarray(m) for m in wc]
    y = pl.pallas_call(
        functools.partial(_dual_c_kernel, nt0=nt[0], e0=e[0], n0=n0,
                          blk1=blk1, n2=n2),
        grid=(batch, n1 // blk1),
        in_specs=_vmem_specs(
            ((1, n0, blk1, n2), lambda b, k: (b, 0, k, 0)),
            ((1, n0, blk1, n2), lambda b, k: (b, 0, k, 0)),
            (None, None), (None, None), (None, None)),
        out_specs=pl.BlockSpec(
            (nt[0], 2, e[0], blk1, n2),
            lambda b, k: (0, b, 0, k, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (nt[0], b2, e[0], n1, n2), jnp.float32),
        interpret=interp,
    )(xr, xi, *wc_j)

    wb_j = [jnp.asarray(m) for m in wb]
    y = pl.pallas_call(
        functools.partial(_dual_b_kernel, nt1=nt[1], blk=blk_b,
                          e1=e[1], n2=n2, gs=gs, ng=ng),
        grid=(nt[0], batch, e[0] // blk_b),
        in_specs=_vmem_specs(
            (((1, 2, blk_b, n1, n2),
              lambda i, b, k: (i, b, k, 0, 0))),
            (None, None), (None, None), (None, None)),
        out_specs=pl.BlockSpec(
            (1, nt[1], 2, blk_b, e[1], n2),
            lambda i, b, k: (i, 0, b, k, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (nt[0], nt[1], b2, e[0], e[1], n2), jnp.float32),
        interpret=interp,
    )(y, *wb_j)

    wa_j = [jnp.asarray(m) for m in wa]
    return pl.pallas_call(
        functools.partial(_dual_a_kernel, nt2=nt[2], blk=blk_a,
                          e1=e[1], e2=e[2], n2=n2),
        grid=(nt[0], nt[1], batch, e[0] // blk_a),
        in_specs=_vmem_specs(
            (((1, 1, 2, blk_a, e[1], n2),
              lambda i, j, b, k: (i, j, b, k, 0, 0))),
            (None, None), (None, None), (None, None)),
        out_specs=pl.BlockSpec(
            (1, 1, nt[2], 2, blk_a, e[1], e[2]),
            lambda i, j, b, k: (i, j, 0, b, k, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            nt + (b2,) + e, jnp.float32),
        interpret=interp,
    )(y, *wa_j)


def _pass_a_kernel(x_ref, c_ref, smc_ref, spc_ref, o_ref, *, nt2,
                   blk, e1, e2, n2):
    yr = jnp.zeros((blk * e1, n2), jnp.float32)
    yi = jnp.zeros((blk * e1, n2), jnp.float32)
    for t2 in range(nt2):
        xr = x_ref[0, 0, t2, 0].reshape(blk * e1, e2)
        xi = x_ref[0, 0, t2, 1].reshape(blk * e1, e2)
        t1_ = _dot(xr + xi, c_ref[t2])
        t2_ = _dot(xr, smc_ref[t2])
        t3_ = _dot(xi, spc_ref[t2])
        yr = yr + (t1_ - t3_)
        yi = yi + (t1_ + t2_)
    o_ref[0, 0, 0] = yr.reshape(blk, e1, n2)
    o_ref[0, 0, 1] = yi.reshape(blk, e1, n2)


def _pass_b_kernel(x_ref, c_ref, smc_ref, spc_ref, o_ref, stage,
                   *, nt1, blk, e1, n1, n2, gs, ng):
    stage[...] = jnp.zeros_like(stage)
    for e0 in range(blk):
        yr = jnp.zeros((n1, n2), jnp.float32)
        yi = jnp.zeros((n1, n2), jnp.float32)
        for g in range(ng):
            for u in range(gs):
                t1 = g * gs + u
                if t1 < nt1:
                    stage[0, u * e1:(u + 1) * e1] = x_ref[0, t1, 0, e0]
                    stage[1, u * e1:(u + 1) * e1] = x_ref[0, t1, 1, e0]
            sr, si = stage[0], stage[1]
            t1_ = _dot(c_ref[g], sr + si)
            t2_ = _dot(smc_ref[g], sr)
            t3_ = _dot(spc_ref[g], si)
            yr = yr + (t1_ - t3_)
            yi = yi + (t1_ + t2_)
        o_ref[0, 0, e0] = yr
        o_ref[0, 1, e0] = yi


def _pass_c_kernel(x_ref, c_ref, smc_ref, spc_ref, or_ref, oi_ref,
                   *, nt0, e0, n0, blk1, n2):
    if n2 % 128:
        # See _dual_c_kernel: loop the blk1 sublane slices instead of
        # merging (blk1, n2) into lanes (illegal for unaligned n2).
        for k in range(blk1):
            yr = jnp.zeros((n0, n2), jnp.float32)
            yi = jnp.zeros((n0, n2), jnp.float32)
            for t0 in range(nt0):
                xr = x_ref[t0, 0, :, k, :]
                xi = x_ref[t0, 1, :, k, :]
                t1_ = _dot(c_ref[t0], xr + xi)
                t2_ = _dot(smc_ref[t0], xr)
                t3_ = _dot(spc_ref[t0], xi)
                yr = yr + (t1_ - t3_)
                yi = yi + (t1_ + t2_)
            or_ref[0, :, k, :] = yr
            oi_ref[0, :, k, :] = yi
        return
    yr = jnp.zeros((n0, blk1 * n2), jnp.float32)
    yi = jnp.zeros((n0, blk1 * n2), jnp.float32)
    for t0 in range(nt0):
        xr = x_ref[t0, 0].reshape(e0, blk1 * n2)
        xi = x_ref[t0, 1].reshape(e0, blk1 * n2)
        t1_ = _dot(c_ref[t0], xr + xi)
        t2_ = _dot(smc_ref[t0], xr)
        t3_ = _dot(spc_ref[t0], xi)
        yr = yr + (t1_ - t3_)
        yi = yi + (t1_ + t2_)
    or_ref[0] = yr.reshape(n0, blk1, n2)
    oi_ref[0] = yi.reshape(n0, blk1, n2)


def _vmem_specs(*shapes_and_maps):
    return [pl.BlockSpec(s, m, memory_space=pltpu.VMEM) if s else
            pl.BlockSpec(memory_space=pltpu.VMEM)
            for s, m in shapes_and_maps]


def dft_truncate_deconvolve_tiled_pallas(
        tiles: jax.Array, plan, geom: TileGeometry,
        batch: int) -> jax.Array:
    """Drop-in Pallas service of
    ``fft.planar_fft.dft_truncate_deconvolve_tiled`` (rank 3 only;
    gate with ``supported``). Same inputs, same outputs, same
    numerics class (HIGHEST-precision f32 contractions)."""
    nt, e = geom.tiles, geom.ext
    n0, n1, n2 = plan.grid_shape
    b2 = 2 * batch
    wa, wb, wc, gs, ng = _twiddle_statics(
        plan.spec, geom, tuple(plan.grid_shape))
    blk_a, blk_b, blk1 = _block_plan(geom, tuple(plan.grid_shape))
    interp = use_interpret()
    x = tiles.reshape(nt + (b2,) + e)

    # Pass A: contract (nt2, E2) -> n2.
    wa_j = [jnp.asarray(m) for m in wa]
    y = pl.pallas_call(
        functools.partial(_pass_a_kernel, nt2=nt[2], blk=blk_a,
                          e1=e[1], e2=e[2], n2=n2),
        grid=(nt[0], nt[1], batch, e[0] // blk_a),
        in_specs=_vmem_specs(
            (((1, 1, nt[2], 2, blk_a, e[1], e[2]),
              lambda i, j, b, k: (i, j, 0, b, k, 0, 0))),
            (None, None), (None, None), (None, None)),
        out_specs=pl.BlockSpec(
            (1, 1, 2, blk_a, e[1], n2),
            lambda i, j, b, k: (i, j, b, k, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (nt[0], nt[1], b2, e[0], e[1], n2), jnp.float32),
        interpret=interp,
    )(x, *wa_j)

    return _run_passes_bc(y, plan, geom, batch)


def _run_passes_bc(y: jax.Array, plan, geom: TileGeometry,
                   batch: int) -> jax.Array:
    """Passes B and C on a pass-A output [nt0, nt1, B2, E0, E1, n2]."""
    nt, e = geom.tiles, geom.ext
    n0, n1, n2 = plan.grid_shape
    b2 = 2 * batch
    _, wb, wc, gs, ng = _twiddle_statics(
        plan.spec, geom, tuple(plan.grid_shape))
    _, blk_b, blk1 = _block_plan(geom, tuple(plan.grid_shape))
    interp = use_interpret()

    # Pass B: contract (nt1, E1) -> n1 with K-merged staging.
    wb_j = [jnp.asarray(m) for m in wb]
    y = pl.pallas_call(
        functools.partial(_pass_b_kernel, nt1=nt[1], blk=blk_b,
                          e1=e[1], n1=n1, n2=n2, gs=gs, ng=ng),
        grid=(nt[0], batch, e[0] // blk_b),
        in_specs=_vmem_specs(
            (((1, nt[1], 2, blk_b, e[1], n2),
              lambda i, b, k: (i, 0, b, k, 0, 0))),
            (None, None), (None, None), (None, None)),
        out_specs=pl.BlockSpec(
            (1, 2, blk_b, n1, n2),
            lambda i, b, k: (i, b, k, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (nt[0], b2, e[0], n1, n2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, gs * e[1], n2), jnp.float32)],
        interpret=interp,
    )(y, *wb_j)

    # Pass C: contract (nt0, E0) -> n0; planar parts as two outputs so
    # the final channel stack matches the XLA formulation's epilogue.
    wc_j = [jnp.asarray(m) for m in wc]
    yr, yi = pl.pallas_call(
        functools.partial(_pass_c_kernel, nt0=nt[0], e0=e[0], n0=n0,
                          blk1=blk1, n2=n2),
        grid=(batch, n1 // blk1),
        in_specs=_vmem_specs(
            (((nt[0], 2, e[0], blk1, n2),
              lambda b, k: (0, b, 0, k, 0))),
            (None, None), (None, None), (None, None)),
        out_specs=[
            pl.BlockSpec((1, n0, blk1, n2),
                         lambda b, k: (b, 0, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n0, blk1, n2),
                         lambda b, k: (b, 0, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, n0, n1, n2), jnp.float32),
            jax.ShapeDtypeStruct((batch, n0, n1, n2), jnp.float32),
        ],
        interpret=interp,
    )(y, *wc_j)
    return jnp.stack([yr, yi], axis=-1)


def spread_dft_fused(strengths_cm, points_resc, plan,
                     geom: TileGeometry, batch: int, *, binned,
                     mats=None, coords=None, band_info=None,
                     values_slots=None) -> jax.Array:
    """Planned rank-3 type-1 spread + mode-DFT with the axis-2 DFT
    pass fused into the banded spread kernel's epilogue (the full
    extended tile array never round-trips HBM — 2 x 241 MB at 3D
    128^3/800k). Falls back to spread + the staged DFT whenever the
    fusion's gates do not hold (no band, mats-level plan, unsupported
    geometry, VMEM)."""
    from tensorflow_nufft_tpu.fft.planar_fft import (
        dft_truncate_deconvolve_tiled)
    from tensorflow_nufft_tpu.kernels.pallas_spread import (
        fused_dfta_fits, spread_pallas_tiles)
    band_ok = (band_info is not None and geom.rank == 3
               and mats is None and band_info[0] < geom.ext[0])
    if (band_ok and supported(geom, plan.grid_shape)
            and fused_dfta_fits(geom, 2, plan.grid_shape[2],
                                band_info[0])):
        wa, _, _, _, _ = _twiddle_statics(
            plan.spec, geom, tuple(plan.grid_shape))
        y, _ = spread_pallas_tiles(
            strengths_cm, points_resc, plan, binned=binned,
            coords=coords, geom=geom, band_info=band_info,
            values_slots=values_slots,
            dft_a=wa + (plan.grid_shape[2],))
        return _run_passes_bc(y, plan, geom, batch)
    tiles, _ = spread_pallas_tiles(
        strengths_cm, points_resc, plan, binned=binned, mats=mats,
        coords=coords, geom=geom, band_info=band_info,
        values_slots=values_slots)
    return dft_truncate_deconvolve_tiled(tiles, plan, geom, batch)

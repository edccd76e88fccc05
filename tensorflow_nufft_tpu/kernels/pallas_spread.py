"""Pallas TPU spread kernel (type-1 scatter) — the MXU formulation.

Replaces the reference's atomics-based CUDA spreading
(cc/kernels/nufft_plan.cu.cc:473-650 and the CPU subproblem spreader,
nufft_plan.cc:1463-1734) with a design built for the TPU's strengths:

  1. Points are grouped by fine-grid tile (XLA preprocessing, binning.py,
     no comparison sort) into fixed-size chunks with a static,
     distribution-independent bound.
  2. The grid is *static over tiles* — one program per tile owns that
     tile's halo-padded output block exclusively. Each program walks its
     own chunk range (scalar-prefetched bounds) with double-buffered
     manual DMA from HBM, so point data streaming overlaps compute.
     (An earlier design used one program per chunk with data-dependent
     output block indices; the dynamic-index revisit machinery cost
     ~24 us of fixed overhead per program and dominated the kernel.)
  3. Per chunk, the separable ES kernel is evaluated densely into
     windowed kernel matrices A_d[m, e] = phi(e - s_m^d). The scatter
     becomes matmuls: tile += A_y^T @ (strength * A_x) (2D; 1D is a
     masked reduce, 3D loops z-planes of the same matmul) — MXU work,
     no atomics, no per-point control flow.
  4. Halos are merged by a deterministic overlap-add, fused into the
     downstream mode-DFT contraction (fft/planar_fft.py).

Padded chunk slots carry a far-away sentinel coordinate, making their
kernel weights exactly zero — correctness does not depend on masks or on
the point distribution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorflow_nufft_tpu.kernels.binning import (
    TileGeometry,
    bin_points,
    build_combined_payload,
    build_coords_payload,
    build_values_payload,
    choose_geometry,
    combined_fits,
    overlap_add,
    pack_values_slots,
)
from tensorflow_nufft_tpu.plan.plan import NufftPlan

_MXU_PRECISION = jax.lax.Precision.HIGHEST

# Channels (folded batch*re/im) per pallas_call: the per-channel compute
# is statically unrolled in the kernels and large batches blow up the
# Mosaic compile (and VMEM); bigger batches run as grouped calls.
MAX_CHANNELS = 8

# Historical note: an in-kernel channel loop (CHANNEL_LOOP) was
# prototyped to admit wider channel groups for multicoil transforms.
# The round-3 hardware sweep (tools/chan_group.py, BENCH_NOTES)
# found (a) Mosaic cannot lower the dynamic per-channel tile indexing
# (dynamic_slice) on real TPU, and (b) wider groups buy nothing on the
# batch-16 case anyway once the mats-streaming kernel is selected (the
# kernels are MXU-bound, not payload-DMA-bound). The static unroll at
# MAX_CHANNELS=8 stays.


def use_interpret() -> bool:
    """Interpreter mode off-TPU so the kernels are testable on CPU."""
    try:
        return jax.default_backend() != "tpu"
    except RuntimeError:
        return True


def supports(plan: NufftPlan) -> bool:
    """Pallas path support: ranks 1-3, float32 precision (complex64)."""
    return plan.rank in (1, 2, 3) and plan.spec.dtype_name == "complex64"


def num_points_of(points_resc) -> int:
    """M from a coords array or a two-float (hi, lo) pair."""
    if isinstance(points_resc, tuple):
        return points_resc[0].shape[0]
    return points_resc.shape[0]


def es_kernel_matrix(num_offsets: int, s_hi: jax.Array, s_lo: jax.Array,
                     beta, c, half_width, horner=None):
    """[C] window centers -> [E, C] matrix phi(e - s_m) over integer
    offsets e in [0, E); exactly zero outside |z| < half_width. The
    center is the two-float pair (s_hi, s_lo) so the kernel argument
    keeps full coordinate precision (see fold_and_rescale_split).

    Orientation: offsets along sublanes, points along lanes — the
    centers (lane rows of the payload) broadcast without transposes,
    and merging the leading E dims (the rank-3 Khatri-Rao fold) is a
    layout-free reshape.

    With ``horner`` (the plan's fitted polynomial in t = 2(2z/w)^2 - 1,
    ascending coefficients), evaluation is transcendental-free and ~3x
    more accurate in f32 (see plan.fit_horner_coeffs)."""
    offsets = jax.lax.broadcasted_iota(
        jnp.int32, (num_offsets, s_hi.shape[0]), 0).astype(jnp.float32)
    z = (offsets - s_hi[None, :]) - s_lo[None, :]
    if horner is not None:
        c2 = np.float32(2.0 / (float(half_width) * float(half_width)))
        t = z * z * c2 - np.float32(1.0)
        inside = t < np.float32(1.0)
        t = jnp.where(inside, t, np.float32(1.0))
        acc = jnp.full_like(t, np.float32(horner[-1]))
        for a in horner[-2::-1]:
            acc = acc * t + np.float32(a)
        return jnp.where(inside, acc, np.float32(0.0))
    inside = jnp.abs(z) < half_width
    arg = jnp.where(inside, 1.0 - c * z * z, 0.0)
    return jnp.where(inside, jnp.exp(beta * jnp.sqrt(arg)), 0.0)


def es_kernel_matrix_deriv(num_offsets: int, s_hi: jax.Array,
                           s_lo: jax.Array, beta, c, half_width):
    """es_kernel_matrix with the analytic derivative
    phi'(e - s) = -beta c (e - s) phi(e - s) / sqrt(1 - c (e - s)^2)
    (spread-only VJPs; direct evaluation — the Horner fit approximates
    phi, not phi')."""
    offsets = jax.lax.broadcasted_iota(
        jnp.int32, (num_offsets, s_hi.shape[0]), 0).astype(jnp.float32)
    z = (offsets - s_hi[None, :]) - s_lo[None, :]
    inside = jnp.abs(z) < half_width
    arg = jnp.where(inside, jnp.maximum(1.0 - c * z * z, 1e-12), 1.0)
    r = jnp.sqrt(arg)
    val = -beta * c * z * jnp.exp(beta * r) / r
    return jnp.where(inside, val, 0.0)


def kernel_matrices_from(data, origins, geom: TileGeometry, beta, c,
                         half_width, horner=None, deriv_axis=None):
    """Per-axis [E_d, C] kernel matrices from a payload chunk.

    data: [R, C] chunk (rows 0..rank-1 hi words, rank..2rank-1 lo).
    origins: per-axis extended-tile origin (tile_idx * tile - pad).
    deriv_axis: if set, that axis evaluates the analytic kernel
    derivative (spread-only VJPs).
    """
    rank = geom.rank
    mats = []
    for d in range(rank):
        s_hi = data[d, :] - origins[d]
        s_lo = data[rank + d, :]
        if deriv_axis == d:
            mats.append(es_kernel_matrix_deriv(
                geom.ext[d], s_hi, s_lo, beta, c, half_width))
        else:
            mats.append(es_kernel_matrix(
                geom.ext[d], s_hi, s_lo, beta, c, half_width, horner))
    return mats


def chunk_contribution(mats_t, s_row, geom: TileGeometry):
    """One channel's spread contribution from [E_d, C] matrices and a
    [C]-lane strengths row.

    Returns [E0] (rank 1), [Ey, Ex] (rank 2) or [Ez, Ey, Ex] (rank 3).
    Rank 3 folds the z and y factors with a Khatri-Rao product into ONE
    [Ez*Ey, C] x [Ex, C] contraction — one big matmul instead of Ez
    unrolled small ones (better MXU utilization, far smaller compile
    graph).
    """
    rank = geom.rank
    dn = (((1,), (1,)), ((), ()))        # contract the shared C dim
    s = s_row[None, :]
    if rank == 1:
        return jnp.sum(mats_t[0] * s, axis=1)
    if rank == 2:
        p = mats_t[1] * s                                   # [Ex, C]
        return jax.lax.dot_general(
            mats_t[0], p, dn, preferred_element_type=jnp.float32,
            precision=_MXU_PRECISION)                        # [Ey, Ex]
    e0, e1, e2 = geom.ext
    w = (mats_t[0][:, None, :] * mats_t[1][None, :, :]).reshape(
        e0 * e1, -1)                                        # [ZY, C]
    p = mats_t[2] * s                                       # [Ex, C]
    out = jax.lax.dot_general(
        w, p, dn, preferred_element_type=jnp.float32,
        precision=_MXU_PRECISION)                            # [ZY, Ex]
    return out.reshape(e0, e1, e2)


def horner_static(plan: NufftPlan):
    """The plan's Horner coefficients as a hashable static kernel arg
    (tuple of floats), or None."""
    if plan.horner is None:
        return None
    return tuple(float(a) for a in plan.horner)


# Lane width of the rank-3 sub-chunk fold (see
# accumulate_spread_subchunk): one MXU lane tile per fori_loop step.
RANK3_SUB = 128


def accumulate_spread_subchunk(tile_ref, mats_t, v_scratch, slot,
                               geom: TileGeometry, batch2: int, mref,
                               rank_offset: int = 0):
    """Rank-3 chunk accumulation in RANK3_SUB-lane sub-chunks.

    The Khatri-Rao fold's [E0*E1, C] intermediate is the kernel-stack
    hog: Mosaic keeps ~7 live copies of the largest straight-line
    matmul operand, which capped rank-3 chunks at 128 points and made
    the kernel per-chunk-overhead-bound (~7 us/chunk). Staging the
    per-axis matrices in the ``mref`` VMEM ref and folding RANK3_SUB
    lanes per fori_loop iteration keeps the live set at
    [E0*E1, RANK3_SUB] regardless of chunk size, so chunks grow to
    1024 and the overhead amortizes. The fold itself (and its MXU
    shape) is unchanged — per-z-plane loops measured 1.2-1.6x slower
    (latency-bound small matmuls)."""
    e0, e1, e2 = geom.ext
    mref[0:e0, :] = mats_t[0]
    mref[e0:e0 + e1, :] = mats_t[1]
    mref[e0 + e1:, :] = mats_t[2]
    sub = min(RANK3_SUB, geom.chunk)
    dn = (((1,), (1,)), ((), ()))        # contract the shared lane dim

    def body(j, _):
        js = pl.ds(j * sub, sub)
        m0 = mref[0:e0, js]
        m1 = mref[e0:e0 + e1, js]
        m2 = mref[e0 + e1:, js]
        w = (m0[:, None, :] * m1[None, :, :]).reshape(e0 * e1, sub)
        for b in range(batch2):         # static unroll over channels
            p = m2 * v_scratch[slot, rank_offset + b, js][None, :]
            contrib = jax.lax.dot_general(
                w, p, dn, preferred_element_type=jnp.float32,
                precision=_MXU_PRECISION)                    # [ZY, Ex]
            tile_ref[0, 0, 0, b] += contrib.reshape(e0, e1, e2)
        return 0

    jax.lax.fori_loop(0, geom.chunk // sub, body, 0)


def accumulate_spread_subchunk_refs(tile_ref, m_scratch, slot,
                                    v_scratch, geom: TileGeometry,
                                    batch2: int):
    """accumulate_spread_subchunk reading the per-axis matrices straight
    from the streamed [NBUF, sum(E_d), C] concatenated scratch ref (mats
    variant — no staging copy needed)."""
    e0, e1, e2 = geom.ext
    sub = min(RANK3_SUB, geom.chunk)
    dn = (((1,), (1,)), ((), ()))

    def body(j, _):
        js = pl.ds(j * sub, sub)
        m0 = m_scratch[slot, 0:e0, js]
        m1 = m_scratch[slot, e0:e0 + e1, js]
        m2 = m_scratch[slot, e0 + e1:, js]
        w = (m0[:, None, :] * m1[None, :, :]).reshape(e0 * e1, sub)
        for b in range(batch2):         # static unroll over channels
            p = m2 * v_scratch[slot, b, js][None, :]         # [Ex, S]
            contrib = jax.lax.dot_general(
                w, p, dn, preferred_element_type=jnp.float32,
                precision=_MXU_PRECISION)                    # [ZY, Ex]
            tile_ref[0, 0, 0, b] += contrib.reshape(e0, e1, e2)
        return 0

    jax.lax.fori_loop(0, geom.chunk // sub, body, 0)


def accumulate_spread_banded(tile_ref, zorig_ref, k, c_ref, v_ref,
                             slot, mref, origins, geom: TileGeometry,
                             batch2: int, band: int, beta, c,
                             half_width, rank_offset: int,
                             horner=None):
    """Rank-3 chunk accumulation with a dynamic axis-0 band.

    Requires z-ordered binning (bin_points zorder=True) and the
    per-sub-chunk band origins from binning.compute_band_origins:
    sub-chunk j of chunk k touches only rows
    [zorig[k*subs+j], +band) of the extended tile, so the Khatri-Rao
    fold contracts [band, E1] x [E1..] instead of [E0, E1] — an
    ~E0/band FLOP reduction on the MXU-bound 3D spread. The y/x
    matrices are evaluated once per chunk into ``mref``; the z band
    matrix is evaluated per sub-chunk against its own origin (band*S
    lanes of VPU work — far below the full-E0 eval it replaces).

    ``c_ref``/``v_ref`` are the payload scratch REFS (pl.ds sub-chunk
    slicing needs refs); ``slot`` the active buffer. Coordinate rows
    live in c_ref (0..2 hi words, 3..5 lo), channel values in rows
    ``rank_offset..`` of v_ref (c_ref is v_ref for the combined
    payload).
    """
    e0, e1, e2 = geom.ext
    sublen = min(RANK3_SUB, geom.chunk)
    subs = geom.chunk // sublen
    m1 = es_kernel_matrix(e1, c_ref[slot, 1, :] - origins[1],
                          c_ref[slot, 4, :], beta, c, half_width,
                          horner)
    m2 = es_kernel_matrix(e2, c_ref[slot, 2, :] - origins[2],
                          c_ref[slot, 5, :], beta, c, half_width,
                          horner)
    mref[0:e1, :] = m1
    mref[e1:e1 + e2, :] = m2
    dn = (((1,), (1,)), ((), ()))        # contract the shared lane dim

    def body(j, _):
        js = pl.ds(j * sublen, sublen)
        zo = zorig_ref[k * subs + j]
        s_hi_z = (c_ref[slot, 0, js] - origins[0]) \
            - zo.astype(jnp.float32)
        m0b = es_kernel_matrix(band, s_hi_z, c_ref[slot, 3, js],
                               beta, c, half_width, horner)
        m1s = mref[0:e1, js]
        m2s = mref[e1:e1 + e2, js]
        w = (m0b[:, None, :] * m1s[None, :, :]).reshape(band * e1,
                                                        sublen)
        for b in range(batch2):         # static unroll over channels
            p = m2s * v_ref[slot, rank_offset + b, js][None, :]
            contrib = jax.lax.dot_general(
                w, p, dn, preferred_element_type=jnp.float32,
                precision=_MXU_PRECISION)                # [band*E1, E2]
            tile_ref[0, 0, 0, b, pl.ds(zo, band)] += contrib.reshape(
                band, e1, e2)
        return 0

    jax.lax.fori_loop(0, subs, body, 0)


def accumulate_spread(tile_ref, mats_t, data, geom: TileGeometry,
                      batch2: int, rank_offset: int):
    """Adds one chunk's contribution into the (single-tile) output
    block. data rows [rank_offset + b] are the per-channel strengths."""
    rank = geom.rank
    for b in range(batch2):             # static unroll over channels
        contrib = chunk_contribution(mats_t, data[rank_offset + b, :],
                                     geom)
        tile_ref[(0,) * rank + (b,)] += contrib


def _tile_origins(geom: TileGeometry):
    """Per-axis extended-tile origins for the current program."""
    return [
        (pl.program_id(d) * geom.tile[d] - geom.pad).astype(jnp.float32)
        for d in range(geom.rank)
    ]


def _linear_tile_id(geom: TileGeometry):
    t = pl.program_id(0)
    for d in range(1, geom.rank):
        t = t * geom.tiles[d] + pl.program_id(d)
    return t


# Prefetch depth for the chunk-streaming pipeline: per-chunk compute is
# well under DMA latency (~2 us), so two buffers stall on every wait;
# four keep the stream ahead of compute.
NBUF = 4

# VMEM budget for one resident program: tile array + DMA scratch +
# kernel-stack temporaries must fit v5e's ~16 MB VMEM with compiler
# headroom (Mosaic reserves a few MB for vregs/spills; 12 MB of modeled
# use is the empirically safe ceiling).
VMEM_RESIDENT_BUDGET = 12 * 2 ** 20


def _stack_bytes(geom: TileGeometry, batch2: int) -> int:
    """Mosaic kernel-stack temporaries of the unrolled per-channel
    contractions. The largest live intermediate is [rows, C] with
    rows = E0*E1 for the rank-3 Khatri-Rao fold, max(E) otherwise;
    HIGHEST-precision matmuls stage multiple bf16-pass copies of it.
    The rank-3 multiplier is calibrated from v5e scoped-vmem OOM
    reports (9.15 MB/channel at E0*E1=640, C=512 => ~7 copies); the
    rank<=2 multiplier of 1 is calibrated from which 2D group sizes
    compile. Underestimating is a hard compile error ('scoped vmem'
    stack OOM)."""
    rank = geom.rank
    if rank == 3:
        rows, copies = geom.ext[0] * geom.ext[1], 7
    else:
        rows, copies = max(geom.ext), 1
    return 4 * batch2 * copies * rows * geom.chunk


def _scratch_bytes(geom: TileGeometry, batch2: int) -> int:
    """Worst-case VMEM footprint of a resident kernel beyond the tile
    array: NBUF double-buffered per-chunk payloads (precomputed [E_d, C]
    kernel matrices dominate; the coords/values variant is smaller), the
    interp side's two outbound [B2, C] buffers, and the kernel-stack
    temporaries (see _stack_bytes)."""
    per_chunk = (sum(geom.ext) + 8) * geom.chunk
    out_stream = 2 * batch2 * geom.chunk
    return (4 * (NBUF * per_chunk + out_stream)
            + _stack_bytes(geom, batch2))


def _stack_bytes_streaming(geom: TileGeometry, batch2: int,
                           band=None) -> int:
    """Kernel-stack model for the per-tile-grid (streaming) kernels.
    Rank 3 runs the sub-chunk fold (accumulate_spread_subchunk): ~7
    copies of the shared [E0*E1, RANK3_SUB] fold slice plus per-channel
    [E0*E1, E2] contribution/tile temporaries (E0 -> band for the
    banded kernels); rank <= 2 matches _stack_bytes."""
    if geom.rank != 3:
        return _stack_bytes(geom, batch2)
    e0, e1, e2 = geom.ext
    if band:
        e0 = band
    sub = min(RANK3_SUB, geom.chunk)
    return 4 * (7 * e0 * e1 * sub + 3 * batch2 * e0 * e1 * e2)


def _scratch_bytes_streaming(geom: TileGeometry, batch2: int,
                             band=None) -> int:
    """_scratch_bytes for the streaming kernels: adds the rank-3
    kernel-matrix staging ref ([sum(ext), chunk]; banded kernels stage
    only the y/x axes) and uses the sub-chunk stack model."""
    per_chunk = (sum(geom.ext) + 8) * geom.chunk
    out_stream = 2 * batch2 * geom.chunk
    if geom.rank == 3:
        rows = (sum(geom.ext[1:]) if band else sum(geom.ext))
        mref = rows * geom.chunk
    else:
        mref = 0
    return (4 * (NBUF * per_chunk + out_stream + mref)
            + _stack_bytes_streaming(geom, batch2, band))


def resident_fits(geom: TileGeometry, batch2: int) -> bool:
    """Whether the whole [*tiles, B2, *ext] array plus scratch + stack
    fits the VMEM budget (the single-program kernel needs the tile
    array resident)."""
    tiles = (geom.num_tiles * batch2 * int(np.prod(geom.ext))) * 4
    return tiles + _scratch_bytes(geom, batch2) <= VMEM_RESIDENT_BUDGET


def resident_group_size(geom: TileGeometry) -> int:
    """Largest channel-group size (<= MAX_CHANNELS, multiple of 2 so
    planar re/im pairs stay together) whose tile array stays resident;
    0 if not even 2 channels fit."""
    g = MAX_CHANNELS
    while g >= 2:
        if resident_fits(geom, g):
            return g
        g -= 2
    return 0


def streaming_group_size(geom: TileGeometry, band=None) -> int:
    """Channel-group size for the per-tile-grid (streaming) kernels:
    their VMEM cost is one [g, *ext] block plus pipeline scratch and
    the contraction stack — the rank-3 stack term forces small groups
    (the tile block itself is tiny)."""
    g = MAX_CHANNELS
    while g >= 2:
        block = g * int(np.prod(geom.ext)) * 4
        if block + _scratch_bytes_streaming(geom, g, band) <= \
                VMEM_RESIDENT_BUDGET:
            return g
        g -= 2
    return 0          # not even 2 channels fit: caller must not launch


def accumulate_spread_at(out_ref, tids, mats_t, data,
                         geom: TileGeometry, batch2: int,
                         rank_offset: int):
    """accumulate_spread with dynamic leading tile indices ``tids``."""
    for b in range(batch2):             # static unroll over channels
        contrib = chunk_contribution(mats_t, data[rank_offset + b, :],
                                     geom)
        out_ref[tuple(tids) + (b,)] += contrib


# Wide-channel payload dispatch knob: with multiple channel groups, a
# mats-level plan re-streams the full kernel-matrix payload (sum(ext)
# rows per chunk — ~144 at the 2D 256^2 geometry) once per group; the
# coords payload is 8 rows (2*rank hi/lo words, sublane-padded), ~17x
# smaller, at the cost of in-kernel Horner evaluation. Measured on v5e
# (tools/probe_b16_levers.py) the two are speed-IDENTICAL at the b16
# 200k scale (the spread kernel is bound elsewhere — see the round-5
# knockout matrix in BENCH_NOTES), and at the cg_sense scale (32k pts)
# the in-kernel eval showed up as ~+12% on the recon, so the default
# stays mats (False). True forces coords streaming (probe knob; also
# the right manual choice when HBM or compile-literal budget is the
# constraint rather than time).
WIDE_COORDS_STREAMING = False


def _prefer_wide_coords(batch2: int, group: int, mats_group: int) -> bool:
    del batch2, group, mats_group
    return bool(WIDE_COORDS_STREAMING)


# HBM budget for precomputed kernel-matrix payloads (build_kernel_
# matrix_payload): beyond this, fall back to in-kernel evaluation.
# Sized for HBM but ALSO bounded by the remote-compile relay: planned
# payloads are closed-over device arrays, which JAX inlines as MLIR
# literals, so they ship in the compile request body — a ~211 MB 2D
# payload compiles, a 508 MB 3D one gets HTTP 413 (body length limit).
MATS_BYTES_BUDGET = 256 * 2 ** 20


def mats_payload_bytes(geom: TileGeometry) -> int:
    return 4 * geom.num_chunks * geom.chunk * sum(geom.ext)


def _mats_slices(m_ref, slot, geom: TileGeometry):
    """Per-axis [E_d, C] views of one slot of the concatenated
    [NBUF, sum(E_d), C] mats scratch."""
    views = []
    off = 0
    for d in range(geom.rank):
        views.append(m_ref[slot, off:off + geom.ext[d], :])
        off += geom.ext[d]
    return views


def _spread_kernel_resident_mats(*refs, geom: TileGeometry, batch2):
    """Resident spread consuming precomputed kernel matrices.

    Pure DMA + MXU: the VPU polynomial evaluation lives in the hoisted
    XLA precompute (binning.build_kernel_matrix_payload); per chunk this
    kernel only waits for the streamed concatenated [sum(E_d), C]
    matrix slice (one DMA) plus the values row block and runs the
    accumulation matmuls.
    """
    rank = geom.rank
    bounds_ref = refs[0]
    ct_refs = refs[1:1 + rank]
    mats_hbm = refs[1 + rank]
    values_hbm = refs[2 + rank]
    out_ref = refs[3 + rank]
    m_scratch = refs[4 + rank]
    v_scratch = refs[5 + rank]
    sems = refs[6 + rank]
    used = bounds_ref[geom.num_tiles]

    out_ref[...] = jnp.zeros_like(out_ref)

    def chunk_dmas(slot, k):
        return [
            pltpu.make_async_copy(mats_hbm.at[k], m_scratch.at[slot],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(
                # Clamp: prefetch preamble probes k past the last chunk
                # (execution is pl.when-guarded; concrete starts are
                # statically bounds-checked).
                values_hbm.at[:, pl.ds(jnp.minimum(
                    k, geom.num_chunks - 1) * geom.chunk, geom.chunk)],
                v_scratch.at[slot], sems.at[slot, 1]),
        ]

    for j in range(NBUF - 1):
        @pl.when(j < used)
        def _(j=j):
            # Static preamble index: clamp so tiny plans
            # (num_chunks < NBUF-1) pass Mosaic's static bounds check;
            # execution is pl.when-guarded either way.
            for dma in chunk_dmas(j, min(j, geom.num_chunks - 1)):
                dma.start()

    def body(k, _):
        slot = jax.lax.rem(k, jnp.asarray(NBUF, k.dtype))

        @pl.when(k + NBUF - 1 < used)
        def _():
            nslot = jax.lax.rem(k + NBUF - 1, jnp.asarray(NBUF, k.dtype))
            for dma in chunk_dmas(nslot, k + NBUF - 1):
                dma.start()

        for dma in chunk_dmas(slot, k):
            dma.wait()
        tids = [ct_refs[d][k] for d in range(rank)]
        mats_t = _mats_slices(m_scratch, slot, geom)
        accumulate_spread_at(out_ref, tids, mats_t, v_scratch[slot],
                             geom, batch2, 0)
        return 0

    jax.lax.fori_loop(0, used, body, 0)


def _spread_kernel_resident(*refs, geom: TileGeometry, beta, c,
                            half_width, batch2, horner=None):
    """Single-program spread: the whole tile array stays in VMEM.

    One global chunk stream with deep prefetch — no per-tile program
    restarts, no pipeline stalls at tile boundaries. Chunk k's
    contribution lands at dynamic tile index (ct0[k], ct1[k], ...).
    The combined coords+values payload means ONE DMA per chunk.
    Used when the tile array fits the VMEM budget (the per-tile grid
    kernel ``_spread_kernel`` covers larger problems).
    """
    rank = geom.rank
    bounds_ref = refs[0]
    ct_refs = refs[1:1 + rank]
    payload_hbm, out_ref, d_scratch, sems = refs[1 + rank:]
    used = bounds_ref[geom.num_tiles]

    out_ref[...] = jnp.zeros_like(out_ref)

    def chunk_dma(slot, k):
        return pltpu.make_async_copy(
            # Clamp: prefetch preamble probes k past the last chunk
            # (execution is pl.when-guarded; concrete starts are
            # statically bounds-checked).
            payload_hbm.at[:, pl.ds(jnp.minimum(
                k, geom.num_chunks - 1) * geom.chunk, geom.chunk)],
            d_scratch.at[slot], sems.at[slot])

    for j in range(NBUF - 1):
        @pl.when(j < used)
        def _(j=j):
            chunk_dma(j, j).start()

    def body(k, _):
        slot = jax.lax.rem(k, jnp.asarray(NBUF, k.dtype))

        @pl.when(k + NBUF - 1 < used)
        def _():
            nslot = jax.lax.rem(k + NBUF - 1, jnp.asarray(NBUF, k.dtype))
            chunk_dma(nslot, k + NBUF - 1).start()

        chunk_dma(slot, k).wait()
        tids = [ct_refs[d][k] for d in range(rank)]
        origins = [
            (tids[d] * geom.tile[d] - geom.pad).astype(jnp.float32)
            for d in range(rank)]
        data = d_scratch[slot]
        mats = kernel_matrices_from(data, origins, geom,
                                    beta, c, half_width, horner)
        accumulate_spread_at(out_ref, tids, mats, data,
                             geom, batch2, 2 * rank)
        return 0

    jax.lax.fori_loop(0, used, body, 0)


def _spread_kernel(bounds_ref, payload_hbm, tile_ref,
                   d_scratch, sems, *scratch_rest,
                   geom: TileGeometry, beta, c, half_width, batch2,
                   horner=None):
    """Per-tile-grid spread streaming the combined coords+values
    payload: ONE [R8, chunk] DMA per chunk (rows 0..2rank-1 are the
    coordinate hi/lo words, the rest the channel strengths)."""
    rank = geom.rank
    mref = scratch_rest[0] if scratch_rest else None
    t = _linear_tile_id(geom)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    origins = _tile_origins(geom)

    tile_ref[...] = jnp.zeros_like(tile_ref)

    def chunk_dma(slot, k):
        return pltpu.make_async_copy(
            # Clamp: prefetch preamble probes k past the last chunk
            # (execution is pl.when-guarded; concrete starts are
            # statically bounds-checked).
            payload_hbm.at[:, pl.ds(jnp.minimum(
                k, geom.num_chunks - 1) * geom.chunk, geom.chunk)],
            d_scratch.at[slot], sems.at[slot])

    for j in range(NBUF - 1):
        @pl.when(start + j < end)
        def _(j=j):
            chunk_dma(j, start + j).start()

    def body(k, _):
        d = k - start
        slot = jax.lax.rem(d, jnp.asarray(NBUF, d.dtype))

        @pl.when(k + NBUF - 1 < end)
        def _():
            nslot = jax.lax.rem(d + NBUF - 1, jnp.asarray(NBUF, d.dtype))
            chunk_dma(nslot, k + NBUF - 1).start()

        chunk_dma(slot, k).wait()
        data = d_scratch[slot]
        mats = kernel_matrices_from(data, origins, geom,
                                    beta, c, half_width, horner)
        if mref is not None:
            accumulate_spread_subchunk(tile_ref, mats, d_scratch, slot,
                                       geom, batch2, mref,
                                       rank_offset=2 * rank)
        else:
            accumulate_spread(tile_ref, mats, data, geom,
                              batch2, 2 * rank)
        return 0

    jax.lax.fori_loop(start, end, body, 0)


def _spread_kernel_banded(bounds_ref, zorig_ref, payload_hbm, tile_ref,
                          d_scratch, sems, mref,
                          *, geom: TileGeometry, beta, c, half_width,
                          batch2, band, horner=None):
    """Per-tile-grid rank-3 spread with axis-0 banding, combined
    payload (see accumulate_spread_banded)."""
    t = _linear_tile_id(geom)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    origins = _tile_origins(geom)

    tile_ref[...] = jnp.zeros_like(tile_ref)

    def chunk_dma(slot, k):
        return pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(jnp.minimum(
                k, geom.num_chunks - 1) * geom.chunk, geom.chunk)],
            d_scratch.at[slot], sems.at[slot])

    for j in range(NBUF - 1):
        @pl.when(start + j < end)
        def _(j=j):
            chunk_dma(j, start + j).start()

    def body(k, _):
        d = k - start
        slot = jax.lax.rem(d, jnp.asarray(NBUF, d.dtype))

        @pl.when(k + NBUF - 1 < end)
        def _():
            nslot = jax.lax.rem(d + NBUF - 1, jnp.asarray(NBUF, d.dtype))
            chunk_dma(nslot, k + NBUF - 1).start()

        chunk_dma(slot, k).wait()
        accumulate_spread_banded(
            tile_ref, zorig_ref, k, d_scratch, d_scratch, slot, mref,
            origins, geom, batch2, band, beta, c, half_width,
            rank_offset=2 * geom.rank, horner=horner)
        return 0

    jax.lax.fori_loop(start, end, body, 0)


def _spread_kernel_split_banded(bounds_ref, zorig_ref, coords_hbm,
                                values_hbm, tile_ref, c_scratch,
                                v_scratch, sems, mref,
                                *, geom: TileGeometry, beta, c,
                                half_width, batch2, band, horner=None):
    """_spread_kernel_banded with split coords/values payloads."""
    t = _linear_tile_id(geom)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    origins = _tile_origins(geom)

    tile_ref[...] = jnp.zeros_like(tile_ref)

    def chunk_dmas(slot, k):
        return (
            pltpu.make_async_copy(coords_hbm.at[k], c_scratch.at[slot],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(
                values_hbm.at[:, pl.ds(jnp.minimum(
                    k, geom.num_chunks - 1) * geom.chunk, geom.chunk)],
                v_scratch.at[slot], sems.at[slot, 1]),
        )

    for j in range(NBUF - 1):
        @pl.when(start + j < end)
        def _(j=j):
            for dma in chunk_dmas(j, start + j):
                dma.start()

    def body(k, _):
        d = k - start
        slot = jax.lax.rem(d, jnp.asarray(NBUF, d.dtype))

        @pl.when(k + NBUF - 1 < end)
        def _():
            nslot = jax.lax.rem(d + NBUF - 1, jnp.asarray(NBUF, d.dtype))
            for dma in chunk_dmas(nslot, k + NBUF - 1):
                dma.start()

        for dma in chunk_dmas(slot, k):
            dma.wait()
        accumulate_spread_banded(
            tile_ref, zorig_ref, k, c_scratch, v_scratch, slot, mref,
            origins, geom, batch2, band, beta, c, half_width,
            rank_offset=0, horner=horner)
        return 0

    jax.lax.fori_loop(start, end, body, 0)


def _spread_kernel_split_banded_dfta(bounds_ref, zorig_ref, coords_hbm,
                                     values_hbm, cw_ref, smcw_ref,
                                     spcw_ref, out_ref, c_scratch,
                                     v_scratch, sems, mref, tile_scr,
                                     *, geom: TileGeometry, beta, c,
                                     half_width, batch2, band, n2,
                                     horner=None):
    """_spread_kernel_split_banded with the axis-2 mode-DFT pass fused
    as an epilogue: the accumulated tile block is contracted with the
    wrap-aware [nt2, E2, n2] twiddles (kernels/pallas_dft.py pass A)
    and accumulated into a [*tiles2, B2, E0, E1, n2] output revisited
    across the innermost (t2) grid dim — the full extended tile array
    never round-trips HBM (241 MB write + read at 3D 128^3/800k)."""
    t = _linear_tile_id(geom)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    origins = _tile_origins(geom)
    e0, e1, e2 = geom.ext

    tile_scr[...] = jnp.zeros_like(tile_scr)

    def chunk_dmas(slot, k):
        return (
            pltpu.make_async_copy(coords_hbm.at[k], c_scratch.at[slot],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(
                values_hbm.at[:, pl.ds(jnp.minimum(
                    k, geom.num_chunks - 1) * geom.chunk, geom.chunk)],
                v_scratch.at[slot], sems.at[slot, 1]),
        )

    for j in range(NBUF - 1):
        @pl.when(start + j < end)
        def _(j=j):
            for dma in chunk_dmas(j, start + j):
                dma.start()

    def body(k, _):
        d = k - start
        slot = jax.lax.rem(d, jnp.asarray(NBUF, d.dtype))

        @pl.when(k + NBUF - 1 < end)
        def _():
            nslot = jax.lax.rem(d + NBUF - 1, jnp.asarray(NBUF, d.dtype))
            for dma in chunk_dmas(nslot, k + NBUF - 1):
                dma.start()

        for dma in chunk_dmas(slot, k):
            dma.wait()
        accumulate_spread_banded(
            tile_scr, zorig_ref, k, c_scratch, v_scratch, slot, mref,
            origins, geom, batch2, band, beta, c, half_width,
            rank_offset=0, horner=horner)
        return 0

    jax.lax.fori_loop(start, end, body, 0)

    # Epilogue: contract E2 -> n2 with this tile's twiddle slice and
    # accumulate over the t2 grid dim (Gauss 3-mult complex rotation;
    # see pallas_dft._pass_a_kernel).
    t2 = pl.program_id(2)
    cw = cw_ref[t2]
    smcw = smcw_ref[t2]
    spcw = spcw_ref[t2]
    dn = (((1,), (0,)), ((), ()))
    for b in range(batch2 // 2):
        xr = tile_scr[0, 0, 0, 2 * b].reshape(e0 * e1, e2)
        xi = tile_scr[0, 0, 0, 2 * b + 1].reshape(e0 * e1, e2)

        def dot(a, m):
            return jax.lax.dot_general(
                a, m, dn, preferred_element_type=jnp.float32,
                precision=_MXU_PRECISION)

        t1_ = dot(xr + xi, cw)
        t2_ = dot(xr, smcw)
        t3_ = dot(xi, spcw)
        yr = (t1_ - t3_).reshape(e0, e1, n2)
        yi = (t1_ + t2_).reshape(e0, e1, n2)

        @pl.when(t2 == 0)
        def _(b=b, yr=yr, yi=yi):
            out_ref[0, 0, 2 * b] = yr
            out_ref[0, 0, 2 * b + 1] = yi

        @pl.when(t2 != 0)
        def _(b=b, yr=yr, yi=yi):
            out_ref[0, 0, 2 * b] += yr
            out_ref[0, 0, 2 * b + 1] += yi


def fused_dfta_fits(geom: TileGeometry, batch2: int, n2: int,
                    band: int) -> bool:
    """Whether the banded spread kernel can carry the fused axis-2 DFT
    epilogue for this channel count: the tile block moves to scratch
    and a [batch2, E0, E1, n2] accumulator block joins it in VMEM."""
    if geom.rank != 3 or batch2 % 2:
        return False
    lanes = -(-n2 // 128) * 128
    e_lanes = -(-geom.ext[2] // 128) * 128
    tile_scr = 4 * batch2 * geom.ext[0] * geom.ext[1] * e_lanes
    out_blk = 4 * batch2 * geom.ext[0] * geom.ext[1] * lanes
    w = 3 * 4 * geom.tiles[2] * geom.ext[2] * lanes
    payload = 4 * NBUF * (8 + 8) * geom.chunk
    stage = 4 * sum(geom.ext[1:]) * geom.chunk
    # Epilogue dot temporaries: [E0*E1, n2] pairs per channel stack.
    epi = 4 * batch2 * geom.ext[0] * geom.ext[1] * lanes
    stack = max(_stack_bytes_streaming(geom, batch2, band=band), epi)
    return (tile_scr + 2 * out_blk + w + payload + stage
            + stack) <= VMEM_RESIDENT_BUDGET


def _spread_kernel_resident_split(*refs, geom: TileGeometry, beta, c,
                                  half_width, batch2, horner=None):
    """_spread_kernel_resident with split coords/values payloads (two
    DMAs per chunk). Used for channel groups too wide for the combined
    payload's single 8-sublane block, where the hoistable coords gather
    outweighs the extra DMA issue."""
    rank = geom.rank
    bounds_ref = refs[0]
    ct_refs = refs[1:1 + rank]
    coords_hbm, values_hbm, out_ref, c_scratch, v_scratch, sems = \
        refs[1 + rank:]
    used = bounds_ref[geom.num_tiles]

    out_ref[...] = jnp.zeros_like(out_ref)

    def chunk_dmas(slot, k):
        return (
            pltpu.make_async_copy(coords_hbm.at[k], c_scratch.at[slot],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(
                values_hbm.at[:, pl.ds(jnp.minimum(
                    k, geom.num_chunks - 1) * geom.chunk, geom.chunk)],
                v_scratch.at[slot], sems.at[slot, 1]),
        )

    for j in range(NBUF - 1):
        @pl.when(j < used)
        def _(j=j):
            # Static preamble index: clamp so tiny plans
            # (num_chunks < NBUF-1) pass Mosaic's static bounds check;
            # execution is pl.when-guarded either way.
            for dma in chunk_dmas(j, min(j, geom.num_chunks - 1)):
                dma.start()

    def body(k, _):
        slot = jax.lax.rem(k, jnp.asarray(NBUF, k.dtype))

        @pl.when(k + NBUF - 1 < used)
        def _():
            nslot = jax.lax.rem(k + NBUF - 1, jnp.asarray(NBUF, k.dtype))
            for dma in chunk_dmas(nslot, k + NBUF - 1):
                dma.start()

        for dma in chunk_dmas(slot, k):
            dma.wait()
        tids = [ct_refs[d][k] for d in range(rank)]
        origins = [
            (tids[d] * geom.tile[d] - geom.pad).astype(jnp.float32)
            for d in range(rank)]
        mats = kernel_matrices_from(c_scratch[slot], origins, geom,
                                    beta, c, half_width, horner)
        accumulate_spread_at(out_ref, tids, mats, v_scratch[slot],
                             geom, batch2, 0)
        return 0

    jax.lax.fori_loop(0, used, body, 0)


def _spread_kernel_split(bounds_ref, coords_hbm, values_hbm, tile_ref,
                         c_scratch, v_scratch, sems, *scratch_rest,
                         geom: TileGeometry, beta, c, half_width,
                         batch2, horner=None):
    """_spread_kernel with split coords/values payloads (two DMAs per
    chunk); see _spread_kernel_resident_split for when this wins."""
    mref = scratch_rest[0] if scratch_rest else None
    t = _linear_tile_id(geom)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    origins = _tile_origins(geom)

    tile_ref[...] = jnp.zeros_like(tile_ref)

    def chunk_dmas(slot, k):
        return (
            pltpu.make_async_copy(coords_hbm.at[k], c_scratch.at[slot],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(
                values_hbm.at[:, pl.ds(jnp.minimum(
                    k, geom.num_chunks - 1) * geom.chunk, geom.chunk)],
                v_scratch.at[slot], sems.at[slot, 1]),
        )

    for j in range(NBUF - 1):
        @pl.when(start + j < end)
        def _(j=j):
            for dma in chunk_dmas(j, start + j):
                dma.start()

    def body(k, _):
        d = k - start
        slot = jax.lax.rem(d, jnp.asarray(NBUF, d.dtype))

        @pl.when(k + NBUF - 1 < end)
        def _():
            nslot = jax.lax.rem(d + NBUF - 1, jnp.asarray(NBUF, d.dtype))
            for dma in chunk_dmas(nslot, k + NBUF - 1):
                dma.start()

        for dma in chunk_dmas(slot, k):
            dma.wait()
        mats = kernel_matrices_from(c_scratch[slot], origins, geom,
                                    beta, c, half_width, horner)
        if mref is not None:
            accumulate_spread_subchunk(tile_ref, mats, v_scratch, slot,
                                       geom, batch2, mref)
        else:
            accumulate_spread(tile_ref, mats, v_scratch[slot], geom,
                              batch2, 0)
        return 0

    jax.lax.fori_loop(start, end, body, 0)


def _spread_kernel_mats(*refs, geom: TileGeometry, batch2):
    """Per-tile-grid spread streaming precomputed kernel matrices.

    ``_spread_kernel`` with the in-kernel VPU polynomial evaluation
    replaced by a per-chunk concatenated [sum(E_d), C] matrix DMA —
    the planned path hoists the evaluation into
    build_kernel_matrix_payload, turning this kernel into a pure
    DMA + MXU stream (the eval costs ~2 us/chunk and dominates the 3D
    kernel at thousands of chunks)."""
    rank = geom.rank
    bounds_ref = refs[0]
    mats_hbm = refs[1]
    values_hbm = refs[2]
    tile_ref = refs[3]
    m_scratch = refs[4]
    v_scratch = refs[5]
    sems = refs[6]
    t = _linear_tile_id(geom)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]

    tile_ref[...] = jnp.zeros_like(tile_ref)

    def chunk_dmas(slot, k):
        return [
            pltpu.make_async_copy(mats_hbm.at[k], m_scratch.at[slot],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(
                # Clamp: prefetch preamble probes k past the last chunk
                # (execution is pl.when-guarded).
                values_hbm.at[:, pl.ds(jnp.minimum(
                    k, geom.num_chunks - 1) * geom.chunk, geom.chunk)],
                v_scratch.at[slot], sems.at[slot, 1]),
        ]

    for j in range(NBUF - 1):
        @pl.when(start + j < end)
        def _(j=j):
            for dma in chunk_dmas(j, start + j):
                dma.start()

    def body(k, _):
        d = k - start
        slot = jax.lax.rem(d, jnp.asarray(NBUF, d.dtype))

        @pl.when(k + NBUF - 1 < end)
        def _():
            nslot = jax.lax.rem(d + NBUF - 1, jnp.asarray(NBUF, d.dtype))
            for dma in chunk_dmas(nslot, k + NBUF - 1):
                dma.start()

        for dma in chunk_dmas(slot, k):
            dma.wait()
        if rank == 3:
            accumulate_spread_subchunk_refs(tile_ref, m_scratch, slot,
                                            v_scratch, geom, batch2)
        else:
            mats_t = _mats_slices(m_scratch, slot, geom)
            accumulate_spread(tile_ref, mats_t, v_scratch[slot], geom,
                              batch2, 0)
        return 0

    jax.lax.fori_loop(start, end, body, 0)


def spread_pallas_tiles(strengths_cm: jax.Array, points_resc,
                        plan: NufftPlan, binned=None, mats=None,
                        coords=None, values_slots=None, geom=None,
                        out_vma=None, band_info=None, dft_a=None):
    """[B2, M] channel-major real strengths + rescaled points (or
    (hi, lo) pair) -> ([*tiles, B2, *ext] extended tile blocks, geom).

    Channel-major input (the natural planar fold layout) lets all
    channels move in one batched minor-axis gather when the values
    payload is built (see binning.build_values_payload).
    ``binned``/``mats`` (from a planned transform) skip the points-side
    preprocessing and the in-kernel polynomial evaluation.

    ``values_slots`` ([B2, NC*chunk] slot-order values, from a
    chunk-order planned interp) replaces ``strengths_cm`` entirely and
    skips the point-order permutation gather — the fused normal-operator
    path. Padded slots must be zero (the chunk-order interp guarantees
    this).

    ``band_info`` = (band, zorigins) from binning.compute_band_origins
    (rank 3, planned, z-ordered binning): routes to the axis-0-banded
    kernels, which cut the MXU-bound fold by ~E0/band.

    ``dft_a`` = (c, s-c, s+c, n2) axis-2 mode-DFT twiddles (each
    [nt2, E2, n2] float32; see pallas_dft._twiddle_statics): fuses the
    DFT's axis-2 pass into the banded kernel epilogue and returns
    [nt0, nt1, B2, E0, E1, n2] instead of tile blocks. Callers must
    gate on ``fused_dfta_fits`` and an active band.
    """
    m = num_points_of(points_resc)
    batch2 = (strengths_cm if values_slots is None
              else values_slots).shape[0]
    if geom is None:
        # Planned callers MUST pass the geometry their binned/mats
        # payloads were built against: choose_geometry reads mutable
        # global overrides, so recomputing here could silently disagree
        # with a payload captured at plan time.
        geom = choose_geometry(plan.fine_shape, plan.width, m)
    rank = geom.rank
    if binned is None:
        binned = bin_points(points_resc, geom)
    if band_info is not None and (
            rank != 3 or mats is not None
            or band_info[0] >= geom.ext[0]):
        band_info = None          # degenerate band: unbanded kernels
    if dft_a is not None and band_info is None:
        raise ValueError("dft_a fusion requires an active band "
                         "(rank-3 planned, non-degenerate)")
    group = streaming_group_size(
        geom, band_info[0] if band_info else None)
    if mats is not None:
        # Prefer the resident single-program kernel where it does not
        # cost extra passes over the (large) mats payload: at wide
        # channel counts the streaming kernel's bigger groups re-DMA
        # the payload fewer times, which the round-3 batch-16 sweep
        # showed dominating the resident kernel's pipelining edge
        # (BENCH_NOTES 'multicoil mats re-streaming: measured').
        gr = resident_group_size(geom)
        mats_group = (gr if gr and (group == 0 or -(-batch2 // gr)
                                    <= -(-batch2 // group))
                      else group)
        if _prefer_wide_coords(batch2, group, mats_group):
            # Wide-channel coords streaming (see WIDE_COORDS_STREAMING):
            # drop to the split coords/values kernels with in-kernel
            # evaluation — each group then re-streams 8 coordinate rows
            # per chunk instead of the sum(ext)-row kernel matrices
            # (the coords payload is built below if the caller's plan
            # did not carry one).
            mats = None
        else:
            group = mats_group
    if group == 0:
        raise ValueError(
            f"Pallas spread: no channel group fits the VMEM budget for "
            f"geometry tile={geom.tile} ext={geom.ext} "
            f"chunk={geom.chunk}; use backend='xla'.")
    if dft_a is not None:
        # The fused epilogue adds the [g, E0, E1, n2] accumulator block
        # to the kernel's VMEM footprint; shrink the channel group
        # until it fits (callers pre-gate with fused_dfta_fits at g=2).
        while group >= 2 and not fused_dfta_fits(
                geom, min(group, batch2), dft_a[3], band_info[0]):
            group -= 2
        if group < 2:
            raise ValueError("dft_a fusion does not fit the VMEM "
                             "budget; call without dft_a")
    # Combined single-DMA payload whenever every group fits one
    # 8-sublane block (any single complex transform, ranks 1-3); wider
    # channel groups keep the split layout, whose static coords payload
    # is shared across groups. Slot-order values arrive pre-permuted,
    # so there is no point-order source to build a combined payload
    # from — they always ride the split/mats kernels.
    # dft_a rides the split banded kernel only (the combined-payload
    # banded kernel has no fused epilogue; coords are prebuilt on the
    # planned path anyway, so split costs one extra per-chunk DMA).
    combined = (mats is None and values_slots is None and dft_a is None
                and combined_fits(rank, min(batch2, group)))
    coords_pl = coords
    if mats is None and not combined and coords_pl is None:
        coords_pl = build_coords_payload(binned, geom)

    if batch2 > group:
        groups = []
        for i in range(0, batch2, group):
            g_tiles, _ = _spread_group(
                None if strengths_cm is None
                else strengths_cm[i:i + group],
                binned, coords_pl, geom, plan, mats, combined,
                None if values_slots is None
                else values_slots[i:i + group], out_vma, band_info,
                dft_a)
            groups.append(g_tiles)
        # Fused output carries channels at axis 2 ([nt0, nt1, B2, ...]);
        # tile blocks at axis `rank`.
        cat_axis = 2 if dft_a is not None else rank
        return jnp.concatenate(groups, axis=cat_axis), geom
    tiles, _ = _spread_group(strengths_cm, binned, coords_pl, geom,
                             plan, mats, combined, values_slots,
                             out_vma, band_info, dft_a)
    return tiles, geom


def _spread_group(strengths_cm, binned, coords_pl, geom: TileGeometry,
                  plan: NufftPlan, mats=None, combined=False,
                  values_slots=None, out_vma=None, band_info=None,
                  dft_a=None):
    batch2 = (strengths_cm if values_slots is None
              else values_slots).shape[0]
    rank = geom.rank
    common = dict(
        geom=geom, beta=np.float32(plan.beta), c=np.float32(plan.c),
        half_width=np.float32(plan.half_width), batch2=batch2,
        horner=horner_static(plan))
    # out_vma: varying-manual-axes for pallas_call outputs inside
    # shard_map (check_vma requires it on ShapeDtypeStruct).
    out_shape = jax.ShapeDtypeStruct(
        geom.tiles + (batch2,) + geom.ext, jnp.float32, vma=out_vma)

    # Planned path: precomputed kernel matrices (pure DMA + MXU kernel).
    # Not the default because XLA does not hoist the ~100 MB matrix
    # build out of user iteration loops; the planned API computes it
    # eagerly once (see planar.PlannedNufft).
    if mats is not None:
        values_pl = (build_values_payload(strengths_cm, binned, geom)
                     if values_slots is None
                     else pack_values_slots(values_slots))
        mats_scratch = [
            pltpu.VMEM((NBUF, mats.shape[1], geom.chunk), jnp.float32),
            pltpu.VMEM((NBUF, values_pl.shape[0], geom.chunk),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
        ]
        if resident_fits(geom, batch2):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1 + rank,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=mats_scratch,
            )
            tiles = pl.pallas_call(
                functools.partial(_spread_kernel_resident_mats,
                                  geom=geom, batch2=batch2),
                grid_spec=grid_spec,
                out_shape=out_shape,
                interpret=use_interpret(),
            )(binned.tile_bounds, *binned.chunk_tidx, mats, values_pl)
            return tiles, geom
        # Tile array too big for residence: per-tile grid kernel
        # streaming the precomputed matrices (the planned 3D path).
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,               # tile chunk bounds
            grid=geom.tiles,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=pl.BlockSpec(
                (1,) * rank + (batch2,) + geom.ext,
                lambda *ids: tuple(ids[:len(geom.tiles)])
                + (0,) * (rank + 1),
                memory_space=pltpu.VMEM),
            scratch_shapes=mats_scratch,
        )
        tiles = pl.pallas_call(
            functools.partial(_spread_kernel_mats, geom=geom,
                              batch2=batch2),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=use_interpret(),
        )(binned.tile_bounds, mats, values_pl)
        return tiles, geom

    if combined:
        payload = build_combined_payload(strengths_cm, binned,
                                                 geom)
        payload_scratch = [
            pltpu.VMEM((NBUF, payload.shape[0], geom.chunk),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ]
        if band_info is not None:
            band, zorigins = band_info
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,       # bounds + band origins
                grid=geom.tiles,
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(
                    (1,) * rank + (batch2,) + geom.ext,
                    lambda *ids: tuple(ids[:len(geom.tiles)])
                    + (0,) * (rank + 1),
                    memory_space=pltpu.VMEM),
                scratch_shapes=payload_scratch + [
                    pltpu.VMEM((sum(geom.ext[1:]), geom.chunk),
                               jnp.float32)],
            )
            tiles = pl.pallas_call(
                functools.partial(_spread_kernel_banded, band=band,
                                  **common),
                grid_spec=grid_spec,
                out_shape=out_shape,
                interpret=use_interpret(),
            )(binned.tile_bounds, zorigins, payload)
            return tiles, geom
        if resident_fits(geom, batch2):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1 + rank,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=payload_scratch,
            )
            tiles = pl.pallas_call(
                functools.partial(_spread_kernel_resident, **common),
                grid_spec=grid_spec,
                out_shape=out_shape,
                interpret=use_interpret(),
            )(binned.tile_bounds, *binned.chunk_tidx, payload)
            return tiles, geom
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,               # tile chunk bounds
            grid=geom.tiles,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1,) * rank + (batch2,) + geom.ext,
                lambda *ids: tuple(ids[:len(geom.tiles)])
                + (0,) * (rank + 1),
                memory_space=pltpu.VMEM),
            scratch_shapes=payload_scratch + (
                # Rank-3 sub-chunk fold: kernel-matrix staging ref.
                [pltpu.VMEM((sum(geom.ext), geom.chunk), jnp.float32)]
                if rank == 3 else []),
        )
        tiles = pl.pallas_call(
            functools.partial(_spread_kernel, **common),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=use_interpret(),
        )(binned.tile_bounds, payload)
        return tiles, geom

    values_pl = (build_values_payload(strengths_cm, binned, geom)
                 if values_slots is None
                 else pack_values_slots(values_slots))
    payload_scratch = [
        pltpu.VMEM((NBUF,) + coords_pl.shape[1:], jnp.float32),
        pltpu.VMEM((NBUF, values_pl.shape[0], geom.chunk), jnp.float32),
        pltpu.SemaphoreType.DMA((NBUF, 2)),
    ]

    if band_info is not None and dft_a is not None:
        band, zorigins = band_info
        cw, smcw, spcw, n2 = dft_a
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,           # bounds + band origins
            grid=geom.tiles,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (1, 1, batch2, geom.ext[0], geom.ext[1], n2),
                # *ids absorbs the scalar-prefetch refs appended to
                # index_map calls; the t2 grid id (ids[2]) is dropped —
                # the block is revisited and accumulated across t2.
                lambda *ids: (ids[0], ids[1], 0, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=payload_scratch + [
                pltpu.VMEM((sum(geom.ext[1:]), geom.chunk),
                           jnp.float32),
                pltpu.VMEM((1, 1, 1, batch2) + geom.ext,
                           jnp.float32)],
        )
        fused = pl.pallas_call(
            functools.partial(_spread_kernel_split_banded_dfta,
                              band=band, n2=n2, **common),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (geom.tiles[0], geom.tiles[1], batch2,
                 geom.ext[0], geom.ext[1], n2), jnp.float32,
                vma=out_vma),
            interpret=use_interpret(),
        )(binned.tile_bounds, zorigins, coords_pl, values_pl,
          jnp.asarray(cw), jnp.asarray(smcw), jnp.asarray(spcw))
        return fused, geom

    if band_info is not None:
        band, zorigins = band_info
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,           # bounds + band origins
            grid=geom.tiles,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1,) * rank + (batch2,) + geom.ext,
                lambda *ids: tuple(ids[:len(geom.tiles)])
                + (0,) * (rank + 1),
                memory_space=pltpu.VMEM),
            scratch_shapes=payload_scratch + [
                pltpu.VMEM((sum(geom.ext[1:]), geom.chunk),
                           jnp.float32)],
        )
        tiles = pl.pallas_call(
            functools.partial(_spread_kernel_split_banded, band=band,
                              **common),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=use_interpret(),
        )(binned.tile_bounds, zorigins, coords_pl, values_pl)
        return tiles, geom

    if resident_fits(geom, batch2):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1 + rank,    # bounds + per-axis tile ids
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=payload_scratch,
        )
        tiles = pl.pallas_call(
            functools.partial(_spread_kernel_resident_split, **common),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=use_interpret(),
        )(binned.tile_bounds, *binned.chunk_tidx, coords_pl, values_pl)
        return tiles, geom

    kernel = functools.partial(_spread_kernel_split, **common)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                   # tile chunk bounds
        grid=geom.tiles,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1,) * rank + (batch2,) + geom.ext,
            lambda *ids: tuple(ids[:len(geom.tiles)]) + (0,) * (rank + 1),
            memory_space=pltpu.VMEM),
        scratch_shapes=payload_scratch + (
            # Rank-3 sub-chunk fold: kernel-matrix staging ref.
            [pltpu.VMEM((sum(geom.ext), geom.chunk), jnp.float32)]
            if rank == 3 else []),
    )
    tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=use_interpret(),
    )(binned.tile_bounds, coords_pl, values_pl)
    return tiles, geom


def spread_pallas(strengths: jax.Array, points_resc,
                  plan: NufftPlan) -> jax.Array:
    """[B2, M] real strengths + [M, rank] rescaled points (or (hi, lo)
    pair) -> [B2, *fine_shape] fine grid."""
    tiles, geom = spread_pallas_tiles(
        strengths.astype(jnp.float32), points_resc, plan)
    return overlap_add(tiles, geom).astype(strengths.dtype)

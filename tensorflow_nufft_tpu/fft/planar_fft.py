"""Planar (split re/im) DFT via MXU matmuls.

The live TPU path cannot use XLA's FFT (complex dtypes are not supported
by the backend), and complex arithmetic is in any case emulated pairwise
on TPU. This module computes the DFT of planar tensors — real arrays with
a trailing re/im channel — as dense matmuls against precomputed
cosine/sine twiddle matrices, which map straight onto the MXU.

For the fine-grid sizes this framework targets (hundreds per axis), a
dense per-axis DFT is O(N) matmul work per element and runs at MXU rate;
precision is forced to HIGHEST (f32 accumulation) because the TPU default
would use bf16 multiplies (~2e-3 error, far above tolerance).

Replaces the FFTW/cuFFT stage of the reference
(cc/kernels/nufft_plan.cc:364-430; fftw_api.h).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _twiddles(n: int) -> tuple:
    """(C, S) with C[l,k] = cos(2 pi l k / n), S likewise sin; float64."""
    lk = np.outer(np.arange(n), np.arange(n))
    ang = (2.0 * np.pi / n) * lk
    return np.cos(ang), np.sin(ang)


def _mode_twiddles(nf: int, n: int, sign: float, weights: np.ndarray,
                   truncating: bool) -> tuple:
    """Pruned, weighted DFT matrices fusing the deconvolve/amplify stage.

    Mode i (CMCL order, k = i - n//2) lives at fine-grid slot k mod nf.
    For the type-1 direction (truncating=True) returns (C, S) of shape
    [nf, n] with C[l, i] = w[i] cos(2 pi l slot_i / nf) and
    S[l, i] = sign * w[i] sin(...); for type-2 (truncating=False) the
    transposed [n, nf] layout. Contracting with these computes
    DFT + mode truncation/zero-padding + kernel deconvolution in one
    matmul (the reference does these as separate passes,
    cc/kernels/nufft_plan.cc:705-881).
    """
    k = np.arange(n) - n // 2
    slots = np.mod(k, nf)
    ang = (2.0 * np.pi / nf) * np.outer(np.arange(nf), slots)  # [nf, n]
    c = np.cos(ang) * weights[None, :]
    s = sign * np.sin(ang) * weights[None, :]
    if truncating:
        return c, s
    return c.T.copy(), s.T.copy()


def _contract_planar(xr, xi, c, s, axis, precision):
    """(xr + i xi) contracted along `axis` with (c + i s); returns planar
    pair with the transformed axis restored in place."""
    ar = jnp.tensordot(xr, c, axes=[[axis], [0]], precision=precision)
    br = jnp.tensordot(xr, s, axes=[[axis], [0]], precision=precision)
    ai = jnp.tensordot(xi, c, axes=[[axis], [0]], precision=precision)
    bi = jnp.tensordot(xi, s, axes=[[axis], [0]], precision=precision)
    yr = jnp.moveaxis(ar - bi, -1, axis)
    yi = jnp.moveaxis(ai + br, -1, axis)
    return yr, yi


def dft_truncate_deconvolve(x: jax.Array, plan,
                            precision=jax.lax.Precision.HIGHEST
                            ) -> jax.Array:
    """Type-1 post-stage: [B, *fine, 2] -> [B, *grid, 2] modes (CMCL),
    computing DFT + truncation + deconvolution as one pruned matmul per
    axis."""
    sign = -1.0 if plan.spec.fft_direction == "forward" else 1.0
    xr, xi = x[..., 0], x[..., 1]
    for d in range(plan.rank):
        c_np, s_np = _mode_twiddles(
            plan.fine_shape[d], plan.grid_shape[d], sign,
            plan.deconv_weights(d), truncating=True)
        c = jnp.asarray(c_np, x.dtype)
        s = jnp.asarray(s_np, x.dtype)
        xr, xi = _contract_planar(xr, xi, c, s, 1 + d, precision)
    return jnp.stack([xr, xi], axis=-1)


def _ext_mode_twiddles(nf: int, n: int, num_tiles: int, tile: int,
                       pad: int, sign: float, weights: np.ndarray,
                       truncating: bool) -> tuple:
    """Like _mode_twiddles but over the *tile-extended* axis layout.

    Row (ti, e) of the extended axis corresponds to global fine index
    g = (ti*tile + e - pad) mod nf. Contracting tile-extended data with
    these matrices computes overlap-add (duplicate g rows sum) + DFT +
    truncation + deconvolution in a single matmul, so the per-tile halo
    merge never materializes in memory.
    """
    k = np.arange(n) - n // 2
    slots = np.mod(k, nf)
    ti = np.repeat(np.arange(num_tiles), tile + 2 * pad)
    e = np.tile(np.arange(tile + 2 * pad), num_tiles)
    g = np.mod(ti * tile + e - pad, nf)                  # [nt*E]
    ang = (2.0 * np.pi / nf) * np.outer(g, slots)        # [nt*E, n]
    c = np.cos(ang) * weights[None, :]
    s = sign * np.sin(ang) * weights[None, :]
    if truncating:
        return c, s
    return c.T.copy(), s.T.copy()


# Above this extended-row duplication factor (prod(nt*E) / prod(nf))
# the fused overlap-add contraction loses to explicit overlap-add +
# plain per-axis matmuls: the extended matrices do duplicated work AND
# their irregular row structure is pathological for the TPU compiler at
# 3D scale (measured on v5e: fused 3D t1 contraction 529 ms steady with
# a ~20 min compile; unfused 25 ms with a 2 s compile. The fused t2
# expansion direction is worse still — 17.6 s steady).
_FUSED_DUP_MAX = 1.5


def _ext_duplication(geom) -> float:
    return float(np.prod([nt * e for nt, e in zip(geom.tiles, geom.ext)])
                 / np.prod(geom.fine_shape))


def dft_truncate_deconvolve_tiled(tiles: jax.Array, plan, geom,
                                  batch: int,
                                  precision=jax.lax.Precision.HIGHEST
                                  ) -> jax.Array:
    """Type-1 post-stage directly from per-tile extended spread output.

    Args:
        tiles: [*tiles, B2, *ext] float (B2 = 2*batch folded channels).

    Returns:
        [batch, *grid_shape, 2] planar modes (CMCL).
    """
    rank = plan.rank
    if _ext_duplication(geom) > _FUSED_DUP_MAX:
        from tensorflow_nufft_tpu.kernels.binning import overlap_add
        fine = overlap_add(tiles, geom)              # [B2, *fine]
        x = fine.reshape((batch, 2) + geom.fine_shape)
        x = jnp.moveaxis(x, 1, -1)                   # [B, *fine, 2]
        # Materialize before the matmul chain: XLA fusing the
        # overlap-add concats into the first tensordot's operand is a
        # ~10x slowdown (46 + 25 ms parts vs 606 ms fused, v5e 256^3).
        x = jax.lax.optimization_barrier(x)
        return dft_truncate_deconvolve(x, plan, precision)
    sign = -1.0 if plan.spec.fft_direction == "forward" else 1.0
    # [nt_0.., B2, E_0..] -> [B2, nt_0, E_0, nt_1, E_1, ...]
    perm = [rank]
    for d in range(rank):
        perm.extend([d, rank + 1 + d])
    x = jnp.transpose(tiles, perm)
    nt = geom.tiles
    ext = geom.ext
    x = x.reshape((x.shape[0],) + tuple(
        nt[d] * ext[d] for d in range(rank)))
    x = x.reshape((batch, 2) + x.shape[1:])
    xr, xi = x[:, 0], x[:, 1]
    for d in range(rank):
        c_np, s_np = _ext_mode_twiddles(
            plan.fine_shape[d], plan.grid_shape[d], nt[d], geom.tile[d],
            geom.pad, sign, plan.deconv_weights(d), truncating=True)
        c = jnp.asarray(c_np, xr.dtype)
        s = jnp.asarray(s_np, xr.dtype)
        xr, xi = _contract_planar(xr, xi, c, s, 1 + d, precision)
    return jnp.stack([xr, xi], axis=-1)


def _amplify_embed(modes: jax.Array, plan) -> jax.Array:
    """[B, *grid, 2] CMCL modes -> [B, *fine, 2] fine-grid spectrum:
    separable multiply by the deconvolution weights, then zero-pad into
    the fine grid at the wrapped CMCL slots (mode i at fine index
    (i - n//2) mod nf: place at [0, n) and roll by -(n//2)). Cheap
    elementwise + slicing; the DFT itself then runs on clean
    power-of-two axes (see _FUSED_DUP_MAX)."""
    rank = plan.rank
    x = modes
    for d in range(rank):
        n = plan.grid_shape[d]
        nf = plan.fine_shape[d]
        ax = 1 + d
        w_shape = [1] * x.ndim
        w_shape[ax] = n
        x = x * jnp.asarray(plan.deconv_weights(d),
                            x.dtype).reshape(w_shape)
        pad_widths = [(0, 0)] * x.ndim
        pad_widths[ax] = (0, nf - n)
        x = jnp.pad(x, pad_widths)
        x = jnp.roll(x, -(n // 2), axis=ax)
    return x


def amplify_pad_dft_tiled(modes: jax.Array, plan, geom,
                          precision=jax.lax.Precision.HIGHEST
                          ) -> jax.Array:
    """Type-2 pre-stage producing per-tile extended fine-grid blocks.

    Args:
        modes: [batch, *grid_shape, 2] planar CMCL modes.

    Returns:
        [*tiles, B2, *ext] float blocks ready for the interp kernel —
        the windowing/halo duplication is folded into the contraction,
        so the full fine grid never materializes.
    """
    rank = plan.rank
    if _ext_duplication(geom) > _FUSED_DUP_MAX:
        from tensorflow_nufft_tpu.kernels.binning import extend_tiles
        # Barriers pin each stage's output layout; cross-stage fusion
        # of pad/roll/slice chains into matmul operands measured ~100x
        # slower (see dft_truncate_deconvolve_tiled).
        x = jax.lax.optimization_barrier(
            _amplify_embed(modes, plan))             # [B, *fine, 2]
        x = jax.lax.optimization_barrier(
            dft_planar(x, rank, plan.spec.fft_direction, precision))
        batch = modes.shape[0]
        fine = jnp.moveaxis(x, -1, 1).reshape(
            (2 * batch,) + plan.fine_shape)          # [B2, *fine]
        return extend_tiles(fine, geom)
    sign = -1.0 if plan.spec.fft_direction == "forward" else 1.0
    batch = modes.shape[0]
    xr, xi = modes[..., 0], modes[..., 1]
    nt = geom.tiles
    ext = geom.ext
    for d in range(rank):
        c_np, s_np = _ext_mode_twiddles(
            plan.fine_shape[d], plan.grid_shape[d], nt[d], geom.tile[d],
            geom.pad, sign, plan.deconv_weights(d), truncating=False)
        c = jnp.asarray(c_np, xr.dtype)
        s = jnp.asarray(s_np, xr.dtype)
        xr, xi = _contract_planar(xr, xi, c, s, 1 + d, precision)
    x = jnp.stack([xr, xi], axis=1)          # [B, 2, nt0*E0, ...]
    x = x.reshape((batch * 2,) + x.shape[2:])
    shape = (x.shape[0],)
    for d in range(rank):
        shape += (nt[d], ext[d])
    x = x.reshape(shape)                     # [B2, nt0, E0, nt1, E1..]
    # -> [nt_0.., B2, E_0..]
    perm = [1 + 2 * d for d in range(rank)] + [0] + \
        [2 + 2 * d for d in range(rank)]
    return jnp.transpose(x, perm)


def amplify_pad_dft(x: jax.Array, plan,
                    precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Type-2 pre-stage: [B, *grid, 2] modes (CMCL) -> [B, *fine, 2]
    fine-grid values, computing amplification + zero-padding + DFT as one
    pruned matmul per axis."""
    sign = -1.0 if plan.spec.fft_direction == "forward" else 1.0
    xr, xi = x[..., 0], x[..., 1]
    for d in range(plan.rank):
        c_np, s_np = _mode_twiddles(
            plan.fine_shape[d], plan.grid_shape[d], sign,
            plan.deconv_weights(d), truncating=False)
        c = jnp.asarray(c_np, x.dtype)
        s = jnp.asarray(s_np, x.dtype)
        xr, xi = _contract_planar(xr, xi, c, s, 1 + d, precision)
    return jnp.stack([xr, xi], axis=-1)


def dft_planar(x: jax.Array, rank: int, fft_direction: str,
               precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """DFT over the ``rank`` spatial axes of a planar tensor.

    Args:
        x: [B, *spatial, 2] real array; last axis is (re, im).
        rank: number of trailing spatial axes (before the channel axis).
        fft_direction: 'forward' -> exp(-i...), 'backward' -> exp(+i...)
            with no normalization (matches ``fft_fine``'s ifft * N).

    Returns:
        [B, *spatial, 2] transformed planar tensor.
    """
    sign = -1.0 if fft_direction == "forward" else 1.0
    xr = x[..., 0]
    xi = x[..., 1]
    dtype = x.dtype
    for d in range(rank):
        axis = 1 + d
        n = xr.shape[axis]
        c_np, s_np = _twiddles(n)
        c = jnp.asarray(c_np, dtype=dtype)
        s = jnp.asarray(s_np, dtype=dtype)
        # y = (xr + i xi) (C + i sign S) along `axis`:
        #   yr = xr C - sign xi S ; yi = xi C + sign xr S
        ar = jnp.tensordot(xr, c, axes=[[axis], [0]], precision=precision)
        br = jnp.tensordot(xr, s, axes=[[axis], [0]], precision=precision)
        ai = jnp.tensordot(xi, c, axes=[[axis], [0]], precision=precision)
        bi = jnp.tensordot(xi, s, axes=[[axis], [0]], precision=precision)
        yr = ar - sign * bi
        yi = ai + sign * br
        # tensordot moved the transformed axis to the end; restore it.
        xr = jnp.moveaxis(yr, -1, axis)
        xi = jnp.moveaxis(yi, -1, axis)
    return jnp.stack([xr, xi], axis=-1)

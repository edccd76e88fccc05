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

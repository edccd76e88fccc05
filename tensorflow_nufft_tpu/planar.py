"""Planar-real NUFFT API: complex values as a trailing (re, im) channel.

This is the native API for TPU execution. The live TPU backend supports no
complex dtypes, and on TPU hardware complex arithmetic is pairwise-real
anyway, so the planar form *is* the TPU-native representation: a complex
array ``z`` is carried as a real array ``p = stack([z.real, z.imag], -1)``.

Function signatures mirror the top-level complex API (and the reference,
python/ops/nufft_ops.py:34-123) with every complex argument/result gaining
a trailing channel axis of size 2:

    kspace = tfft.planar.nufft(image_p, points)   # image_p: [*grid, 2]

Helpers ``to_planar``/``from_planar`` convert on the host.

Gradient convention: these are real-valued functions, so ``jax.vjp`` is
the plain real transpose, which equals the planar representation of the
complex *adjoint* (conjugate transpose). Gradients of any real scalar
loss agree with the complex API's; raw cotangent pulls differ by the
conjugation convention, as they must.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_nufft_tpu.ops.nufft_ops import (
    _apply_batched,
    _canonical_grid_shape,
    _validate_enum,
    _VALID_FFT_DIRECTIONS,
    _VALID_TRANSFORM_TYPES,
)
from tensorflow_nufft_tpu.ops.planar_core import (
    nufft_core_planar,
    nufft_core_planar_raw,
)
from tensorflow_nufft_tpu.options.options import Options
from tensorflow_nufft_tpu.plan.plan import PlanSpec

_FLOAT_DTYPES = (np.dtype(np.float32), np.dtype(np.float64))


def to_planar(z) -> jnp.ndarray:
    """complex array -> planar real array with trailing (re, im) axis."""
    z = np.asarray(z)
    return jnp.asarray(np.stack([z.real, z.imag], axis=-1))


def from_planar(p) -> np.ndarray:
    """planar real array -> complex numpy array (host-side)."""
    p = np.asarray(p)
    return p[..., 0] + 1j * p[..., 1]


def _check_planar_inputs(source, points, name="source"):
    if source.dtype not in _FLOAT_DTYPES:
        raise TypeError(
            f"planar {name} must be float32 or float64, got "
            f"{source.dtype}.")
    if source.ndim < 1 or source.shape[-1] != 2:
        raise ValueError(
            f"planar {name} must have a trailing (re, im) axis of size 2, "
            f"got shape {source.shape}.")
    if points.dtype != source.dtype:
        raise TypeError(
            f"points must have dtype {source.dtype} (same as planar "
            f"{name}), got {points.dtype}.")
    if points.ndim < 2:
        raise ValueError(
            f"points must have shape [..., M, rank], got {points.shape}.")


def _dtype_name(dtype) -> str:
    return "complex64" if np.dtype(dtype) == np.float32 else "complex128"


def nufft(source,
          points,
          grid_shape=None,
          transform_type: str = "type_2",
          fft_direction: str = "forward",
          tol: float = 1e-6,
          options: Optional[Options] = None):
    """Planar NUFFT. See the top-level ``nufft`` for semantics.

    Args:
        source: planar complex: [..., M, 2] (type-1) or
            [...] + grid_shape + [2] (type-2), float32/float64.
        points: [..., M, rank] same float dtype, radians in [-pi, pi].

    Returns:
        [...] + grid_shape + [2] (type-1) or [..., M, 2] (type-2).
    """
    options = options or Options()
    transform_type = _validate_enum(
        transform_type, _VALID_TRANSFORM_TYPES, "transform_type")
    fft_direction = _validate_enum(
        fft_direction, _VALID_FFT_DIRECTIONS, "fft_direction")
    source = jnp.asarray(source)
    points = jnp.asarray(points)
    _check_planar_inputs(source, points)
    rank = int(points.shape[-1])
    if rank not in (1, 2, 3):
        raise ValueError(f"rank must be 1, 2 or 3, got {rank}.")
    num_points = int(points.shape[-2])

    if transform_type == "type_1":
        if grid_shape is None:
            raise ValueError(
                "grid_shape must be provided for type-1 transforms")
        grid_shape = _canonical_grid_shape(grid_shape)
        if len(grid_shape) != rank:
            raise ValueError(
                f"grid_shape must represent a rank-{rank} shape. "
                f"Received: {grid_shape}")
        if int(source.shape[-2]) != num_points:
            raise ValueError(
                f"source and points have incompatible number of points: "
                f"{source.shape[-2]} vs {num_points}.")
        elem_rank = 2                       # (M, 2)
        out_elem_shape = grid_shape + (2,)
    else:
        if source.ndim < rank + 1:
            raise ValueError(
                f"planar source must have at least rank {rank + 1}, got "
                f"shape {source.shape}.")
        grid_shape = tuple(int(d) for d in source.shape[-rank - 1:-1])
        elem_rank = rank + 1                # (*grid, 2)
        out_elem_shape = (num_points, 2)

    spec = PlanSpec(
        transform_type=transform_type,
        fft_direction=fft_direction,
        rank=rank,
        grid_shape=grid_shape,
        dtype_name=_dtype_name(source.dtype),
        tol=float(tol),
        points_range=int(options.points_range),
        spread_only=False,
        upsampling_factor=options.upsampling_factor,
        backend=options.backend,
    )
    return _apply_batched(nufft_core_planar, source, points, spec,
                          elem_rank, out_elem_shape,
                          options.max_batch_size)


def interp(source, points, tol: float = 1e-6,
           options: Optional[Options] = None):
    """Planar standalone interpolation; see top-level ``interp``."""
    return _spread_or_interp("type_2", source, points, None, tol, options)


def spread(source, points, grid_shape, tol: float = 1e-6,
           options: Optional[Options] = None):
    """Planar standalone spreading; see top-level ``spread``."""
    return _spread_or_interp("type_1", source, points, grid_shape, tol,
                             options)


def _spread_or_interp(transform_type, source, points, grid_shape, tol,
                      options):
    options = options or Options()
    source = jnp.asarray(source)
    points = jnp.asarray(points)
    _check_planar_inputs(source, points)
    rank = int(points.shape[-1])
    if rank not in (1, 2, 3):
        raise ValueError(f"rank must be 1, 2 or 3, got {rank}.")
    num_points = int(points.shape[-2])

    if transform_type == "type_1":
        grid_shape = _canonical_grid_shape(grid_shape)
        if len(grid_shape) != rank:
            raise ValueError(
                f"grid_shape must represent a rank-{rank} shape. "
                f"Received: {grid_shape}")
        if int(source.shape[-2]) != num_points:
            raise ValueError(
                f"source and points have incompatible number of points: "
                f"{source.shape[-2]} vs {num_points}.")
        elem_rank = 2
        out_elem_shape = grid_shape + (2,)
    else:
        grid_shape = tuple(int(d) for d in source.shape[-rank - 1:-1])
        elem_rank = rank + 1
        out_elem_shape = (num_points, 2)

    spec = PlanSpec(
        transform_type=transform_type,
        fft_direction="forward",
        rank=rank,
        grid_shape=grid_shape,
        dtype_name=_dtype_name(source.dtype),
        tol=float(tol),
        points_range=int(options.points_range),
        spread_only=True,
        upsampling_factor=None,
        backend=options.backend,
    )
    return _apply_batched(nufft_core_planar_raw, source, points, spec,
                          elem_rank, out_elem_shape,
                          options.max_batch_size)


def nudft(source,
          points,
          grid_shape=None,
          transform_type: str = "type_2",
          fft_direction: str = "forward"):
    """Planar dense NUDFT oracle (testing; real arithmetic throughout)."""
    transform_type = _validate_enum(
        transform_type, _VALID_TRANSFORM_TYPES, "transform_type")
    fft_direction = _validate_enum(
        fft_direction, _VALID_FFT_DIRECTIONS, "fft_direction")
    source = jnp.asarray(source)
    points = jnp.asarray(points)
    _check_planar_inputs(source, points)
    rank = int(points.shape[-1])
    num_points = int(points.shape[-2])
    if transform_type == "type_1":
        if grid_shape is None:
            raise ValueError(
                "grid_shape must be provided for type-1 transforms")
        grid_shape = _canonical_grid_shape(grid_shape)
        elem_rank = 2
        out_elem_shape = grid_shape + (2,)
    else:
        grid_shape = tuple(int(d) for d in source.shape[-rank - 1:-1])
        elem_rank = rank + 1
        out_elem_shape = (num_points, 2)

    sign = -1.0 if fft_direction == "forward" else 1.0
    k_vecs = [np.arange(n) - n // 2 for n in grid_shape]
    k_grid = np.stack(np.meshgrid(*k_vecs, indexing="ij"),
                      axis=0).reshape(rank, -1)
    k_grid = jnp.asarray(k_grid, dtype=points.dtype)

    # Oracle accuracy trumps speed: TPU matmuls default to bf16, and a
    # ~0.4% relative error on phases of magnitude ~N*pi/2 destroys the
    # oracle entirely. Force full-f32 (HIGHEST) arithmetic throughout.
    hi = jax.lax.Precision.HIGHEST

    def core(src, pts, _spec=None):
        theta = jnp.matmul(pts, k_grid, precision=hi)   # [M, N]
        cos = jnp.cos(theta)
        sin = sign * jnp.sin(theta)
        if transform_type == "type_1":
            sr = src[..., 0]                     # [B, M]
            si = src[..., 1]
            # y_k = sum_m (sr + i si)(cos + i sin)
            yr = jnp.einsum("bm,mn->bn", sr, cos, precision=hi) - \
                jnp.einsum("bm,mn->bn", si, sin, precision=hi)
            yi = jnp.einsum("bm,mn->bn", sr, sin, precision=hi) + \
                jnp.einsum("bm,mn->bn", si, cos, precision=hi)
            out = jnp.stack([yr, yi], axis=-1)
            return out.reshape((src.shape[0],) + grid_shape + (2,))
        flat = src.reshape(src.shape[0], -1, 2)  # [B, N, 2]
        sr = flat[..., 0]
        si = flat[..., 1]
        yr = jnp.einsum("bn,mn->bm", sr, cos, precision=hi) - \
            jnp.einsum("bn,mn->bm", si, sin, precision=hi)
        yi = jnp.einsum("bn,mn->bm", sr, sin, precision=hi) + \
            jnp.einsum("bn,mn->bm", si, cos, precision=hi)
        return jnp.stack([yr, yi], axis=-1)

    return _apply_batched(core, source, points, None, elem_rank,
                          out_elem_shape, None)

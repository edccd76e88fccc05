"""Multi-chip sharded NUFFT via shard_map over a jax.sharding.Mesh.

The reference has no distributed layer at all (SURVEY.md section 2:
device placement is delegated to TF's runtime). This module is the
TPU-native extension: transforms scale over a device mesh along two
orthogonal axes:

  - **data axis**: independent transforms (batch/coils) are sharded;
    no communication at all.
  - **points axis**: one transform's nonuniform points are sharded;
    type-2 needs no collectives (each device evaluates its own points
    from a replicated grid); type-1 spreads locally and reduces the fine
    grid with a single ``psum`` over ICI — the collective equivalent of
    the reference's atomic adds into shared memory.

Everything is planar-real (TPU native; see ``tensorflow_nufft_tpu.planar``).
Gradients work through ``shard_map`` (psum transposes automatically).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

from tensorflow_nufft_tpu.ops.planar_core import nufft_core_planar
from tensorflow_nufft_tpu.options.options import Options
from tensorflow_nufft_tpu.plan.plan import PlanSpec


def _make_spec(transform_type, fft_direction, rank, grid_shape, dtype,
               tol, options: Options) -> PlanSpec:
    import numpy as np
    dtype_name = "complex64" if np.dtype(dtype) == np.float32 \
        else "complex128"
    return PlanSpec(
        transform_type=transform_type,
        fft_direction=fft_direction,
        rank=rank,
        grid_shape=tuple(int(d) for d in grid_shape),
        dtype_name=dtype_name,
        tol=float(tol),
        points_range=int(options.points_range),
        spread_only=False,
        upsampling_factor=options.upsampling_factor,
        backend=options.backend,
    )


def sharded_nufft(source: jax.Array,
                  points: jax.Array,
                  mesh: Mesh,
                  grid_shape: Optional[Tuple[int, ...]] = None,
                  transform_type: str = "type_2",
                  fft_direction: str = "forward",
                  tol: float = 1e-6,
                  options: Optional[Options] = None,
                  data_axis: Optional[str] = "data",
                  points_axis: Optional[str] = "points"):
    """Planar NUFFT sharded over a device mesh.

    Args:
        source: planar complex. Type-2: ``[B, *grid, 2]``; type-1:
            ``[B, M, 2]``. ``B`` is sharded over ``data_axis``; ``M`` over
            ``points_axis``. Both axes optional (pass None to skip).
        points: ``[M, rank]``, sharded over ``points_axis``, replicated
            over ``data_axis``.
        mesh: the device mesh; axis sizes must divide B and M.
        grid_shape: required for type-1.

    Returns:
        Type-2: ``[B, M, 2]`` sharded (data, points). Type-1:
        ``[B, *grid, 2]`` sharded over data, replicated over points.
    """
    options = options or Options()
    rank = int(points.shape[-1])
    if transform_type == "type_1":
        if grid_shape is None:
            raise ValueError(
                "grid_shape must be provided for type-1 transforms")
    else:
        grid_shape = tuple(int(d) for d in source.shape[-rank - 1:-1])
    spec = _make_spec(transform_type, fft_direction, rank, grid_shape,
                      points.dtype, tol, options)

    da = data_axis if data_axis and data_axis in mesh.axis_names else None
    pa = points_axis if points_axis and points_axis in mesh.axis_names \
        else None

    grid_dims = (None,) * (rank + 1)        # grid elem dims + channel
    if transform_type == "type_2":
        src_spec = P(da, *grid_dims)
        out_spec = P(da, pa, None)
    else:
        src_spec = P(da, pa, None)
        out_spec = P(da, *grid_dims)
    pts_spec = P(pa, None)

    def local_fn(src, pts):
        out = nufft_core_planar(src, pts, spec)
        if transform_type == "type_1" and pa is not None:
            # Each device spread only its local points; reduce fine-grid
            # contributions (already deconvolved: the pipeline is linear,
            # so reducing mode outputs is equivalent and smaller).
            out = jax.lax.psum(out, pa)
        return out

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(src_spec, pts_spec),
        out_specs=out_spec,
        # The spread scan's zero-initialized carry is replicated-typed
        # while the scanned updates vary over the mesh; skip the varying
        # manual-axes check (results are unaffected).
        check_vma=False)
    return fn(source, points)

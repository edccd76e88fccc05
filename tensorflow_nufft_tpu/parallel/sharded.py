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
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tensorflow_nufft_tpu.ops.planar_core import nufft_core_planar
from tensorflow_nufft_tpu.options.options import Options
from tensorflow_nufft_tpu.plan.plan import PlanSpec
from tensorflow_nufft_tpu.utils.batching import chunked_map


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
        kernel_evaluation_method=options.kernel_evaluation_method,
    )


def _vary_over(x, axes):
    """Marks ``x`` as varying over ``axes`` it is not already varying
    over (shard_map vma bookkeeping; the transform bodies treat their
    inputs as device-local data along those axes)."""
    have = jax.typeof(x).vma
    missing = tuple(a for a in axes if a not in have)
    if not missing:
        return x
    if hasattr(jax.lax, "pcast"):       # pvary deprecated in newer jax
        return jax.lax.pcast(x, missing, to="varying")
    return jax.lax.pvary(x, missing)


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

    active = tuple(a for a in (da, pa) if a)

    def local_fn(src, pts):
        # The per-device inputs vary over the ACTIVE mesh axes from
        # this point on (sharded batch/points); mark them so
        # shard_map's varying-manual-axes check validates the
        # collectives. Inactive axes stay replicated — varying over
        # them would contradict the replicated out_specs.
        src = _vary_over(src, active)
        pts = _vary_over(pts, active)
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
        out_specs=out_spec)
    return fn(source, points)


def sharded_nufft_grid(source: jax.Array,
                       points: jax.Array,
                       mesh: Mesh,
                       grid_shape: Optional[Tuple[int, ...]] = None,
                       transform_type: str = "type_2",
                       fft_direction: str = "forward",
                       tol: float = 1e-6,
                       options: Optional[Options] = None,
                       grid_axis: str = "grid"):
    """NUFFT with the MODE GRID sharded over the mesh (single-large-
    transform scaling; no reference counterpart — the reference has no
    distributed layer at all).

    The leading grid dimension is sharded over ``grid_axis``:

      - type-1: points are replicated; each device spreads all points
        and computes only ITS slab of the mode grid (the mode-DFT
        contraction row-block), then a reduce_scatter-free local
        truncation applies — communication is zero beyond the implicit
        input replication, and the big mode output is born sharded.
      - type-2: each device holds its mode slab; slabs are all_gathered
        (modes are the SMALL object) and each device evaluates its own
        share of the points — compute and output scale with the mesh.

    Memory: the [*grid] mode tensor is sharded; the oversampled fine
    grid remains per-device (it is points-sharding's job to shard the
    spread; combine both axes for full scaling).

    Args:
        source: type-1: [B, M, 2] replicated; type-2: [B, *grid, 2]
            sharded on grid dim 0.
        points: [M, rank]; replicated for type-1, sharded over
            ``grid_axis`` for type-2.

    Returns:
        type-1: [B, *grid, 2] sharded on grid dim 0; type-2: [B, M, 2]
        with M sharded over ``grid_axis``.
    """
    options = options or Options()
    rank = int(points.shape[-1])
    ndev = mesh.shape[grid_axis]
    if transform_type == "type_1":
        if grid_shape is None:
            raise ValueError(
                "grid_shape must be provided for type-1 transforms")
        grid_shape = tuple(int(d) for d in grid_shape)
    else:
        # source is the GLOBAL array (shard_map shards it on entry)
        grid_shape = tuple(int(d) for d in source.shape[-rank - 1:-1])

    if grid_shape[0] % ndev != 0:
        raise ValueError(
            f"the '{grid_axis}' mesh axis size {ndev} must divide the "
            f"leading grid dim {grid_shape[0]}")
    spec = _make_spec(transform_type, fft_direction, rank, grid_shape,
                      points.dtype, tol, options)
    grid_dims = (None,) * rank

    if transform_type == "type_1":
        import numpy as np
        from tensorflow_nufft_tpu.fft.planar_fft import (
            _contract_planar, _mode_twiddles)
        from tensorflow_nufft_tpu.kernels import dispatch
        from tensorflow_nufft_tpu.kernels.xla_ops import (
            fold_and_rescale_split)
        from tensorflow_nufft_tpu.plan.plan import make_plan

        plan = make_plan(spec)
        sign = -1.0 if fft_direction == "forward" else 1.0
        slab = grid_shape[0] // ndev
        # Per-device row-pruned twiddles for the leading grid axis: a
        # [ndev, nf, slab] stack, dynamic-sliced by axis_index inside
        # the shard_map body. Each device computes ONLY its slab of the
        # fused DFT + truncate + deconvolve contraction.
        c0, s0 = _mode_twiddles(plan.fine_shape[0], grid_shape[0], sign,
                                plan.deconv_weights(0), truncating=True)
        # Shard the leading-axis twiddles over the mesh as operands
        # ([ndev, nf, slab] with in_spec P(grid_axis, ...)): each device
        # holds only ITS [nf, slab] block — replicating the full stack
        # (or inlining it as a jit literal) would defeat the memory
        # scaling and bloat the remote-compile payload at large grids.
        rdt = np.float32 if points.dtype == np.float32 else np.float64
        c0 = jnp.asarray(np.stack(np.split(c0, ndev, axis=1)), rdt)
        s0 = jnp.asarray(np.stack(np.split(s0, ndev, axis=1)), rdt)

        def local_fn(src, pts, cd, sd):
            src = _vary_over(src, (grid_axis,))
            pts = _vary_over(pts, (grid_axis,))
            cd = _vary_over(cd[0], (grid_axis,))
            sd = _vary_over(sd[0], (grid_axis,))
            batch = src.shape[0]
            pr = fold_and_rescale_split(pts, plan.fine_shape,
                                        spec.points_range)
            folded = jnp.moveaxis(src, -1, 1).reshape(
                (2 * batch,) + src.shape[1:-1])
            fine = dispatch.spread(folded, pr, plan)  # [2B, *fine]
            fine = jnp.moveaxis(
                fine.reshape((batch, 2) + fine.shape[1:]), 1, -1)
            xr, xi = fine[..., 0], fine[..., 1]
            xr, xi = _contract_planar(xr, xi, cd, sd, 1, precision)
            for d in range(1, rank):
                c_np, s_np = _mode_twiddles(
                    plan.fine_shape[d], grid_shape[d], sign,
                    plan.deconv_weights(d), truncating=True)
                xr, xi = _contract_planar(
                    xr, xi, jnp.asarray(c_np, xr.dtype),
                    jnp.asarray(s_np, xr.dtype), 1 + d, precision)
            return jnp.stack([xr, xi], axis=-1)       # [B, slab, .., 2]

        precision = jax.lax.Precision.HIGHEST
        fn = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(None, None, None), P(None, None),
                      P(grid_axis, None, None), P(grid_axis, None, None)),
            out_specs=P(None, grid_axis, *grid_dims[1:], None))
        return fn(source, points, c0, s0)

    def local_fn(src, pts):
        pts = _vary_over(pts, (grid_axis,))
        full_modes = jax.lax.all_gather(
            src, grid_axis, axis=1, tiled=True)       # [B, *grid, 2]
        return nufft_core_planar(full_modes, pts, spec)

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, grid_axis, *grid_dims), P(grid_axis, None)),
        out_specs=P(None, grid_axis, None))
    return fn(source, points)


def sharded_nufft_type3(source: jax.Array,
                        points,
                        target_points,
                        mesh: Mesh,
                        fft_direction: str = "forward",
                        tol: float = 1e-6,
                        options: Optional[Options] = None,
                        data_axis: Optional[str] = "data",
                        points_axis: Optional[str] = "points"):
    """Planar type-3 NUFFT sharded over a device mesh.

    One ``points_axis`` scales BOTH nonuniform sides: each device
    prephases and spreads its shard of the source points onto the
    type-3 fine grid (one ``psum`` reduces the grid — the collective
    analog of scatter-add), then evaluates its shard of the target
    frequencies with a local inner type-2 (no communication at all on
    the target side). ``data_axis`` shards the strength batch with no
    communication. No reference counterpart on either axis: the
    reference has neither type-3 nor a distributed layer.

    Args:
        source: planar strengths ``[B, M, 2]`` (float32). ``B`` shards
            over ``data_axis``, ``M`` over ``points_axis``.
        points: ``[M, rank]`` float32, concrete (plan statics).
            ``M`` must divide the ``points_axis`` size.
        target_points: ``[K, rank]`` float32, concrete. ``K`` must
            divide the ``points_axis`` size.
        mesh: the device mesh.

    Returns:
        ``[B, K, 2]`` planar values, sharded (data, points).
    """
    import numpy as np

    from tensorflow_nufft_tpu.kernels import dispatch
    from tensorflow_nufft_tpu.kernels.xla_ops import (
        fold_and_rescale_split)
    from tensorflow_nufft_tpu.ops.planar_core import nufft_core_planar
    from tensorflow_nufft_tpu.ops.type3 import (
        compute_type3_statics, validate_type3_point_sets)
    from tensorflow_nufft_tpu.plan.plan import make_plan

    options = options or Options()
    x, t = validate_type3_point_sets(points, target_points,
                                     allowed_dtypes=(np.float32,))
    st = compute_type3_statics(
        np.asarray(x, np.float64), np.asarray(t, np.float64),
        fft_direction, tol, real_dt=np.float32)

    da = data_axis if data_axis and data_axis in mesh.axis_names else None
    pa = points_axis if points_axis and points_axis in mesh.axis_names \
        else None
    npts = mesh.shape[pa] if pa else 1
    if st.num_points % npts or st.num_targets % npts:
        raise ValueError(
            f"the '{points_axis}' mesh axis size {npts} must divide "
            f"both M={st.num_points} and K={st.num_targets}")

    xi = jnp.asarray(st.xi.astype(np.float32))
    theta = jnp.asarray(st.theta.astype(np.float32))
    pre = jnp.asarray(
        np.stack([st.prephase.real, st.prephase.imag], -1)
        .astype(np.float32))                               # [M, 2]
    post = jnp.asarray(
        np.stack([st.postphase.real, st.postphase.imag], -1)
        .astype(np.float32))                               # [K, 2]

    spread_spec = PlanSpec(
        transform_type="type_1", fft_direction=fft_direction,
        rank=st.rank, grid_shape=st.fine_shape, dtype_name="complex64",
        tol=float(tol), points_range=0, spread_only=True,
        backend=options.backend,
        kernel_evaluation_method=options.kernel_evaluation_method)
    spread_plan = make_plan(spread_spec)
    if (spread_plan.width != st.width
            or spread_plan.fine_shape != st.fine_shape):
        raise AssertionError(
            "type-3 spread plan geometry mismatch (statics vs plan); "
            "see ops/type3.py compute_type3_statics tol clamping")
    t2_spec = PlanSpec(
        transform_type="type_2", fft_direction=fft_direction,
        rank=st.rank, grid_shape=st.fine_shape, dtype_name="complex64",
        tol=float(tol), points_range=0, backend=options.backend,
        kernel_evaluation_method=options.kernel_evaluation_method)

    from tensorflow_nufft_tpu.planar import pmul

    active = tuple(a for a in (da, pa) if a)

    def local_fn(src, xi_l, pre_l, theta_l, post_l):
        src = _vary_over(src, active)
        xi_l = _vary_over(xi_l, active)
        pre_l = _vary_over(pre_l, active)
        theta_l = _vary_over(theta_l, active)
        post_l = _vary_over(post_l, active)
        m_local = src.shape[1]

        def one_chunk(src_c):
            batch = src_c.shape[0]
            s = pmul(src_c, pre_l[None])            # [Bc, M_l, 2]
            resc = fold_and_rescale_split(xi_l, st.fine_shape, 0)
            cm = jnp.moveaxis(s, -1, 1).reshape(2 * batch, m_local)
            fine = dispatch.spread(cm, resc, spread_plan)
            if pa is not None:
                # Each device spread only its local points: reduce the
                # fine grid over the points axis (linear, so reducing
                # the raw spread is exact). The psum result is
                # axis-invariant; re-mark it varying so the per-device
                # inner type-2 (local theta shard) composes under the
                # vma check.
                fine = _vary_over(jax.lax.psum(fine, pa), (pa,))
            grid = jnp.moveaxis(
                fine.reshape((batch, 2) + st.fine_shape), 1, -1)
            vals = nufft_core_planar(grid, theta_l,
                                     t2_spec)       # [Bc, K_l, 2]
            return pmul(vals, post_l[None])

        # Honor the user's max_batch_size on the per-device batch shard
        # (fine-grid memory bound, like the plan APIs). Only when set
        # explicitly: every device runs the same static chunk count, so
        # the per-chunk psum stays collective-safe.
        max_bs = options.max_batch_size
        if max_bs is not None:
            return chunked_map(one_chunk, src, max_bs)
        return one_chunk(src)

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(da, pa, None), P(pa, None), P(pa, None),
                  P(pa, None), P(pa, None)),
        out_specs=P(da, pa, None))
    return fn(source, xi, pre, theta, post)

"""Backend dispatch for the spread/interp hot loops.

Mirrors the reference's spread-method auto-selection
(cc/kernels/nufft_plan.cu.cc:1871-1879) but for TPU: 'pallas' is the
tile-exclusive MXU formulation, 'xla' the portable scatter/gather path.
'auto' picks Pallas on TPU when the configuration is supported and XLA
otherwise (CPU, unsupported dtypes, spread-only ops that must stay
differentiable through the kernel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_nufft_tpu.kernels import xla_ops
from tensorflow_nufft_tpu.plan.plan import NufftPlan


def pallas_active(plan: NufftPlan, dtype, num_points=None,
                  planned: bool = False) -> bool:
    """Whether the Pallas path serves this plan for real data of
    ``dtype`` (the Pallas kernels are planar/real-only).

    ``planned=True`` (PlannedNufft-style callers) additionally accepts
    rank-3 geometries that only fit VMEM through the axis-0-banded
    kernels — banding needs plan-time z-ordered binning, so unplanned
    dispatch can never use it (and must not optimistically claim it:
    the kernel launch would raise instead of falling back to XLA).
    PlannedNufft re-plans on the unbanded geometry if the band
    degenerates at plan time (clustered z distributions)."""
    if plan.spec.backend == "xla":
        return False
    is_complex_data = jnp.issubdtype(np.dtype(dtype),
                                     jnp.complexfloating)
    try:
        from tensorflow_nufft_tpu.kernels import pallas_spread as ps
    except ImportError:
        if plan.spec.backend == "pallas":
            raise ValueError(
                "backend='pallas' requested but the Pallas kernels are "
                "unavailable on this install.")
        return False
    if plan.spec.backend == "pallas":
        # Forced: still require a supported config — silently degrading
        # (e.g. casting f64 planar data to f32, or quietly running XLA
        # for complex arrays) would defeat the point of forcing.
        if is_complex_data:
            raise ValueError(
                "backend='pallas' serves the planar (real, trailing "
                "re/im channel) pipeline only; complex-dtype arrays "
                "dispatch to XLA. Use the planar API or backend='xla'.")
        if not ps.supports(plan):
            raise ValueError(
                f"backend='pallas' requires complex64/planar-float32 "
                f"data and rank in (1, 2, 3); got "
                f"dtype_name={plan.spec.dtype_name!r}, rank={plan.rank}. "
                f"Use backend='xla' (or 'auto') instead.")
        from tensorflow_nufft_tpu.kernels import binning
        geom = binning.choose_geometry(
            plan.fine_shape, plan.width,
            int(num_points) if num_points is not None else 1)
        if not binning.geometry_valid(geom):
            raise ValueError(
                f"backend='pallas' cannot tile fine shape "
                f"{plan.fine_shape} (a dim is smaller than twice the "
                f"halo {geom.pad}); use backend='xla' (or 'auto').")
        return True
    # auto: only on TPU, f32 planar, supported config. Spread-only ops
    # are served too — their gradients come from the analytic-kernel-
    # derivative custom VJPs (ops.core.spread_only_core), not from
    # differentiating through the kernels.
    if is_complex_data:
        return False
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False
    if not on_tpu:
        return False
    if plan.spec.dtype_name != "complex64":
        return False
    if not ps.supports(plan):
        return False
    from tensorflow_nufft_tpu.kernels import binning
    geom = binning.choose_geometry(
        plan.fine_shape, plan.width,
        int(num_points) if num_points is not None else 1)
    if not binning.geometry_valid(geom):
        return False
    if (ps.streaming_group_size(geom) == 0
            and ps.resident_group_size(geom) == 0):
        # Not even a 2-channel group fits the VMEM budget (very wide
        # kernels on large 3D tiles): fall back to XLA — unless a
        # planned rank-3 caller can reach the geometry through the
        # banded kernels (checked with the smallest usable band; the
        # real band is known only after plan-time binning).
        if not (planned and plan.rank == 3):
            return False
        bgeom = binning.choose_geometry(
            plan.fine_shape, plan.width,
            int(num_points) if num_points is not None else 1,
            banded=True)
        if (not binning.geometry_valid(bgeom)
                or ps.streaming_group_size(bgeom, band=8) == 0):
            return False
    return True


def _native_requested(plan: NufftPlan) -> bool:
    if plan.spec.backend != "native":
        return False
    from tensorflow_nufft_tpu.native import engine
    return engine.available()


def _points_pair(points_resc):
    if isinstance(points_resc, tuple):
        return points_resc
    return points_resc, jnp.zeros_like(points_resc)


def _num_points(points_resc) -> int:
    if isinstance(points_resc, tuple):
        return int(points_resc[0].shape[0])
    return int(points_resc.shape[0])


def _host_points(hi, lo):
    """Reconstructs float64 coordinates from the two-float pair on the
    host (the engine takes double points for full precision)."""
    return np.asarray(hi).astype(np.float64) + np.asarray(lo)


def _native_spread_callback(strengths, points_resc, plan: NufftPlan):
    """Host-callback spread on the C++ engine (complex or planar)."""
    from tensorflow_nufft_tpu.native import engine

    complex_in = jnp.issubdtype(strengths.dtype, jnp.complexfloating)
    out_shape = (strengths.shape[0],) + plan.fine_shape
    hi, lo = _points_pair(points_resc)

    if complex_in:
        def host(s, p_hi, p_lo):
            s = np.asarray(s)
            return engine.spread(
                s, _host_points(p_hi, p_lo), plan.fine_shape,
                plan.width, plan.beta).astype(s.dtype)
        result = jax.ShapeDtypeStruct(out_shape, strengths.dtype)
        return jax.pure_callback(host, result, strengths, hi, lo,
                                 vmap_method="sequential")

    # Planar real: fold the (re, im) channel pair through the complex
    # engine by viewing consecutive batch rows as complex pairs.
    def host_planar(s, p_hi, p_lo):
        s = np.asarray(s)                      # [B2, M] real, (b, c)
        c_dt = np.complex64 if s.dtype == np.float32 else np.complex128
        z = s[0::2] + 1j * s[1::2]
        out = engine.spread(z.astype(c_dt), _host_points(p_hi, p_lo),
                            plan.fine_shape, plan.width, plan.beta)
        stacked = np.empty((s.shape[0],) + plan.fine_shape, s.dtype)
        stacked[0::2] = out.real
        stacked[1::2] = out.imag
        return stacked

    result = jax.ShapeDtypeStruct(out_shape, strengths.dtype)
    return jax.pure_callback(host_planar, result, strengths, hi, lo,
                             vmap_method="sequential")


def _native_interp_callback(fine, points_resc, plan: NufftPlan):
    from tensorflow_nufft_tpu.native import engine

    complex_in = jnp.issubdtype(fine.dtype, jnp.complexfloating)
    hi, lo = _points_pair(points_resc)
    m = hi.shape[0]
    out_shape = (fine.shape[0], m)

    if complex_in:
        def host(f, p_hi, p_lo):
            f = np.ascontiguousarray(np.asarray(f))
            return engine.interp(f, _host_points(p_hi, p_lo),
                                 plan.width, plan.beta).astype(f.dtype)
        result = jax.ShapeDtypeStruct(out_shape, fine.dtype)
        return jax.pure_callback(host, result, fine, hi, lo,
                                 vmap_method="sequential")

    def host_planar(f, p_hi, p_lo):
        f = np.asarray(f)                      # [B2, *fine] real
        c_dt = np.complex64 if f.dtype == np.float32 else np.complex128
        z = (f[0::2] + 1j * f[1::2]).astype(c_dt)
        out = engine.interp(np.ascontiguousarray(z),
                            _host_points(p_hi, p_lo), plan.width,
                            plan.beta)
        stacked = np.empty((f.shape[0], out.shape[1]), f.dtype)
        stacked[0::2] = out.real
        stacked[1::2] = out.imag
        return stacked

    result = jax.ShapeDtypeStruct(out_shape, fine.dtype)
    return jax.pure_callback(host_planar, result, fine, hi, lo,
                             vmap_method="sequential")


def spread(strengths: jax.Array, points_resc: jax.Array,
           plan: NufftPlan) -> jax.Array:
    """[B, M] strengths + [M, rank] rescaled points -> [B, *fine_shape].

    Full-fine-grid output; the tiled entry points below avoid
    materializing the fine grid on the Pallas path.
    """
    if _native_requested(plan):
        return _native_spread_callback(strengths, points_resc, plan)
    if pallas_active(plan, strengths.dtype, _num_points(points_resc)):
        from tensorflow_nufft_tpu.kernels import pallas_spread
        return pallas_spread.spread_pallas(strengths, points_resc, plan)
    indices, kernels = xla_ops.spread_geometry(points_resc, plan)
    return xla_ops.spread_xla(strengths, indices, kernels, plan)


def interp(fine: jax.Array, points_resc: jax.Array,
           plan: NufftPlan) -> jax.Array:
    """[B, *fine_shape] grid + [M, rank] rescaled points -> [B, M]."""
    if _native_requested(plan):
        return _native_interp_callback(fine, points_resc, plan)
    if pallas_active(plan, fine.dtype, _num_points(points_resc)):
        from tensorflow_nufft_tpu.kernels import pallas_interp
        return pallas_interp.interp_pallas(fine, points_resc, plan)
    indices, kernels = xla_ops.spread_geometry(points_resc, plan)
    return xla_ops.interp_xla(fine, indices, kernels, plan)


def interp_deriv(fine: jax.Array, points_resc, plan: NufftPlan,
                 axis: int) -> jax.Array:
    """``interp`` with the analytic ES-kernel derivative phi' on one
    axis — the building block of the spread-only custom VJPs
    (ops.core.spread_only_core): the points-gradient of both standalone
    ops is a derivative-kernel interpolation of the grid-side quantity.
    Pallas on TPU (in-kernel phi' evaluation), XLA otherwise; the
    native engine has no derivative path, so it falls through to XLA.
    """
    if pallas_active(plan, fine.dtype, _num_points(points_resc)):
        from tensorflow_nufft_tpu.kernels import binning, pallas_interp
        geom = binning.choose_geometry(
            plan.fine_shape, plan.width, _num_points(points_resc))
        tiles = binning.extend_tiles(fine.astype(jnp.float32), geom)
        return pallas_interp.interp_pallas_tiled(
            tiles, points_resc, plan, geom,
            deriv_axis=axis).astype(fine.dtype)
    indices, kernels = xla_ops.spread_geometry(points_resc, plan,
                                               deriv_axis=axis)
    return xla_ops.interp_xla(fine, indices, kernels, plan)


def spread_tiled(strengths_cm: jax.Array, points_resc,
                 plan: NufftPlan):
    """Pallas spread returning per-tile extended blocks (no overlap-add):
    strengths_cm [B2, M] (channel-major) -> (tiles [*tiles, B2, *ext],
    geom). Pallas-only entry point."""
    from tensorflow_nufft_tpu.kernels import pallas_spread
    return pallas_spread.spread_pallas_tiles(
        strengths_cm.astype(jnp.float32), points_resc, plan)


def interp_tiled(tiles: jax.Array, points_resc: jax.Array,
                 plan: NufftPlan, geom) -> jax.Array:
    """Pallas interp consuming per-tile extended blocks:
    tiles [*tiles, B2, *ext] -> values [B2, M]."""
    from tensorflow_nufft_tpu.kernels import pallas_interp
    return pallas_interp.interp_pallas_tiled(tiles, points_resc, plan,
                                             geom)

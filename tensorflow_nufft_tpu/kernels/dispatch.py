"""Backend dispatch for the spread/interp hot loops.

Mirrors the reference's spread-method auto-selection
(cc/kernels/nufft_plan.cu.cc:1871-1879) but for TPU: 'pallas' is the
tile-exclusive MXU formulation, 'xla' the portable scatter/gather path.
'auto' picks Pallas on TPU when the configuration is supported and XLA
otherwise (CPU, interpret mode, unsupported ranks/dtypes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tensorflow_nufft_tpu.kernels import xla_ops
from tensorflow_nufft_tpu.plan.plan import NufftPlan


def _use_pallas(plan: NufftPlan, data: jax.Array) -> bool:
    if plan.spec.backend == "xla":
        return False
    if jnp.issubdtype(data.dtype, jnp.complexfloating):
        # The Pallas kernels are planar (real) only; the complex path is
        # served by XLA.
        return False
    try:
        from tensorflow_nufft_tpu.kernels import pallas_spread as ps
    except ImportError:
        return False
    if plan.spec.backend == "pallas":
        return True
    # auto: only on TPU, f32 planar, supported config; spread-only ops
    # stay on XLA so they remain differentiable through the kernel.
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False
    if not on_tpu or plan.spec.spread_only:
        return False
    if plan.spec.dtype_name != "complex64":
        return False
    return ps.supports(plan)


def spread(strengths: jax.Array, points_resc: jax.Array,
           plan: NufftPlan) -> jax.Array:
    """[B, M] strengths + [M, rank] rescaled points -> [B, *fine_shape]."""
    if _use_pallas(plan, strengths):
        from tensorflow_nufft_tpu.kernels import pallas_spread
        return pallas_spread.spread_pallas(strengths, points_resc, plan)
    indices, kernels = xla_ops.spread_geometry(points_resc, plan)
    return xla_ops.spread_xla(strengths, indices, kernels, plan)


def interp(fine: jax.Array, points_resc: jax.Array,
           plan: NufftPlan) -> jax.Array:
    """[B, *fine_shape] grid + [M, rank] rescaled points -> [B, M]."""
    if _use_pallas(plan, fine):
        from tensorflow_nufft_tpu.kernels import pallas_interp
        return pallas_interp.interp_pallas(fine, points_resc, plan)
    indices, kernels = xla_ops.spread_geometry(points_resc, plan)
    return xla_ops.interp_xla(fine, indices, kernels, plan)

"""Analytic custom VJPs of the standalone interp/spread ops.

The forward may run non-differentiable-through kernels (Pallas,
native), so the ops carry custom VJPs built on the analytic ES-kernel
derivative (ops.core.spread_only_core). Reference for correctness:
JAX autodiff straight through the XLA kernels (nufft_core_raw), which
the ops used before. The reference framework defines no Spread/Interp
gradients at all (python/ops/nufft_ops.py:126 covers only NUFFT).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tensorflow_nufft_tpu as tfft
from tensorflow_nufft_tpu import planar
from tensorflow_nufft_tpu.options import Options


def _setup(rng, rank, m=400, n=16):
    grid = (n,) * rank
    pts = rng.uniform(-np.pi, np.pi, (m, rank)).astype(np.float32)
    # Keep points off the support boundary pathologies by construction
    # (uniform random: measure-zero anyway).
    z = (rng.standard_normal(m)
         + 1j * rng.standard_normal(m)).astype(np.complex64)
    img = (rng.standard_normal(grid)
           + 1j * rng.standard_normal(grid)).astype(np.complex64)
    return grid, pts, z, img


def _autodiff_reference(f_raw, args, cot):
    out, vjp = jax.vjp(f_raw, *args)
    return vjp(cot), out


@pytest.mark.parametrize("rank", [1, 2, 3])
@pytest.mark.parametrize("op", ["interp", "spread"])
def test_complex_grads_match_xla_autodiff(rank, op):
    from tensorflow_nufft_tpu.ops.core import (
        nufft_core_raw, spread_only_core)
    from tensorflow_nufft_tpu.ops.nufft_ops import _spread_or_interp
    del _spread_or_interp
    rng = np.random.default_rng(17 + rank)
    grid, pts, z, img = _setup(rng, rank)
    from tensorflow_nufft_tpu.plan.plan import PlanSpec
    tt = "type_2" if op == "interp" else "type_1"
    spec = PlanSpec(
        transform_type=tt, fft_direction="forward", rank=rank,
        grid_shape=grid, dtype_name="complex64", tol=1e-6,
        points_range=1, spread_only=True, upsampling_factor=None,
        backend="xla", kernel_evaluation_method="auto")
    src = jnp.asarray(img[None] if op == "interp" else z[None])
    pts_j = jnp.asarray(pts)

    out = spread_only_core(src, pts_j, spec)
    cot = jnp.asarray(
        (rng.standard_normal(out.shape)
         + 1j * rng.standard_normal(out.shape)).astype(np.complex64))

    (g_src_ref, g_pts_ref), out_ref = _autodiff_reference(
        lambda s, p: nufft_core_raw(s, p, spec), (src, pts_j), cot)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)
    g_src, g_pts = jax.vjp(
        lambda s, p: spread_only_core(s, p, spec), src, pts_j)[1](cot)

    scale = max(np.max(np.abs(g_src_ref)), 1e-30)
    assert np.max(np.abs(np.asarray(g_src) - np.asarray(g_src_ref))) \
        / scale < 1e-4
    pscale = max(np.max(np.abs(g_pts_ref)), 1e-30)
    assert np.max(np.abs(np.asarray(g_pts) - np.asarray(g_pts_ref))) \
        / pscale < 1e-4


@pytest.mark.parametrize("rank", [1, 2])
@pytest.mark.parametrize("op", ["interp", "spread"])
def test_planar_grads_match_xla_autodiff(rank, op):
    from tensorflow_nufft_tpu.ops.planar_core import (
        nufft_core_planar_raw, spread_only_core_planar)
    from tensorflow_nufft_tpu.plan.plan import PlanSpec
    rng = np.random.default_rng(23 + rank)
    grid, pts, z, img = _setup(rng, rank)
    tt = "type_2" if op == "interp" else "type_1"
    spec = PlanSpec(
        transform_type=tt, fft_direction="forward", rank=rank,
        grid_shape=grid, dtype_name="complex64", tol=1e-6,
        points_range=1, spread_only=True, upsampling_factor=None,
        backend="xla", kernel_evaluation_method="auto")
    src = planar.to_planar(img if op == "interp" else z)[None]
    src = jnp.asarray(src)
    pts_j = jnp.asarray(pts)

    out = spread_only_core_planar(src, pts_j, spec)
    cot = jnp.asarray(
        rng.standard_normal(out.shape).astype(np.float32))

    (g_src_ref, g_pts_ref), out_ref = _autodiff_reference(
        lambda s, p: nufft_core_planar_raw(s, p, spec),
        (src, pts_j), cot)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)
    g_src, g_pts = jax.vjp(
        lambda s, p: spread_only_core_planar(s, p, spec),
        src, pts_j)[1](cot)

    scale = max(np.max(np.abs(g_src_ref)), 1e-30)
    assert np.max(np.abs(np.asarray(g_src) - np.asarray(g_src_ref))) \
        / scale < 1e-4
    pscale = max(np.max(np.abs(g_pts_ref)), 1e-30)
    assert np.max(np.abs(np.asarray(g_pts) - np.asarray(g_pts_ref))) \
        / pscale < 1e-4


@pytest.mark.parametrize("op", ["interp", "spread"])
def test_planar_pallas_forward_with_grads(op):
    """The point of the custom VJP: spread-only standalone ops run the
    Pallas kernels (forced; interpret mode on CPU) AND are
    differentiable, matching the XLA path on both counts."""
    rng = np.random.default_rng(31)
    grid, pts, z, img = _setup(rng, 2, m=500, n=32)
    src = planar.to_planar(img if op == "interp" else z)
    pts_j = jnp.asarray(pts)

    def run(backend):
        opts = Options(backend=backend)
        if op == "interp":
            return planar.interp(src, pts_j, options=opts)
        return planar.spread(src, pts_j, grid, options=opts)

    def loss(backend):
        def f(s, p):
            opts = Options(backend=backend)
            if op == "interp":
                out = planar.interp(s, p, options=opts)
            else:
                out = planar.spread(s, p, grid, options=opts)
            return jnp.sum(out ** 2) + jnp.sum(out[..., 0])
        return f

    out_p = np.asarray(run("pallas"))
    out_x = np.asarray(run("xla"))
    scale = np.max(np.abs(out_x))
    assert np.max(np.abs(out_p - out_x)) / scale < 1e-5

    gp_s, gp_p = jax.grad(loss("pallas"), argnums=(0, 1))(
        jnp.asarray(src), pts_j)
    gx_s, gx_p = jax.grad(loss("xla"), argnums=(0, 1))(
        jnp.asarray(src), pts_j)
    sscale = max(np.max(np.abs(np.asarray(gx_s))), 1e-30)
    assert np.max(np.abs(np.asarray(gp_s) - np.asarray(gx_s))) \
        / sscale < 1e-4
    pscale = max(np.max(np.abs(np.asarray(gx_p))), 1e-30)
    assert np.max(np.abs(np.asarray(gp_p) - np.asarray(gx_p))) \
        / pscale < 1e-4


def test_complex_public_api_grad_smoke():
    """tfft.spread / tfft.interp differentiate through the public API
    (batched path) with finite results."""
    rng = np.random.default_rng(41)
    grid, pts, z, img = _setup(rng, 2)

    def loss(s, p):
        v = tfft.interp(s, p)
        w = tfft.spread(v, p, grid)
        return jnp.sum(jnp.abs(w) ** 2)

    g_s, g_p = jax.grad(loss, argnums=(0, 1), holomorphic=False)(
        jnp.asarray(img), jnp.asarray(pts))
    assert np.all(np.isfinite(np.asarray(g_s)))
    assert np.all(np.isfinite(np.asarray(g_p)))

"""Gradient tests: custom VJP vs JAX autodiff of the dense oracle.

Models the reference's gradient checks inside test_nufft
(nufft_ops_test.py:150-221): gradients w.r.t. both inputs, with a
non-trivial upstream cotangent, for both types and directions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tensorflow_nufft_tpu as tfft
from tests.conftest import random_complex, random_points

TOL = 1e-3


def _relerr(a, b):
    a, b = np.asarray(a), np.asarray(b)
    scale = np.max(np.abs(b)) or 1.0
    return np.max(np.abs(a - b)) / scale


@pytest.mark.parametrize("grid_shape", [(8,), (6, 8), (4, 8, 6)])
@pytest.mark.parametrize("transform_type", ["type_1", "type_2"])
@pytest.mark.parametrize("fft_direction", ["forward", "backward"])
def test_vjp_matches_oracle(rng, grid_shape, transform_type, fft_direction):
    rank = len(grid_shape)
    m = 9
    points = random_points(rng, (m, rank), np.float32)
    if transform_type == "type_1":
        source = random_complex(rng, (m,), np.complex64)
        ct = random_complex(rng, grid_shape, np.complex64)
        gs = grid_shape
    else:
        source = random_complex(rng, grid_shape, np.complex64)
        ct = random_complex(rng, (m,), np.complex64)
        gs = None

    fast = lambda s, p: tfft.nufft(
        s, p, grid_shape=gs, transform_type=transform_type,
        fft_direction=fft_direction, tol=1e-6)
    oracle = lambda s, p: tfft.nudft(
        s, p, grid_shape=gs, transform_type=transform_type,
        fft_direction=fft_direction)

    _, vjp_fast = jax.vjp(fast, source, points)
    _, vjp_oracle = jax.vjp(oracle, source, points)
    gs_fast, gp_fast = vjp_fast(ct)
    gs_oracle, gp_oracle = vjp_oracle(ct)
    assert gs_fast.shape == source.shape
    assert gp_fast.shape == points.shape
    assert _relerr(gs_fast, gs_oracle) < TOL
    assert _relerr(gp_fast, gp_oracle) < TOL


def test_vjp_with_broadcasting(rng):
    """Gradients reduce correctly over broadcast batch dims
    (reference: BroadcastGradientArgs handling, nufft_ops.py:217-229)."""
    grid_shape = (6, 8)
    m = 7
    source = random_complex(rng, (3, 1) + grid_shape, np.complex64)
    points = random_points(rng, (2, m, 2), np.float32)
    ct = random_complex(rng, (3, 2, m), np.complex64)

    _, vjp_fast = jax.vjp(lambda s, p: tfft.nufft(s, p), source, points)
    _, vjp_oracle = jax.vjp(lambda s, p: tfft.nudft(s, p), source, points)
    for got, want in zip(vjp_fast(ct), vjp_oracle(ct)):
        assert got.shape == want.shape
        assert _relerr(got, want) < TOL


def test_grad_of_scalar_loss(rng):
    """jax.grad through a real scalar loss (the common training use)."""
    grid_shape = (8, 8)
    m = 12
    source = random_complex(rng, grid_shape, np.complex64)
    points = random_points(rng, (m, 2), np.float32)
    target = random_complex(rng, (m,), np.complex64)

    def loss(s, p):
        pred = tfft.nufft(s, p)
        return jnp.sum(jnp.abs(pred - target) ** 2)

    def loss_oracle(s, p):
        pred = tfft.nudft(s, p)
        return jnp.sum(jnp.abs(pred - target) ** 2)

    g_fast = jax.grad(loss, argnums=(0, 1))(source, points)
    g_oracle = jax.grad(loss_oracle, argnums=(0, 1))(source, points)
    for got, want in zip(g_fast, g_oracle):
        assert _relerr(got, want) < TOL


def test_grad_jit(rng):
    grid_shape = (6, 8)
    source = random_complex(rng, grid_shape, np.complex64)
    points = random_points(rng, (9, 2), np.float32)

    def loss(s, p):
        return jnp.sum(jnp.abs(tfft.nufft(s, p)) ** 2)

    eager = jax.grad(loss, argnums=(0, 1))(source, points)
    jitted = jax.jit(jax.grad(loss, argnums=(0, 1)))(source, points)
    for a, b in zip(eager, jitted):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_interp_spread_adjoint(rng):
    """<interp(g), c> == <g, spread(c)>: the two standalone ops are exact
    adjoints (same kernel matrix transposed)."""
    grid_shape = (16, 16)
    m = 20
    points = random_points(rng, (m, 2), np.float32)
    g = random_complex(rng, grid_shape, np.complex64)
    c = random_complex(rng, (m,), np.complex64)
    lhs = jnp.sum(tfft.interp(g, points) * c)
    rhs = jnp.sum(g * tfft.spread(c, points, grid_shape))
    np.testing.assert_allclose(complex(lhs), complex(rhs), rtol=1e-4)


def test_spread_differentiable(rng):
    """Standalone spread/interp differentiate through the kernel itself
    (no NaNs at the support boundary)."""
    grid_shape = (16, 16)
    points = random_points(rng, (10, 2), np.float32)
    c = random_complex(rng, (10,), np.complex64)

    def loss(p):
        return jnp.sum(jnp.abs(tfft.spread(c, p, grid_shape)) ** 2)

    g = jax.grad(loss)(points)
    assert np.all(np.isfinite(np.asarray(g)))

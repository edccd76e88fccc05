"""backend='native': the C++ engine as a jit-embedded host callback."""

import jax
import numpy as np
import pytest

import tensorflow_nufft_tpu as tfft
from tensorflow_nufft_tpu import native
from tensorflow_nufft_tpu.planar import to_planar
from tests.conftest import random_complex, random_points

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable")


def _relerr(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) or 1.0)


@pytest.mark.parametrize("transform_type", ["type_1", "type_2"])
def test_native_backend_complex(rng, transform_type):
    grid_shape = (12, 16)
    m = 20
    points = random_points(rng, (m, 2), np.float64)
    if transform_type == "type_1":
        src = random_complex(rng, (m,), np.complex128)
        gs = grid_shape
    else:
        src = random_complex(rng, grid_shape, np.complex128)
        gs = None
    got = tfft.nufft(src, points, grid_shape=gs,
                     transform_type=transform_type,
                     options=tfft.Options(backend="native"))
    want = tfft.nufft(src, points, grid_shape=gs,
                      transform_type=transform_type,
                      options=tfft.Options(backend="xla"))
    assert _relerr(got, want) < 1e-10


def test_native_backend_under_jit(rng):
    grid_shape = (16, 16)
    points = random_points(rng, (15, 2), np.float32)
    src = random_complex(rng, grid_shape, np.complex64)
    opts = tfft.Options(backend="native")
    fn = jax.jit(lambda s, p: tfft.nufft(s, p, options=opts))
    got = fn(src, points)
    want = tfft.nufft(src, points)
    assert _relerr(got, want) < 1e-5


def test_native_backend_planar(rng):
    grid_shape = (16, 16)
    points = random_points(rng, (15, 2), np.float32)
    z = random_complex(rng, grid_shape, np.complex64)
    got = tfft.planar.nufft(to_planar(z), points,
                            options=tfft.Options(backend="native"))
    want = tfft.planar.nufft(to_planar(z), points)
    assert _relerr(got, want) < 1e-5


def test_native_backend_grad(rng):
    """NUFFT-level custom VJP makes gradients work even though the
    callback itself is not differentiable."""
    import jax.numpy as jnp
    grid_shape = (16, 16)
    points = random_points(rng, (12, 2), np.float32)
    src = random_complex(rng, grid_shape, np.complex64)
    opts = tfft.Options(backend="native")

    def loss(s, p):
        return jnp.sum(jnp.abs(tfft.nufft(s, p, options=opts)) ** 2)

    g_native = jax.grad(loss, argnums=(0, 1))(src, points)
    def loss_x(s, p):
        return jnp.sum(jnp.abs(tfft.nufft(s, p)) ** 2)
    g_ref = jax.grad(loss_x, argnums=(0, 1))(src, points)
    for a, b in zip(g_native, g_ref):
        assert _relerr(a, b) < 1e-3


def test_type3_not_implemented(rng):
    points = random_points(rng, (5, 2), np.float32)
    src = random_complex(rng, (8, 8), np.complex64)
    with pytest.raises(NotImplementedError, match="type-3"):
        tfft.nufft(src, points, transform_type="type_3")

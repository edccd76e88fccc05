"""Static shape inference under abstract evaluation.

The reference tests graph-time shape inference with placeholders
(nufft_ops_test.py:667-725); the JAX equivalent is ``jax.eval_shape``,
which runs the op abstractly with no data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tensorflow_nufft_tpu as tfft


def _sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


@pytest.mark.parametrize("src_batch,pts_batch,expected_batch", [
    ((), (), ()),
    ((2,), (), (2,)),
    ((), (3,), (3,)),
    ((4, 1), (3,), (4, 3)),
])
def test_type2_shapes(src_batch, pts_batch, expected_batch):
    grid_shape = (6, 8)
    m = 11
    out = jax.eval_shape(
        lambda s, p: tfft.nufft(s, p),
        _sds(src_batch + grid_shape, np.complex64),
        _sds(pts_batch + (m, 2), np.float32))
    assert out.shape == expected_batch + (m,)
    assert out.dtype == np.complex64


@pytest.mark.parametrize("src_batch,pts_batch,expected_batch", [
    ((), (), ()),
    ((5,), (5,), (5,)),
])
def test_type1_shapes(src_batch, pts_batch, expected_batch):
    grid_shape = (4, 8, 6)
    m = 7
    out = jax.eval_shape(
        lambda s, p: tfft.nufft(s, p, grid_shape=grid_shape,
                                transform_type="type_1"),
        _sds(src_batch + (m,), np.complex128),
        _sds(pts_batch + (m, 3), np.float64))
    assert out.shape == expected_batch + grid_shape
    assert out.dtype == np.complex128


def test_interp_spread_shapes():
    out = jax.eval_shape(
        lambda s, p: tfft.interp(s, p),
        _sds((2, 16, 16), np.complex64), _sds((9, 2), np.float32))
    assert out.shape == (2, 9)
    out = jax.eval_shape(
        lambda s, p: tfft.spread(s, p, (16, 16)),
        _sds((2, 9), np.complex64), _sds((9, 2), np.float32))
    assert out.shape == (2, 16, 16)


def test_abstract_errors():
    with pytest.raises(ValueError, match="rank"):
        jax.eval_shape(
            lambda s, p: tfft.nufft(s, p),
            _sds((6, 8), np.complex64),
            _sds((5, 4), np.float32))  # rank 4 unsupported
    with pytest.raises(ValueError, match="[Bb]roadcast"):
        jax.eval_shape(
            lambda s, p: tfft.nufft(s, p),
            _sds((3, 6, 8), np.complex64),
            _sds((2, 5, 2), np.float32))


def test_no_flops_under_eval_shape():
    """eval_shape must not execute device code even for big shapes."""
    out = jax.eval_shape(
        lambda s, p: tfft.nufft(s, p),
        _sds((16, 256, 256), np.complex64),
        _sds((200_000, 2), np.float32))
    assert out.shape == (16, 200_000)

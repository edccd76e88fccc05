"""Dtype helpers shared across the framework."""

import jax.numpy as jnp
import numpy as np

_REAL_OF = {
    np.dtype(np.complex64): np.dtype(np.float32),
    np.dtype(np.complex128): np.dtype(np.float64),
}
_COMPLEX_OF = {v: k for k, v in _REAL_OF.items()}


def is_complex_dtype(dtype) -> bool:
    return np.issubdtype(np.dtype(dtype), np.complexfloating)


def real_dtype(dtype):
    """float dtype matching the precision of a complex dtype."""
    dtype = np.dtype(dtype)
    if dtype in _REAL_OF:
        return _REAL_OF[dtype]
    if dtype in _COMPLEX_OF:
        return dtype
    raise TypeError(f"Expected a complex or float dtype, got {dtype}.")


def complex_dtype(dtype):
    """complex dtype matching the precision of a float dtype."""
    dtype = np.dtype(dtype)
    if dtype in _COMPLEX_OF:
        return _COMPLEX_OF[dtype]
    if dtype in _REAL_OF:
        return dtype
    raise TypeError(f"Expected a complex or float dtype, got {dtype}.")


def asdtype(x, dtype):
    return jnp.asarray(x, dtype=dtype)

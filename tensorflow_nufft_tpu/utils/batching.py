"""Leading-axis chunked mapping (the ``max_batch_size`` idiom).

The reference bounds fine-grid memory by executing at most
``max_batch_size`` inner transforms per plan execution
(cc/kernels/nufft_plan.cc:211-219, nufft_options.py:239-243). The JAX
equivalent: pad the leading batch axis to a multiple of the chunk size,
``lax.map`` the transform over fixed-size chunks (one trace, sequential
execution, so only one chunk's intermediates are live), and slice the
padding back off. Shared by the complex/planar pipelines and the type-3
plans so the pad/map/slice logic cannot drift between them.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp


def chunked_map(fn: Callable[[jax.Array], jax.Array], x: jax.Array,
                chunk: int) -> jax.Array:
    """Applies ``fn`` ([chunk, ...] -> [chunk, ...]) over the leading
    axis of ``x`` in fixed-size chunks.

    Pads the leading axis with zeros to a multiple of ``chunk`` (NUFFTs
    map zero strengths to zero outputs, so padding is inert), maps
    sequentially, and returns the first ``x.shape[0]`` output rows. When
    ``x.shape[0] <= chunk``, calls ``fn`` directly (no pad, no map).
    """
    b = x.shape[0]
    if b <= chunk:
        return fn(x)
    num_chunks = math.ceil(b / chunk)
    padded = num_chunks * chunk
    x_pad = jnp.concatenate(
        [x, jnp.zeros((padded - b,) + x.shape[1:], x.dtype)], axis=0)
    out = jax.lax.map(fn, x_pad.reshape((num_chunks, chunk) + x.shape[1:]))
    return out.reshape((padded,) + out.shape[2:])[:b]

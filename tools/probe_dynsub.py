"""Mosaic feasibility probe: accumulate a [B0, B1, E2] block into a
VMEM ref at DYNAMIC offsets on BOTH the major (E0) and sublane (E1)
dims — the store pattern of a double-banded (z+y) rank-3 spread
kernel. The existing banded kernel only offsets the major dim.

Run on TPU: reports compile success + max|err| vs numpy oracle for
(a) unaligned sublane offsets, (b) 8-aligned sublane offsets.
"""
import sys

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
from jax.experimental import pallas as pl               # noqa: E402
from jax.experimental.pallas import tpu as pltpu        # noqa: E402

E0, E1, E2 = 32, 72, 72
B0, B1 = 16, 16
N = 8


def kern(zo_ref, yo_ref, x_ref, o_ref):
    o_ref[...] = jnp.zeros_like(o_ref)

    def body(j, _):
        zo = zo_ref[j]
        yo = yo_ref[j]
        o_ref[pl.ds(zo, B0), pl.ds(yo, B1), :] += x_ref[j]
        return 0

    jax.lax.fori_loop(0, N, body, 0)


def run(aligned: bool):
    rng = np.random.default_rng(3)
    zo = rng.integers(0, E0 - B0 + 1, N).astype(np.int32)
    yo = rng.integers(0, E1 - B1 + 1, N).astype(np.int32)
    if aligned:
        zo = (zo // 8) * 8
        yo = (yo // 8) * 8
    x = rng.standard_normal((N, B0, B1, E2)).astype(np.float32)

    ref = np.zeros((E0, E1, E2), np.float32)
    for j in range(N):
        ref[zo[j]:zo[j] + B0, yo[j]:yo[j] + B1, :] += x[j]

    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((E0, E1, E2), jnp.float32),
    )
    try:
        out = np.asarray(jax.jit(f)(jnp.asarray(zo), jnp.asarray(yo),
                                    jnp.asarray(x)))
    except Exception as e:  # noqa: BLE001
        print(f"aligned={aligned}: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        return
    err = np.abs(out - ref).max()
    print(f"aligned={aligned}: ok, max err {err:.2e}", flush=True)


if __name__ == "__main__":
    run(aligned=True)
    run(aligned=False)

"""MXU contraction-orientation isolation (b16 t1 spread, lever probe).

The spread kernels' per-chunk contraction is
    O[Ey, Ex] = A_y @ P^T   with A_y [Ey, C], P [Ex, C]
— BOTH operands lane-minor in the contracted axis C (dot_general
contracting dims (1, 1)). The interp dual contracts f[E0, E1] x
m1[E1, C] — the MXU-native A@B form — and runs ~1.8x faster per
chunk-channel at identical FLOPs (tools/probe_b16_levers.py). This
probe isolates the orientation cost on VMEM-resident data, no DMA:

  A  : O += dot(Ay [E,C], P [E,C]) contracting (1,1)   [current spread]
  B  : O += dot(P [E,C], AyT [C,E]) contracting (1,0)  [native form;
       output transposed — a per-TILE fixup, not per chunk]
  C  : V += dot(F [E,E], Ax [E,C]) contracting (1,0)   [interp shape]
  D  : variant A at DEFAULT (bf16) precision            [HIGHEST cost]

Each timed call runs NCHUNK in-kernel iterations x NCH unrolled
channels of the variant (mimicking one streaming group's compute).
"""
import sys
import time
import functools

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
from jax.experimental import pallas as pl               # noqa: E402
from jax.experimental.pallas import tpu as pltpu        # noqa: E402

E, C = 72, 2048
NCH = 8
NCHUNK = 161
K1, K2 = 2, 10
HI = jax.lax.Precision.HIGHEST


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_kernel(variant):
    prec = jax.lax.Precision.DEFAULT if variant == "D" else HI

    def kernel(ay_ref, ayt_ref, ax_ref, s_ref, f_ref, o_ref, oc_ref):
        o_ref[...] = jnp.zeros_like(o_ref)
        oc_ref[...] = jnp.zeros_like(oc_ref)

        def body(i, _):
            fi = i.astype(jnp.float32) * 1e-9
            for b in range(NCH):
                s = s_ref[b] + fi                        # [C]
                if variant in ("A", "D"):
                    p = ax_ref[...] * s[None, :]         # [E, C]
                    o = jax.lax.dot_general(
                        ay_ref[...], p, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec)                  # [E, E]
                    o_ref[b] += o
                elif variant == "B":
                    p = ax_ref[...] * s[None, :]         # [E, C]
                    o = jax.lax.dot_general(
                        p, ayt_ref[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec)                  # [Ex, Ey]^T
                    o_ref[b] += o
                else:                                    # C: interp
                    v = jax.lax.dot_general(
                        f_ref[...], ax_ref[...],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec)                  # [E, C]
                    oc_ref[b] += v * s[None, :]
            return 0

        jax.lax.fori_loop(0, NCHUNK, body, 0)

    return kernel


def run_variant(variant, ay, ayt, ax, s, f):
    call = pl.pallas_call(
        make_kernel(variant),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((NCH, E, E), jnp.float32),
                   jax.ShapeDtypeStruct((NCH, E, C), jnp.float32)),
        interpret=jax.default_backend() != "tpu",
    )

    def make(k):
        @jax.jit
        def g(ay, ayt, ax, s, f):
            def body(i, acc):
                si = s + 1e-6 * jnp.sin(s * i.astype(jnp.float32))
                o, oc = call(ay, ayt, ax, si, f)
                o = jax.lax.optimization_barrier(o)
                oc = jax.lax.optimization_barrier(oc)
                return acc + o[0, 0, 0] + oc[0, 0, 0]
            return jax.lax.fori_loop(0, k, body, 0.0)
        return g

    def timed(g):
        np.asarray(g(ay, ayt, ax, s, f))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(g(ay, ayt, ax, s, f))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = timed(make(K1)), timed(make(K2))
    per = max((tk - t1) / (K2 - K1), 1e-9)
    per_cc = per / (NCHUNK * NCH)
    log(f"variant {variant}: {per * 1e3:8.3f} ms/call "
        f"({per_cc * 1e6:6.3f} us per chunk-channel)")
    return per


rng = np.random.default_rng(0)
ay = jnp.asarray(rng.standard_normal((E, C)).astype(np.float32))
ayt = jnp.asarray(np.ascontiguousarray(np.asarray(ay).T))
ax = jnp.asarray(rng.standard_normal((E, C)).astype(np.float32))
s = jnp.asarray(rng.standard_normal((NCH, C)).astype(np.float32))
f = jnp.asarray(rng.standard_normal((E, E)).astype(np.float32))

log(f"E={E} C={C} NCH={NCH} NCHUNK={NCHUNK} "
    f"(one b16 streaming group's worth of contractions per call)")
for v in ["A", "B", "C", "D"]:
    run_variant(v, ay, ayt, ax, s, f)

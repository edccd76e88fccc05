"""Isolates the resident-mats spread kernel cost: values payload
precomputed outside the loop, perturbed in-loop (nonlinear, through the
pallas call so nothing hoists). Usage: python kernel_iso.py M [chunk]"""
import sys, time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import tensorflow_nufft_tpu as tfft
from tensorflow_nufft_tpu.kernels import binning, pallas_spread as ps

M = int(sys.argv[1]); chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 0
K2 = 17
GRID = 256
rng = np.random.default_rng(7)
pts = jnp.asarray(rng.uniform(-np.pi, np.pi, (M, 2)).astype(np.float32))
vals = jnp.asarray(rng.standard_normal((2, M)).astype(np.float32))
if chunk:
    binning.set_geometry_overrides(chunk=chunk)
op = tfft.planar.PlannedNufft(pts, (GRID, GRID), transform_type="type_1")
geom, plan, binned, mats = op.geom, op.plan, op.binned, op.mats
print(f"M={M} chunk={geom.chunk} nc={geom.num_chunks} "
      f"planned={op._planned}", file=sys.stderr)

values_pl = jax.jit(lambda v: binning.build_values_payload(
    v, binned, geom))(vals)
values_pl = jnp.asarray(values_pl)
rank, batch2 = geom.rank, 2

def call_kernel(vp):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 + rank,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=(
            [pltpu.VMEM((ps.NBUF, mats.shape[1], geom.chunk),
                        jnp.float32)]
            + [pltpu.VMEM((ps.NBUF,) + vp.shape[1:], jnp.float32),
               pltpu.SemaphoreType.DMA((ps.NBUF, 2))]),
    )
    return pl.pallas_call(
        functools.partial(ps._spread_kernel_resident_mats,
                          geom=geom, batch2=batch2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            geom.tiles + (batch2,) + geom.ext, jnp.float32),
    )(binned.tile_bounds, *binned.chunk_tidx, mats, vp)

def perturb(i):
    return 1.0 + 1e-3 * jnp.sin(i.astype(jnp.float32))

def marginal(make):
    def timed(f):
        np.asarray(f()); best = 1e9
        for _ in range(4):
            t0 = time.perf_counter(); np.asarray(f())
            best = min(best, time.perf_counter() - t0)
        return best
    t1, tk = timed(make(1)), timed(make(K2))
    return max((tk - t1) / (K2 - 1), 1e-9)

def mk(k):
    @jax.jit
    def f():
        def body(i, acc):
            t = call_kernel(values_pl * perturb(i))
            return acc + t[0, 0, 0, 0, 0]
        return jax.lax.fori_loop(0, k, body, 0.0)
    return f

per = marginal(mk)
print(f"kernel_only M={M} chunk={geom.chunk}: {per*1e3:7.3f} ms "
      f"({per*1e6/geom.num_chunks:6.2f} us/chunk)")

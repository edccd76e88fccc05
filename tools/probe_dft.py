"""Micro-experiments for the 3D tiled mode-DFT compile stall.

Each variant is one small jit; run them one at a time:
  python tools/probe_dft.py transpose|dot1|dot_hi|dotlast|chain|slab
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

NT = (32, 8, 8)
EXT = (16, 40, 40)
B2 = 2
N = 128
HI = jax.lax.Precision.HIGHEST


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timed(name, fn, *args):
    t0 = time.perf_counter()
    compiled = jax.jit(fn).lower(*args).compile()
    t1 = time.perf_counter()
    r = np.asarray(jax.tree.map(jnp.sum, fn(*args))
                   if False else compiled(*args))
    t2 = time.perf_counter()
    best = 1e9
    for _ in range(2):
        t3 = time.perf_counter()
        np.asarray(compiled(*args))
        best = min(best, time.perf_counter() - t3)
    log(f"{name}: compile {t1-t0:.1f}s first {t2-t1:.1f}s "
        f"steady {best*1e3:.0f} ms")


def main():
    which = sys.argv[1]
    rng = np.random.default_rng(0)
    rows0 = NT[0] * EXT[0]
    rows1 = NT[1] * EXT[1]
    rows2 = NT[2] * EXT[2]

    if which == "transpose":
        t = jnp.asarray(rng.standard_normal(
            NT + (B2,) + EXT).astype(np.float32))
        def f(x):
            perm = [3]
            for d in range(3):
                perm.extend([d, 4 + d])
            y = jnp.transpose(x, perm)
            return jnp.sum(y.reshape(B2, rows0, rows1, rows2))
        timed("transpose7d", f, t)

    elif which in ("dot1", "dot_hi", "dotlast"):
        x = jnp.asarray(rng.standard_normal(
            (B2, rows0, rows1, rows2)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal(
            (rows0, N)).astype(np.float32))
        wl = jnp.asarray(rng.standard_normal(
            (rows2, N)).astype(np.float32))
        prec = HI if which != "dot1" else jax.lax.Precision.DEFAULT
        if which == "dotlast":
            def f(x, w):
                return jnp.sum(jnp.tensordot(
                    x, w, axes=[[3], [0]], precision=HI))
            timed("dot last-axis HIGHEST", f, x, wl)
        else:
            def f(x, w):
                return jnp.sum(jnp.tensordot(
                    x, w, axes=[[1], [0]], precision=prec))
            timed(f"dot axis1 {which}", f, x, w)

    elif which == "chain":
        x = jnp.asarray(rng.standard_normal(
            (B2, rows0, rows1, rows2)).astype(np.float32))
        ws = [jnp.asarray(rng.standard_normal(
            (r, N)).astype(np.float32)) for r in (rows0, rows1, rows2)]
        def f(x, w0, w1, w2):
            for d, w in enumerate((w0, w1, w2)):
                x = jnp.moveaxis(jnp.tensordot(
                    x, w, axes=[[1 + d], [0]], precision=HI), -1, 1 + d)
            return jnp.sum(x)
        timed("3-axis chain HIGHEST", f, x, *ws)

    elif which == "clean":
        # plain (unfused) chain on power-of-two fine dims 256^3
        x = jnp.asarray(rng.standard_normal(
            (B2, 256, 256, 256)).astype(np.float32))
        ws = [jnp.asarray(rng.standard_normal(
            (256, N)).astype(np.float32)) for _ in range(3)]
        def f(x, w0, w1, w2):
            for d, w in enumerate((w0, w1, w2)):
                x = jnp.moveaxis(jnp.tensordot(
                    x, w, axes=[[1 + d], [0]], precision=HI), -1, 1 + d)
            return jnp.sum(x)
        timed("clean 256^3 chain HIGHEST", f, x, *ws)

    elif which == "cleanup":
        # plain expansion chain (t2 direction): 128^3 -> 256^3
        x = jnp.asarray(rng.standard_normal(
            (B2, N, N, N)).astype(np.float32))
        ws = [jnp.asarray(rng.standard_normal(
            (N, 256)).astype(np.float32)) for _ in range(3)]
        def f(x, w0, w1, w2):
            for d, w in enumerate((w0, w1, w2)):
                x = jnp.moveaxis(jnp.tensordot(
                    x, w, axes=[[1 + d], [0]], precision=HI), -1, 1 + d)
            return jnp.sum(x)
        timed("clean t2 128->256 chain HIGHEST", f, x, *ws)

    elif which == "square":
        # t2 as zero-pad + square per-axis DFT: [*,256] x [256,256]
        x = jnp.asarray(rng.standard_normal(
            (B2, 256, 256, 256)).astype(np.float32))
        ws = [jnp.asarray(rng.standard_normal(
            (256, 256)).astype(np.float32)) for _ in range(3)]
        def f(x, w0, w1, w2):
            for d, w in enumerate((w0, w1, w2)):
                x = jnp.moveaxis(jnp.tensordot(
                    x, w, axes=[[1 + d], [0]], precision=HI), -1, 1 + d)
            return jnp.sum(x)
        timed("square 256^3 chain HIGHEST", f, x, *ws)

    elif which in ("oadd", "extend", "embed", "fold"):
        sys.path.insert(0, ".")
        from tensorflow_nufft_tpu.kernels import binning
        from tensorflow_nufft_tpu.plan.plan import PlanSpec, make_plan
        spec = PlanSpec("type_1", "forward", 3, (128,) * 3,
                        "complex64", 1e-6, 0)
        plan = make_plan(spec)
        geom = binning.choose_geometry(plan.fine_shape, 7, 800_000)
        if which == "oadd":
            t = jnp.asarray(rng.standard_normal(
                geom.tiles + (B2,) + geom.ext).astype(np.float32))
            timed("overlap_add", lambda x: jnp.sum(
                binning.overlap_add(x, geom)), t)
        elif which == "extend":
            f = jnp.asarray(rng.standard_normal(
                (B2,) + plan.fine_shape).astype(np.float32))
            timed("extend_tiles", lambda x: jnp.sum(
                binning.extend_tiles(x, geom)), f)
        elif which == "embed":
            from tensorflow_nufft_tpu.fft.planar_fft import _amplify_embed
            m = jnp.asarray(rng.standard_normal(
                (1, 128, 128, 128, 2)).astype(np.float32))
            timed("_amplify_embed", lambda x: jnp.sum(
                _amplify_embed(x, plan)), m)
        elif which == "fold":
            x = jnp.asarray(rng.standard_normal(
                (1, 256, 256, 256, 2)).astype(np.float32))
            timed("fold moveaxis", lambda v: jnp.sum(
                jnp.moveaxis(v, -1, 1).reshape((2,) + plan.fine_shape)),
                x)

    elif which == "slab":
        # scan over nt0 slabs: [E0-slab, rows1, rows2] dots
        x = jnp.asarray(rng.standard_normal(
            (NT[0], B2, EXT[0], rows1, rows2)).astype(np.float32))
        w0 = jnp.asarray(rng.standard_normal(
            (NT[0], EXT[0], N)).astype(np.float32))
        def f(x, w0):
            def body(carry, xs):
                xi, wi = xs
                return carry + jnp.tensordot(
                    xi, wi, axes=[[1], [0]], precision=HI), 0.
            init = jnp.zeros((B2, rows1, rows2, N), jnp.float32)
            acc, _ = jax.lax.scan(body, init, (x, w0))
            return jnp.sum(acc)
        timed("slab-scan axis0 HIGHEST", f, x, w0)


if __name__ == "__main__":
    main()

"""Isolate the 3.4us fixed per-visit cost: load? dot? elementwise? reduce?"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import sys
sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRID = 64
N_VISIT = 128


def timeit(fn, *a, n=10):
    out = fn(*a)
    np.asarray(out.ravel()[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a)
        np.asarray(out.ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    frames = jnp.asarray(np.random.rand(256, 4, 384).astype(np.float32) * 0.1)
    fr_spec = pl.BlockSpec((256, 4, 384), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))
    out_shape = jax.ShapeDtypeStruct((GRID, 8, 128), jnp.float32)

    def bench(name, kern, n_inner=N_VISIT):
        out = pl.pallas_call(kern, grid=(GRID,), out_shape=out_shape,
                             in_specs=[fr_spec], out_specs=out_spec)
        s = timeit(jax.jit(lambda fr: out(fr)), frames)
        print(f"{name:34s} {s*1e3:8.2f} ms  "
              f"{s/(GRID*n_inner)*1e9:8.1f} ns/iter", flush=True)

    # G: dynamic-slice load only (reduce to keep it live)
    def kern_g(fr_ref, o_ref):
        def body(it, acc):
            lw = fr_ref[pl.ds(it % 256, 1), :, :][0]
            return acc + lw[0, 0]
        acc = jax.lax.fori_loop(0, N_VISIT, body, jnp.float32(0.0))
        o_ref[0] = jnp.full((8, 128), acc)
    bench("G dyn load only", kern_g)

    # H: dyn load + dot, no elementwise chain
    def kern_h(fr_ref, o_ref):
        o4 = jnp.ones((4, 1024), jnp.float32)
        dims = (((0,), (0,)), ((), ()))
        def body(it, acc):
            lw = fr_ref[pl.ds(it % 256, 1), :, :][0]
            ol = jax.lax.dot_general(lw, o4, dims,
                                     preferred_element_type=jnp.float32)
            return acc + ol[0, 0]
        acc = jax.lax.fori_loop(0, N_VISIT, body, jnp.float32(0.0))
        o_ref[0] = jnp.full((8, 128), acc)
    bench("H dyn load + 1 dot", kern_h)

    # H2: static load + dot
    def kern_h2(fr_ref, o_ref):
        o4 = jnp.ones((4, 1024), jnp.float32)
        dims = (((0,), (0,)), ((), ()))
        lw = fr_ref[0]
        def body(it, acc):
            ol = jax.lax.dot_general(lw + acc, o4, dims,
                                     preferred_element_type=jnp.float32)
            return acc + ol[0, 0] * 1e-9
        acc = jax.lax.fori_loop(0, N_VISIT, body, jnp.float32(0.0))
        o_ref[0] = jnp.full((8, 128), acc)
    bench("H2 static + 1 dot", kern_h2)

    # I: dyn load + 2 dots + elementwise, NO min-reduce (keep [128,1024] out)
    def kern_i(fr_ref, o_ref):
        o4 = jnp.ones((4, 1024), jnp.float32)
        d4 = jnp.ones((4, 1024), jnp.float32) * 0.5
        dims = (((0,), (0,)), ((), ()))
        F = 128
        def body(it, best):
            lw = fr_ref[pl.ds(it % 256, 1), :, :][0]
            ol = jax.lax.dot_general(lw, o4, dims,
                                     preferred_element_type=jnp.float32)
            dl = jax.lax.dot_general(lw, d4, dims,
                                     preferred_element_type=jnp.float32)
            t = -ol[2 * F:] / (dl[2 * F:] + 1e-7)
            b1 = ol[0:F] + t * dl[0:F]
            b2 = ol[F:2 * F] + t * dl[F:2 * F]
            ok = jnp.minimum(jnp.minimum(b1, b2), 1.0 - b1 - b2) >= 0.0
            return best + jnp.where(ok, t, 0.0)
        best = jax.lax.fori_loop(0, N_VISIT, body,
                                 jnp.zeros((128, 1024)))
        o_ref[0] = best[0:8, 0:128]
    bench("I full visit no reduce", kern_i)

    # J: just the min-reduce over sublanes in a loop
    def kern_j(fr_ref, o_ref):
        big = jnp.ones((128, 1024), jnp.float32)
        def body(it, acc):
            m = jnp.min(big + acc, axis=0, keepdims=True)
            return acc + m[0, 0] * 1e-9
        acc = jax.lax.fori_loop(0, N_VISIT, body, jnp.float32(0.0))
        o_ref[0] = jnp.full((8, 128), acc)
    bench("J min-reduce 128x1024", kern_j)

    # K: elementwise chain only on [128,1024] (no dot, no load)
    def kern_k(fr_ref, o_ref):
        a = jnp.ones((128, 1024), jnp.float32)
        b = jnp.ones((128, 1024), jnp.float32) * 0.5
        def body(it, acc):
            t = -(a + acc) / (b + 1e-7)
            b1 = a + t * b
            b2 = b + t * a
            ok = jnp.minimum(jnp.minimum(b1, b2), 1.0 - b1 - b2) >= 0.0
            return acc + jnp.where(ok, t, 0.0)[0, 0] * 1e-9
        acc = jax.lax.fori_loop(0, N_VISIT, body, jnp.float32(0.0))
        o_ref[0] = jnp.full((8, 128), acc)
    bench("K elementwise 128x1024", kern_k)


if __name__ == "__main__":
    main()

"""Measure Mosaic serial-iteration overheads: what does one while/fori
iteration cost with various body shapes? Informs the traversal design."""
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

N_ITER = 2048
GRID = 64


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


def run(name, kern, extra_in=(), extra_specs=()):
    out = pl.pallas_call(
        kern,
        grid=(GRID,),
        out_shape=jax.ShapeDtypeStruct((GRID, 8, 128), jnp.float32),
        in_specs=list(extra_specs),
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
    )
    f = jax.jit(lambda *a: out(*a))
    s = timeit(f, *extra_in)
    per_iter = s / (GRID * N_ITER)
    print(f"{name:30s} {s*1e3:8.2f} ms  {per_iter*1e9:8.1f} ns/iter",
          flush=True)


def main():
    tab = jnp.asarray(np.random.rand(2048, 128).astype(np.float32))
    tab_spec = pl.BlockSpec((2048, 128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    frames = jnp.asarray(np.random.rand(64, 4, 384).astype(np.float32))
    fr_spec = pl.BlockSpec((64, 4, 384), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)

    # A: empty while loop
    def kern_a(o_ref):
        def body(s):
            return s[0] + 1, s[1]
        def cond(s):
            return s[0] < N_ITER
        it, acc = jax.lax.while_loop(cond, body,
                                     (jnp.int32(0), jnp.zeros((8, 128))))
        o_ref[0] = acc
    run("while empty", kern_a)

    # B: while + dynamic row slice + slab-ish + any reduce
    def kern_b(tab_ref, o_ref):
        def body(s):
            it, acc = s
            row = tab_ref[pl.ds(it % 2048, 1), :]
            x = (row[0, 0] - acc) * (row[0, 1] + 1.0)
            y = (row[0, 2] - acc) * (row[0, 3] + 1.0)
            hit = jnp.maximum(x, y) > 0.5
            acc = jnp.where(hit, acc + 1e-6, acc)
            return it + 1, acc
        def cond(s):
            return s[0] < N_ITER
        it, acc = jax.lax.while_loop(cond, body,
                                     (jnp.int32(0), jnp.zeros((8, 128))))
        o_ref[0] = acc
    run("while rowslice+slab", kern_b, (tab,), (tab_spec,))

    # B2: + any() in loop condition (reduction in chain)
    def kern_b2(tab_ref, o_ref):
        def body(s):
            it, acc = s
            row = tab_ref[pl.ds(it % 2048, 1), :]
            x = (row[0, 0] - acc) * (row[0, 1] + 1.0)
            acc = jnp.where(x > 0.5, acc + 1e-6, acc)
            return it + 1, acc
        def cond(s):
            return jnp.logical_and(s[0] < N_ITER, jnp.max(s[1]) < 1e9)
        it, acc = jax.lax.while_loop(cond, body,
                                     (jnp.int32(0), jnp.zeros((8, 128))))
        o_ref[0] = acc
    run("while + reduce-in-cond", kern_b2, (tab,), (tab_spec,))

    # C: fori static trip count, same body
    def kern_c(tab_ref, o_ref):
        def body(it, acc):
            row = tab_ref[pl.ds(it % 2048, 1), :]
            x = (row[0, 0] - acc) * (row[0, 1] + 1.0)
            y = (row[0, 2] - acc) * (row[0, 3] + 1.0)
            hit = jnp.maximum(x, y) > 0.5
            return jnp.where(hit, acc + 1e-6, acc)
        acc = jax.lax.fori_loop(0, N_ITER, body, jnp.zeros((8, 128)))
        o_ref[0] = acc
    run("fori rowslice+slab", kern_c, (tab,), (tab_spec,))

    # D: fori + argmin/select chain (the current select_min pattern)
    def kern_d(tab_ref, o_ref):
        def body(it, s):
            dist, acc = s
            c = jnp.argmin(dist[0]).astype(jnp.int32)
            dist = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == c,
                jnp.inf, dist)
            row = tab_ref[pl.ds(c, 1), :]
            acc = acc + row[0, 0]
            return dist, acc
        dist = jnp.ones((1, 128)) * jnp.arange(128)[None, :]
        dist, acc = jax.lax.fori_loop(0, N_ITER // 16, body,
                                      (dist, jnp.zeros((8, 128))))
        o_ref[0] = acc
    out = pl.pallas_call(
        kern_d, grid=(GRID,),
        out_shape=jax.ShapeDtypeStruct((GRID, 8, 128), jnp.float32),
        in_specs=[tab_spec],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)))
    f = jax.jit(lambda t: out(t))
    s = timeit(f, tab)
    print(f"{'fori argmin-chain':30s} {s*1e3:8.2f} ms  "
          f"{s/(GRID*N_ITER//16)*1e9:8.1f} ns/iter", flush=True)

    # E: fori + cond-visit with 128x1024 projection (always taken)
    def kern_e(tab_ref, fr_ref, o_ref):
        o4 = jnp.ones((4, 1024), jnp.float32)
        def body(it, acc):
            lw = fr_ref[pl.ds(it % 64, 1), :, :][0]
            dims = (((0,), (0,)), ((), ()))
            ol = jax.lax.dot_general(lw, o4, dims,
                                     preferred_element_type=jnp.float32)
            t = ol[0:128] * ol[128:256] + ol[256:384]
            m = jnp.min(jnp.where(t > 0.5, t, 1e30), axis=0, keepdims=True)
            return acc + m.reshape(1, 8, 128)[0]
        acc = jax.lax.fori_loop(0, N_ITER // 16, body, jnp.zeros((8, 128)))
        o_ref[0] = acc
    out = pl.pallas_call(
        kern_e, grid=(GRID,),
        out_shape=jax.ShapeDtypeStruct((GRID, 8, 128), jnp.float32),
        in_specs=[tab_spec, fr_spec],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)))
    f = jax.jit(lambda t, fr: out(t, fr))
    s = timeit(f, tab, frames)
    print(f"{'fori 128x1024 projection':30s} {s*1e3:8.2f} ms  "
          f"{s/(GRID*N_ITER//16)*1e9:8.1f} ns/visit", flush=True)

    # F: same projection visit but wrapped in lax.cond (taken)
    def kern_f(tab_ref, fr_ref, o_ref):
        o4 = jnp.ones((4, 1024), jnp.float32)
        def body(it, acc):
            def visit(acc):
                lw = fr_ref[pl.ds(it % 64, 1), :, :][0]
                dims = (((0,), (0,)), ((), ()))
                ol = jax.lax.dot_general(lw, o4, dims,
                                         preferred_element_type=jnp.float32)
                t = ol[0:128] * ol[128:256] + ol[256:384]
                m = jnp.min(jnp.where(t > 0.5, t, 1e30), axis=0,
                            keepdims=True)
                return acc + m.reshape(1, 8, 128)[0]
            return jax.lax.cond(tab_ref[pl.ds(it % 2048, 1), :][0, 0] >= 0.0,
                                visit, lambda a: a, acc)
        acc = jax.lax.fori_loop(0, N_ITER // 16, body, jnp.zeros((8, 128)))
        o_ref[0] = acc
    out = pl.pallas_call(
        kern_f, grid=(GRID,),
        out_shape=jax.ShapeDtypeStruct((GRID, 8, 128), jnp.float32),
        in_specs=[tab_spec, fr_spec],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)))
    f = jax.jit(lambda t, fr: out(t, fr))
    s = timeit(f, tab, frames)
    print(f"{'fori cond(projection)':30s} {s*1e3:8.2f} ms  "
          f"{s/(GRID*N_ITER//16)*1e9:8.1f} ns/visit", flush=True)


if __name__ == "__main__":
    main()

"""Isolate the cost of one cluster visit under different tilings, and of
candidate-selection patterns that avoid argmin."""
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


def report(name, s, n_inner):
    print(f"{name:34s} {s*1e3:8.2f} ms  {s/(GRID*n_inner)*1e9:8.1f} ns/visit",
          flush=True)


def projection_visit(lw, o4, d4, near, limit, F):
    """lw [4, 3F]; o4/d4 [4, B]; rows [1, B]. Returns new best [1, B]."""
    dims = (((0,), (0,)), ((), ()))
    ol = jax.lax.dot_general(lw, o4, dims, preferred_element_type=jnp.float32)
    dl = jax.lax.dot_general(lw, d4, dims, preferred_element_type=jnp.float32)
    olx, oly, olz = ol[0:F], ol[F:2 * F], ol[2 * F:]
    dlx, dly, dlz = dl[0:F], dl[F:2 * F], dl[2 * F:]
    dlz = dlz + jnp.where(jnp.abs(dlz) < 1e-7, 1e-7, 0.0)
    t = -olz / dlz
    b1 = olx + t * dlx
    b2 = oly + t * dly
    valid = ((jnp.minimum(jnp.minimum(b1, b2), 1.0 - b1 - b2) >= 0.0)
             & (t > near) & (t < limit))
    tm = jnp.where(valid, t, 1e30)
    return jnp.min(tm, axis=0, keepdims=True)


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
        report(name, s, n_inner)

    # A: monolithic [128, 1024] visit (current design)
    def kern_a(fr_ref, o_ref):
        o4 = jnp.ones((4, 1024), jnp.float32)
        d4 = jnp.ones((4, 1024), jnp.float32) * 0.5
        near = jnp.zeros((1, 1024))
        def body(it, best):
            lw = fr_ref[pl.ds(it % 256, 1), :, :][0]
            m = projection_visit(lw, o4, d4, near, best, 128)
            return jnp.minimum(best, m)
        best = jax.lax.fori_loop(0, N_VISIT, body,
                                 jnp.full((1, 1024), 1e30))
        o_ref[0] = best.reshape(8, 128)
    bench("mono 128x1024", kern_a)

    # B: sub-tiled: fori over 4 column chunks of 256 lanes
    def kern_b(fr_ref, o_ref):
        o4 = jnp.ones((4, 1024), jnp.float32)
        d4 = jnp.ones((4, 1024), jnp.float32) * 0.5
        near = jnp.zeros((1, 256))
        def body(it, best):
            lw = fr_ref[pl.ds(it % 256, 1), :, :][0]
            outs = []
            for q in range(4):
                sl = slice(256 * q, 256 * (q + 1))
                m = projection_visit(lw, o4[:, sl], d4[:, sl], near,
                                     best[:, sl], 128)
                outs.append(m)
            return jnp.minimum(best, jnp.concatenate(outs, axis=1))
        best = jax.lax.fori_loop(0, N_VISIT, body,
                                 jnp.full((1, 1024), 1e30))
        o_ref[0] = best.reshape(8, 128)
    bench("subtiled 4x[128x256]", kern_b)

    # C: 64-tri cluster against 1024 rays (frames sliced to [4, 192])
    def kern_c(fr_ref, o_ref):
        o4 = jnp.ones((4, 1024), jnp.float32)
        d4 = jnp.ones((4, 1024), jnp.float32) * 0.5
        near = jnp.zeros((1, 1024))
        def body(it, best):
            lw = fr_ref[pl.ds(it % 256, 1), :, 0:192][0]
            m = projection_visit(lw, o4, d4, near, best, 64)
            return jnp.minimum(best, m)
        best = jax.lax.fori_loop(0, N_VISIT, body,
                                 jnp.full((1, 1024), 1e30))
        o_ref[0] = best.reshape(8, 128)
    bench("mono 64x1024", kern_c)

    # D: 32-tri cluster against 1024 rays
    def kern_d(fr_ref, o_ref):
        o4 = jnp.ones((4, 1024), jnp.float32)
        d4 = jnp.ones((4, 1024), jnp.float32) * 0.5
        near = jnp.zeros((1, 1024))
        def body(it, best):
            lw = fr_ref[pl.ds(it % 256, 1), :, 0:96][0]
            m = projection_visit(lw, o4, d4, near, best, 32)
            return jnp.minimum(best, m)
        best = jax.lax.fori_loop(0, N_VISIT, body,
                                 jnp.full((1, 1024), 1e30))
        o_ref[0] = best.reshape(8, 128)
    bench("mono 32x1024", kern_d)

    # E: selection pattern: masked-reduce extract of rank-k candidate
    def kern_e(fr_ref, o_ref):
        rank = jnp.asarray(np.random.permutation(128)[None, :].astype(np.int32))
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        def body(it, acc):
            c = jnp.sum(jnp.where(rank == it, ids, 0))
            row = fr_ref[pl.ds(c % 256, 1), 0, :]
            return acc + row[0, 0]
        acc = jax.lax.fori_loop(0, N_VISIT, body, jnp.float32(0.0))
        o_ref[0] = jnp.full((8, 128), acc)
    bench("rank-extract select", kern_e)

    # F: rank computation cost (all-pairs compare, once per block)
    def kern_f(fr_ref, o_ref):
        def body(it, acc):
            dist = fr_ref[pl.ds(it % 256, 1), 0, 0:128] + acc
            dc = dist.reshape(128, 1) * jnp.ones((1, 128))
            dr = dist.reshape(1, 128) * jnp.ones((128, 1))
            lt = (dc < dr).astype(jnp.float32)
            rank = jnp.sum(lt, axis=0, keepdims=True)
            return acc + rank[0, 0] * 1e-9
        acc = jax.lax.fori_loop(0, 32, body, jnp.float32(0.0))
        o_ref[0] = jnp.full((8, 128), acc)
    bench("rank-compute 128 (per 32)", kern_f, n_inner=32)


if __name__ == "__main__":
    main()

"""Per-stage device timings for the render pipeline (VERDICT r2 item 1).

Times each pipeline stage in isolation on the real chip: dense projection at
several triangle counts, the Pallas traversal kernels, ray sorting, and full
bounce steps per scene. Prints one JSON line per measurement to stdout.

Usage:
    python tools/stagebench.py [--scene NAME] [--stages a,b,c]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

R = 512 * 512


def timeit(fn, *args, n=20, warmup=2):
    """Median wall time of fn(*args) with a real fetch to prove completion."""
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf.ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def emit(name, seconds, **kw):
    rec = {"stage": name, "ms": round(seconds * 1e3, 3), **kw}
    print(json.dumps(rec), flush=True)
    return rec


def rand_rays(key, r=R):
    k1, k2 = jax.random.split(key)
    o = jax.random.uniform(k1, (r, 3), jnp.float32, -1.0, 1.0)
    d = jax.random.normal(k2, (r, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def bench_dense():
    from rayzath_tpu.ops.intersect import project_closest, triangle_frames
    key = jax.random.key(0)
    o, d = rand_rays(key)
    near = jnp.zeros(R)
    far = jnp.full(R, 1e30)
    for f in (512, 2048, 8192):
        v0 = np.random.default_rng(0).uniform(-1, 1, (f, 3)).astype(np.float32)
        e1 = np.random.default_rng(1).uniform(-.1, .1, (f, 3)).astype(np.float32)
        e2 = np.random.default_rng(2).uniform(-.1, .1, (f, 3)).astype(np.float32)
        w, c = triangle_frames(v0, e1, e2)
        fn = jax.jit(lambda o, d, n, fr, w=jnp.asarray(w), c=jnp.asarray(c):
                     project_closest(o, d, n, fr, w, c, chunk=512))
        s = timeit(fn, o, d, near, far)
        emit(f"project_closest_F{f}", s, rays=R,
             mrays_per_s=round(R / s / 1e6, 2))


def bench_sort():
    from rayzath_tpu.ops.sort_rays import sort_perm
    key = jax.random.key(1)
    o, d = rand_rays(key)
    fn = jax.jit(lambda o, d: sort_perm(o, d))
    s = timeit(fn, o, d)
    emit("sort_perm", s, rays=R)

    # sort + permute 2 vec3 + scatter back of 2 outputs (the full overhead)
    def full(o, d):
        perm, inv = sort_perm(o, d)
        o2, d2 = o[perm], d[perm]
        t = o2[:, 0] + d2[:, 0]
        i = (o2[:, 1] > 0).astype(jnp.int32)
        return t[inv], i[inv]
    s = timeit(jax.jit(full), o, d)
    emit("sort_permute_scatter", s, rays=R)


def scene_tables(name):
    import rayzath_tpu as rz
    from rayzath_tpu.models.device_scene import compile_world
    world = rz.scenes.SCENES[name](512, 512)
    return compile_world(world)


def bench_cluster(name="mesh_heavy"):
    from rayzath_tpu.ops.traverse_cluster import (build_cluster_tables,
                                                  cluster_closest)
    scene = scene_tables(name)
    v0 = np.asarray(scene.tri_v0)
    e1 = np.asarray(scene.tri_e1)
    e2 = np.asarray(scene.tri_e2)
    box, lw, order, base, count = build_cluster_tables(v0, e1, e2)
    key = jax.random.key(2)
    o, d = rand_rays(key)
    near = jnp.zeros(R)
    far = jnp.full(R, 1e30)
    box, lw, order = jnp.asarray(box), jnp.asarray(lw), jnp.asarray(order)
    fn = jax.jit(lambda o, d, n, f: cluster_closest(o, d, n, f, box, lw,
                                                    order))
    s = timeit(fn, o, d, near, far, n=10)
    emit(f"cluster_closest_{name}_incoherent", s, tris=int(v0.shape[0]),
         clusters=int(lw.shape[0]), mrays_per_s=round(R / s / 1e6, 2))


def bench_bounce(name):
    import rayzath_tpu as rz
    from rayzath_tpu.models.device_scene import compile_world, compile_camera
    from rayzath_tpu.engine.state import init_state
    from rayzath_tpu.engine.integrator import render_steps_preserve
    world = rz.scenes.SCENES[name](512, 512)
    cfg = rz.RenderConfig(tracing=rz.Tracing(max_depth=8, rpp=8))
    scene = compile_world(world)
    cam = compile_camera(world.cameras[0])
    key = jax.random.key(0)
    state = init_state(512, 512)
    t0 = time.perf_counter()
    fn = lambda st: render_steps_preserve(scene, cam, cfg, st, key, 8)
    out = fn(state)
    np.asarray(out.accum[0, 0])
    emit(f"bounce8_{name}_warmup", time.perf_counter() - t0)
    s = timeit(fn, state, n=5)
    emit(f"bounce8_{name}", s, per_bounce_ms=round(s / 8 * 1e3, 3),
         rays_per_s_equiv=round(R * 8 / s / 1e6, 2),
         tris=int(scene.n_triangles))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="dense,sort,cluster,bounce")
    ap.add_argument("--scene", default="teapot_like")
    args = ap.parse_args()
    stages = args.stages.split(",")
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    if "dense" in stages:
        bench_dense()
    if "sort" in stages:
        bench_sort()
    if "cluster" in stages:
        bench_cluster()
    if "bounce" in stages:
        bench_bounce(args.scene)


if __name__ == "__main__":
    main()

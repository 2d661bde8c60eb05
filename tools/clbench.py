"""Quick cluster-kernel microbench on the real chip."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import sys
sys.path.insert(0, "/root/repo")
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

R = 512 * 512


def timeit(fn, *a, n=5):
    out = fn(*a)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def tile(x):
    rest = x.shape[1:]
    x = x.reshape(16, 32, 16, 32, *rest)
    return x.transpose(0, 2, 1, 3, *range(4, 4 + len(rest))).reshape(R, *rest)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="teapot_like")
    ap.add_argument("--mode", default="primary,incoherent")
    args = ap.parse_args()

    import rayzath_tpu as rz
    from rayzath_tpu.models.device_scene import compile_world, compile_camera
    from rayzath_tpu.ops.traverse_cluster import (build_cluster_tables,
                                                  cluster_closest)
    from rayzath_tpu.ops import camera as cam_ops

    world = rz.scenes.SCENES[args.scene](512, 512)
    scene = compile_world(world)
    v0 = np.asarray(scene.tri_v0)
    e1 = np.asarray(scene.tri_e1)
    e2 = np.asarray(scene.tri_e2)
    t0 = time.perf_counter()
    box, frames, order, base, count = build_cluster_tables(v0, e1, e2)
    print(f"{args.scene}: tris={v0.shape[0]} clusters={frames.shape[0]} "
          f"build_s={time.perf_counter()-t0:.2f}", flush=True)
    box, frames, order = jnp.asarray(box), jnp.asarray(frames), jnp.asarray(order)
    near = jnp.zeros(R)
    far = jnp.full(R, 1e30)
    fn = jax.jit(lambda o, d, n, f: cluster_closest(o, d, n, f, box, frames,
                                                    order))

    if "primary" in args.mode:
        cam = compile_camera(world.cameras[0])
        pix = cam_ops.pixel_grid(512, 512, 0)
        u = jax.random.uniform(jax.random.key(1), (R, 4), jnp.float32)
        co, cd = cam_ops.generate_rays(cam, pix, u)
        co_t, cd_t = tile(co), tile(cd)
        t0 = time.perf_counter()
        out = fn(co_t, cd_t, near, far)
        np.asarray(out[0][0])
        print(f"  compile+first: {time.perf_counter()-t0:.2f}s", flush=True)
        s = timeit(fn, co_t, cd_t, near, far)
        print(f"  primary tiled: {s*1e3:.2f} ms  {R/s/1e6:.1f} Mray/s",
              flush=True)
        hits = int(np.asarray(out[1] >= 0).sum())
        print(f"  hit fraction: {hits/R:.3f}", flush=True)

    if "incoherent" in args.mode:
        k1, k2 = jax.random.split(jax.random.key(0))
        o = jax.random.uniform(k1, (R, 3), jnp.float32, -1.0, 1.0)
        d = jax.random.normal(k2, (R, 3), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        s = timeit(fn, o, d, near, far, n=3)
        print(f"  incoherent: {s*1e3:.2f} ms  {R/s/1e6:.1f} Mray/s",
              flush=True)


if __name__ == "__main__":
    main()

"""Per-call traversal timings on the real chip, by wavefront type.

Times cluster_closest / cluster_shadow (and the instanced twins) separately
on (a) camera rays (tiled), (b) bounce-like random rays, (c) bounce-like rays
permuted by each sort key — the decomposition that tells which call type and
which coherence regime eats the render budget.

Usage: python tools/kbench.py --scene mesh_heavy [--stages closest,shadow]
"""
import argparse, json, os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np

R = 512 * 512


def timeit(fn, *args, n=10):
    """Per-call seconds, amortized over n async dispatches with ONE final
    fetch (the tunneled chip costs ~26 ms per device->host fetch, so
    per-call fetches would swamp any call cheaper than that)."""
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    total = time.perf_counter() - t0
    return max(total - 0.026, 1e-9) / n


def emit(name, s, **kw):
    print(json.dumps({"stage": name, "ms": round(s * 1e3, 3), **kw}), flush=True)


def wavefronts(scene_name):
    import rayzath_tpu as rz
    from rayzath_tpu.models.device_scene import compile_world, compile_camera
    from rayzath_tpu.ops import camera as cam_ops
    from rayzath_tpu.engine.integrator import _tile
    world = rz.scenes.SCENES[scene_name](512, 512)
    scene = compile_world(world)
    cam = compile_camera(world.cameras[0])
    pix = cam_ops.pixel_grid(512, 512, 0)
    u = jax.random.uniform(jax.random.key(1), (R, 4), jnp.float32)
    co, cd = cam_ops.generate_rays(cam, pix, u)
    co_t = _tile(co, (512, 512))
    cd_t = _tile(cd, (512, 512))
    # bounce-like: origins near primary hit shell, cosine-ish dirs
    rng = np.random.default_rng(0)
    o2 = np.asarray(co) + np.asarray(cd) * 2.0
    d2 = rng.normal(size=(R, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    o2_t = _tile(jnp.asarray(o2), (512, 512))
    d2_t = _tile(jnp.asarray(d2), (512, 512))
    return scene, (co_t, cd_t), (o2_t, d2_t), (jnp.asarray(o2), jnp.asarray(d2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="mesh_heavy")
    ap.add_argument("--stages", default="closest,shadow,sorted")
    args = ap.parse_args()
    stages = args.stages.split(",")
    from rayzath_tpu.ops.traverse_cluster import (cluster_closest,
                                                  cluster_shadow,
                                                  cluster_closest_inst)
    from rayzath_tpu.ops.sort_rays import sort_perm

    scene, cam_rays, bnc_tiled, bnc_flat = wavefronts(args.scene)
    near = jnp.zeros(R)
    far = jnp.full(R, 1e30)
    dist = jnp.full(R, 1e30)

    if scene.two_level:
        def closest(o, d):
            return cluster_closest_inst(o, d, near, far, scene.ti_box,
                                        scene.ti_rows, scene.cl_obox,
                                        scene.cl_lw)
    else:
        def closest(o, d):
            return cluster_closest(o, d, near, far, scene.cl_box,
                                   scene.cl_lw, scene.cl_order)

    op_rgb = scene.mat_color[scene.tri_mat][:, :3]
    op_a = 1.0 - scene.mat_color[scene.tri_mat][:, 3]

    def shadow(o, d):
        return cluster_shadow(o, d, dist, scene.cl_box, scene.cl_lw,
                              scene.cl_order, scene.cl_base, scene.cl_count,
                              scene.tri_v0, scene.tri_e1, scene.tri_e2,
                              op_rgb, op_a)

    jc = jax.jit(closest)
    if "closest" in stages:
        emit(f"{args.scene}_closest_camera", timeit(jc, *cam_rays))
        emit(f"{args.scene}_closest_bounce", timeit(jc, *bnc_tiled))
    if "shadow" in stages and not scene.two_level:
        js = jax.jit(shadow)
        emit(f"{args.scene}_shadow_camera", timeit(js, *cam_rays))
        emit(f"{args.scene}_shadow_bounce", timeit(js, *bnc_tiled))
    if "sorted" in stages:
        def sorted_closest(o, d):
            perm, inv = sort_perm(o, d)
            t, tid = closest(o[perm], d[perm]) if not scene.two_level else \
                closest(o[perm], d[perm])[:2]
            return t[inv], tid[inv]
        emit(f"{args.scene}_closest_bounce_sorted",
             timeit(jax.jit(sorted_closest), *bnc_flat))


if __name__ == "__main__":
    main()

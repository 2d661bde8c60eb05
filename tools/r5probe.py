"""Round-5 kernel probe: per-call timings + real visit counts on the chip.

One subprocess per kernel variant (the variant knobs RZ_DOT / RZ_UNROLL /
RZ_KSTATS are read at import time); the orchestrating shell script runs them
sequentially so only one process touches the TPU. Emits one JSON line per
measurement.

Usage: python tools/r5probe.py [--scenes cornell_box,teapot_like,mesh_heavy]
                               [--stages closest,shadow,inst]
"""
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


def timeit(fn, *args, n=8):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    return max(time.perf_counter() - t0 - 0.026, 1e-9) / n


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="cornell_box,teapot_like,mesh_heavy")
    ap.add_argument("--stages", default="closest,shadow")
    args = ap.parse_args()
    stages = args.stages.split(",")

    import rayzath_tpu as rz
    from rayzath_tpu.models.device_scene import compile_world, compile_camera
    from rayzath_tpu.ops import camera as cam_ops
    from rayzath_tpu.engine.integrator import _tile
    from rayzath_tpu.ops.sort_rays import sort_perm
    import rayzath_tpu.ops.traverse_cluster as tc

    emit(variant=dict(dot=tc.DOT_MODE, unroll=tc.UNROLL, kstats=tc.KSTATS),
         device=str(jax.devices()[0]))

    near = jnp.zeros(R)
    far = jnp.full(R, 1e30)
    dist = jnp.full(R, 1e30)

    for scene_name in args.scenes.split(","):
        world = rz.scenes.SCENES[scene_name](512, 512)
        scene = compile_world(world)
        cam = compile_camera(world.cameras[0])
        pix = cam_ops.pixel_grid(512, 512, 0)
        u = jax.random.uniform(jax.random.key(1), (R, 4), jnp.float32)
        co, cd = cam_ops.generate_rays(cam, pix, u)
        rng = np.random.default_rng(0)
        o2 = np.asarray(co) + np.asarray(cd) * 2.0
        d2 = rng.normal(size=(R, 3)).astype(np.float32)
        d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
        o2, d2 = jnp.asarray(o2), jnp.asarray(d2)
        rays = {
            "camera": (_tile(co, (512, 512)), _tile(cd, (512, 512))),
            "bounce": (_tile(o2, (512, 512)), _tile(d2, (512, 512))),
        }
        if scene.two_level:
            if "inst" not in stages:
                continue
            def closest(o, d):
                return tc.cluster_closest_inst(
                    o, d, near, far, scene.ti_box, scene.ti_rows,
                    scene.cl_obox, scene.cl_lw)
            for reg, (o, d) in rays.items():
                s = timeit(jax.jit(closest), o, d)
                emit(stage=f"{scene_name}_closest_inst_{reg}",
                     ms=round(s * 1e3, 2))
            continue

        n_cl = int(scene.cl_lw.shape[0])

        def closest(o, d):
            return tc.cluster_closest(o, d, near, far, scene.cl_box,
                                      scene.cl_lw, scene.cl_order)

        def closest_sorted(o, d):
            perm, inv = sort_perm(o, d)
            t, tid = closest(o[perm], d[perm])
            return t[inv], tid[inv]

        if "closest" in stages:
            jc = jax.jit(closest)
            for reg, (o, d) in rays.items():
                s = timeit(jc, o, d)
                rec = dict(stage=f"{scene_name}_closest_{reg}",
                           ms=round(s * 1e3, 2), clusters=n_cl)
                if tc.KSTATS:
                    # re-run un-jitted wrapper once to surface the stats
                    closest(o, d)
                    v = np.asarray(tc._KS_LAST["visits"])
                    k = np.asarray(tc._KS_LAST["k"])
                    rec.update(visits_mean=round(float(v.mean()), 1),
                               visits_p90=float(np.percentile(v, 90)),
                               cand_mean=round(float(k.mean()), 1))
                emit(**rec)
            s = timeit(jax.jit(closest_sorted), o2, d2)
            rec = dict(stage=f"{scene_name}_closest_bounce_sorted",
                       ms=round(s * 1e3, 2), clusters=n_cl)
            if tc.KSTATS:
                perm, _ = sort_perm(o2, d2)
                closest(o2[perm], d2[perm])
                v = np.asarray(tc._KS_LAST["visits"])
                rec.update(visits_mean=round(float(v.mean()), 1),
                           visits_p90=float(np.percentile(v, 90)))
            emit(**rec)

        if "shadow" in stages:
            op_rgb = scene.mat_color[scene.tri_mat][:, :3]
            op_a = 1.0 - scene.mat_color[scene.tri_mat][:, 3]

            def shadow(o, d):
                return tc.cluster_shadow(
                    o, d, dist, scene.cl_box, scene.cl_lw, scene.cl_order,
                    scene.cl_base, scene.cl_count, scene.tri_v0,
                    scene.tri_e1, scene.tri_e2, op_rgb, op_a)

            js = jax.jit(shadow)
            for reg, (o, d) in rays.items():
                s = timeit(js, o, d)
                emit(stage=f"{scene_name}_shadow_{reg}", ms=round(s * 1e3, 2),
                     clusters=n_cl)


if __name__ == "__main__":
    main()

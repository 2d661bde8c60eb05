"""Round-5 probe batch 2: sort machinery cost, cutout pass cost, instanced
kernel baselines, sorted candidate counts. One process; run after r5probe.sh.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("RZ_KSTATS", "1")
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
    import rayzath_tpu as rz
    from rayzath_tpu.models.device_scene import compile_world, compile_camera
    from rayzath_tpu.ops import camera as cam_ops
    from rayzath_tpu.engine.integrator import _tile, texture_shadow_factor
    from rayzath_tpu.ops.sort_rays import (sort_perm, sort_payload,
                                           unsort_payload)
    import rayzath_tpu.ops.traverse_cluster as tc

    emit(batch=2, device=str(jax.devices()[0]))
    near = jnp.zeros(R)
    far = jnp.full(R, 1e30)
    dist = jnp.full(R, 1e30)
    rng = np.random.default_rng(0)
    o2 = jnp.asarray(rng.uniform(-2, 2, (R, 3)).astype(np.float32))
    d2 = rng.normal(size=(R, 3)).astype(np.float32)
    d2 = jnp.asarray(d2 / np.linalg.norm(d2, axis=1, keepdims=True))

    # --- sort machinery: old vs payload-carrying ---
    def old_sort(o, d, near, far):
        perm, inv = sort_perm(o, d)
        o_s, d_s = o[perm], d[perm]
        t = o_s[:, 0] + d_s[:, 0] + near[perm] + far[perm]
        i = (o_s[:, 1] > 0).astype(jnp.int32)
        return t[inv], i[inv]

    def new_sort(o, d, near, far):
        o_s, d_s, (n_s, f_s), idx = sort_payload(o, d, (near, far))
        t = o_s[:, 0] + d_s[:, 0] + n_s + f_s
        i = (o_s[:, 1] > 0).astype(jnp.int32)
        return unsort_payload(idx, (t, i))

    emit(stage="sort_old_roundtrip", ms=round(
        timeit(jax.jit(old_sort), o2, d2, near, far) * 1e3, 2))
    emit(stage="sort_payload_roundtrip", ms=round(
        timeit(jax.jit(new_sort), o2, d2, near, far) * 1e3, 2))

    # --- mesh_heavy sorted candidate count + payload-sorted end-to-end ---
    for scene_name in ("teapot_like", "mesh_heavy"):
        world = rz.scenes.SCENES[scene_name](512, 512)
        scene = compile_world(world)
        n_cl = int(scene.cl_lw.shape[0])

        def closest(o, d, near, far):
            return tc.cluster_closest(o, d, near, far, scene.cl_box,
                                      scene.cl_lw, scene.cl_order)

        def closest_psorted(o, d):
            o_s, d_s, (n_s, f_s), idx = sort_payload(o, d, (near, far))
            t, tid = closest(o_s, d_s, n_s, f_s)
            return unsort_payload(idx, (t, tid))

        s = timeit(jax.jit(closest_psorted), o2, d2)
        # stats pass (unjitted wrapper to surface KSTATS)
        o_s, d_s, (n_s, f_s), idx = sort_payload(o2, d2, (near, far))
        closest(o_s, d_s, n_s, f_s)
        v = np.asarray(tc._KS_LAST["visits"])
        k = np.asarray(tc._KS_LAST["k"])
        emit(stage=f"{scene_name}_closest_bounce_psorted", ms=round(s * 1e3, 2),
             clusters=n_cl, visits_mean=round(float(v.mean()), 1),
             cand_mean=round(float(k.mean()), 1),
             cand_p90=float(np.percentile(k, 90)))

        op_rgb = scene.mat_color[scene.tri_mat][:, :3]
        op_a = 1.0 - scene.mat_color[scene.tri_mat][:, 3]

        def shadow_psorted(o, d):
            o_s, d_s, (dist_s,), idx = sort_payload(o, d, (dist,))
            rgb, a = tc.cluster_shadow(
                o_s, d_s, dist_s, scene.cl_box, scene.cl_lw, scene.cl_order,
                scene.cl_base, scene.cl_count, scene.tri_v0, scene.tri_e1,
                scene.tri_e2, op_rgb, op_a)
            return unsort_payload(idx, (rgb, a))

        s = timeit(jax.jit(shadow_psorted), o2, d2)
        emit(stage=f"{scene_name}_shadow_bounce_psorted", ms=round(s * 1e3, 2))

    # --- textured_room: cutout dense pass vs kernel shadow ---
    world = rz.scenes.SCENES["textured_room"](512, 512)
    scene = compile_world(world)
    emit(stage="textured_room_info", n_cutout=int(scene.n_cutout),
         tris=int(scene.n_triangles))
    op_rgb = scene.mat_color[scene.tri_mat][:, :3]
    op_a = 1.0 - scene.mat_color[scene.tri_mat][:, 3]

    def shadow_only(o, d):
        return tc.cluster_shadow(o, d, dist, scene.cl_box, scene.cl_lw,
                                 scene.cl_order, scene.cl_base,
                                 scene.cl_count, scene.tri_v0, scene.tri_e1,
                                 scene.tri_e2, op_rgb, op_a)

    def cutpass(o, d):
        return texture_shadow_factor(scene, o, d, dist)

    cam = compile_camera(world.cameras[0])
    pix = cam_ops.pixel_grid(512, 512, 0)
    u = jax.random.uniform(jax.random.key(1), (R, 4), jnp.float32)
    co, cd = cam_ops.generate_rays(cam, pix, u)
    co_t, cd_t = _tile(co, (512, 512)), _tile(cd, (512, 512))
    emit(stage="textured_room_shadow_kernel_camera",
         ms=round(timeit(jax.jit(shadow_only), co_t, cd_t) * 1e3, 2))
    emit(stage="textured_room_cutpass_camera",
         ms=round(timeit(jax.jit(cutpass), co_t, cd_t) * 1e3, 2))

    # --- instanced_field baselines ---
    world = rz.scenes.SCENES["instanced_field"](512, 512)
    scene = compile_world(world)
    emit(stage="instanced_info", n_inst=int(scene.ti_rows.shape[0]),
         n_cl=int(scene.cl_lw.shape[0]))

    def closest_i(o, d):
        return tc.cluster_closest_inst(o, d, near, far, scene.ti_box,
                                       scene.ti_rows, scene.cl_obox,
                                       scene.cl_lw)

    def shadow_i(o, d):
        op_tab = tc.instance_opacity(scene.mat_color, scene.inst_slot_map)
        return tc._cluster_shadow_inst_impl(
            o, d, dist, scene.ti_box, scene.ti_rows, scene.cl_obox,
            scene.cl_lw, scene.cl_slot, op_tab)

    jc, js = jax.jit(closest_i), jax.jit(shadow_i)
    emit(stage="instanced_closest_camera",
         ms=round(timeit(jc, co_t, cd_t) * 1e3, 2))
    emit(stage="instanced_closest_bounce",
         ms=round(timeit(jc, o2, d2) * 1e3, 2))
    emit(stage="instanced_shadow_camera",
         ms=round(timeit(js, co_t, cd_t) * 1e3, 2))
    emit(stage="instanced_shadow_bounce",
         ms=round(timeit(js, o2, d2) * 1e3, 2))


if __name__ == "__main__":
    main()

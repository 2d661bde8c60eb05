"""Round-5 probe batch 4: textured_room decomposition + instanced kernels
with the vectorized per-instance cluster prefilter."""
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
    import rayzath_tpu as rz
    from rayzath_tpu.models.device_scene import compile_world, compile_camera
    from rayzath_tpu.ops import camera as cam_ops
    from rayzath_tpu.ops import texture as tex_ops
    from rayzath_tpu.engine.integrator import (_tile, bounce_step, mat_pack,
                                               material_fetch)
    from rayzath_tpu.engine.state import init_state
    from rayzath_tpu.engine.integrator import render_steps_preserve
    import rayzath_tpu.ops.traverse_cluster as tc

    emit(batch=4, device=str(jax.devices()[0]))
    near = jnp.zeros(R)
    far = jnp.full(R, 1e30)
    dist = jnp.full(R, 1e30)

    # --- textured_room: where does the wavefront go? ---
    world = rz.scenes.SCENES["textured_room"](512, 512)
    scene = compile_world(world)
    cam = compile_camera(world.cameras[0])
    cfg = rz.RenderConfig(tracing=rz.Tracing(max_depth=8, rpp=8))
    state = init_state(512, 512)
    key = jax.random.key(0)

    fn = lambda st: render_steps_preserve(scene, cam, cfg, st, key, 8)
    t0 = time.perf_counter()
    out = fn(state)
    np.asarray(out.accum[0, 0])
    emit(stage="textured_bounce8_warmup", s=round(time.perf_counter() - t0, 1))
    s = timeit(fn, state, n=3)
    emit(stage="textured_bounce8", ms=round(s * 1e3, 1),
         per_bounce_ms=round(s / 8 * 1e3, 2),
         mrays=round(R * 8 / s / 1e6, 2))

    # material_fetch alone (all 5 map kinds used in this scene)
    mp = mat_pack(scene)
    mid = jnp.zeros(R, jnp.int32) + 2
    uv = jax.random.uniform(jax.random.key(1), (R, 2))

    def mf(uv):
        m = material_fetch(scene, mp, mid, uv)
        return m.color_rgb

    emit(stage="textured_material_fetch", ms=round(
        timeit(jax.jit(mf), uv) * 1e3, 2))

    def tf(uv):
        return tex_ops.fetch_scene(scene, mid, uv)

    emit(stage="textured_single_fetch", ms=round(
        timeit(jax.jit(tf), uv) * 1e3, 2))

    # --- instanced_field with prefilter kernels ---
    world = rz.scenes.SCENES["instanced_field"](512, 512)
    scene = compile_world(world)
    cam = compile_camera(world.cameras[0])
    pix = cam_ops.pixel_grid(512, 512, 0)
    u = jax.random.uniform(jax.random.key(1), (R, 4), jnp.float32)
    co, cd = cam_ops.generate_rays(cam, pix, u)
    co_t, cd_t = _tile(co, (512, 512)), _tile(cd, (512, 512))
    rng = np.random.default_rng(0)
    o2 = np.asarray(co) + np.asarray(cd) * 2.0
    d2 = rng.normal(size=(R, 3)).astype(np.float32)
    d2 = jnp.asarray(d2 / np.linalg.norm(d2, axis=1, keepdims=True))
    o2 = jnp.asarray(o2)
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

    # sanity: instanced closest agrees with expanded brute force on-chip
    from rayzath_tpu.ops.intersect import brute_force_closest
    a4 = scene.inst_fwd[scene.exp_inst].reshape(-1, 3, 4)
    v0w = jnp.einsum("kij,kj->ki", a4[:, :, :3],
                     scene.tri_v0[scene.exp_tri]) + a4[:, :, 3]
    e1w = jnp.einsum("kij,kj->ki", a4[:, :, :3], scene.tri_e1[scene.exp_tri])
    e2w = jnp.einsum("kij,kj->ki", a4[:, :, :3], scene.tri_e2[scene.exp_tri])
    rs = 8192
    o_s, d_s = co_t[:rs * 4:4], cd_t[:rs * 4:4]
    t, tid, inst = tc.cluster_closest_inst(
        o_s, d_s, near[:rs], far[:rs], scene.ti_box, scene.ti_rows,
        scene.cl_obox, scene.cl_lw)
    t_ref, _, _, _, _ = brute_force_closest(
        o_s, d_s, near[:rs], far[:rs], v0w, e1w, e2w, chunk=512)
    hit = np.asarray(t_ref) < 1e29
    got = np.asarray(tid)[: len(hit)] >= 0
    emit(stage="instanced_parity", rays=rs,
         hit_mismatch=int((hit != got).sum()),
         t_rel_max=float(np.max(np.abs(np.asarray(t)[hit] -
                                       np.asarray(t_ref)[hit])
                                / np.maximum(np.asarray(t_ref)[hit], 1e-6)))
         if hit.any() else 0.0)


if __name__ == "__main__":
    main()

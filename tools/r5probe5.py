"""Round-5 probe 5: textured_room per-subsystem ablations + glue costs."""
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


def timeit(fn, *args, n=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    return max(time.perf_counter() - t0 - 0.026, 1e-9) / n


def emit(**kw):
    print(json.dumps(kw), flush=True)


def bounce8(scene, cam, cfg, label):
    from rayzath_tpu.engine.state import init_state
    from rayzath_tpu.engine.integrator import render_steps_preserve
    state = init_state(512, 512)
    key = jax.random.key(0)
    fn = lambda st: render_steps_preserve(scene, cam, cfg, st, key, 8)
    out = fn(state)
    np.asarray(out.accum[0, 0])
    s = timeit(fn, state, n=3)
    emit(stage=label, per_bounce_ms=round(s / 8 * 1e3, 2),
         mrays=round(R * 8 / s / 1e6, 2))


def main():
    import rayzath_tpu as rz
    from rayzath_tpu.models.device_scene import compile_world, compile_camera
    from rayzath_tpu.engine.integrator import pass_uniforms, n_streams
    from rayzath_tpu.ops.gather import gather_rows

    emit(batch=5, device=str(jax.devices()[0]))

    world = rz.scenes.SCENES["textured_room"](512, 512)
    scene = compile_world(world)
    cam = compile_camera(world.cameras[0])
    cfg = rz.RenderConfig(tracing=rz.Tracing(max_depth=8, rpp=8))

    bounce8(scene, cam, cfg, "textured_full")
    # maps stripped (same shapes, static flags off -> fetches disappear)
    s2 = scene.replace(mat_maps=jnp.full_like(scene.mat_maps, -1),
                       has_maps=False, map_kinds_used=(False,) * 5)
    bounce8(s2, cam, cfg, "textured_nomaps")
    # NEE off
    cfg2 = rz.RenderConfig(tracing=rz.Tracing(max_depth=8, rpp=8),
                           light_sampling=rz.LightSampling(spot_light=0,
                                                           direct_light=0))
    bounce8(scene, cam, cfg2, "textured_nonee")
    bounce8(s2, cam, cfg2, "textured_nomaps_nonee")

    # glue pieces
    key = jax.random.key(1)
    ns = n_streams(cfg, scene)
    emit(stage="uniforms", ns=ns, ms=round(timeit(
        jax.jit(lambda k: pass_uniforms(k, 0, 512, 512, ns)), key) * 1e3, 2))
    mid = jax.random.randint(jax.random.key(2), (R,), 0, 6)
    from rayzath_tpu.engine.integrator import mat_pack
    mp = mat_pack(scene)
    emit(stage="gather_small_table", ms=round(timeit(
        jax.jit(lambda i: gather_rows(mp, i)), mid) * 1e3, 2))
    tp = scene.tri_pack
    tid = jax.random.randint(jax.random.key(3), (R,), 0, tp.shape[0])
    emit(stage="gather_tri_pack", ms=round(timeit(
        jax.jit(lambda i: gather_rows(tp, i)), tid) * 1e3, 2))

    # cornell glue: full vs no-closest is not separable; time cornell_box
    # bounce8 for the record after the sort-threshold fix
    world = rz.scenes.SCENES["cornell_box"](512, 512)
    scene = compile_world(world)
    cam = compile_camera(world.cameras[0])
    bounce8(scene, cam, cfg, "cornell_bounce8")
    world = rz.scenes.SCENES["cornell_box_nee"](512, 512)
    scene = compile_world(world)
    cam = compile_camera(world.cameras[0])
    bounce8(scene, cam, cfg, "cornell_nee_bounce8")


if __name__ == "__main__":
    main()

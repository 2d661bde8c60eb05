"""Round-5 probe 6: which map kind costs 137 ms/bounce in textured_room."""
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


def timeit(fn, *args, n=4):
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
    from rayzath_tpu.engine.state import init_state
    from rayzath_tpu.engine.integrator import (render_steps_preserve,
                                               material_fetch, mat_pack)

    emit(batch=6, device=str(jax.devices()[0]))
    world = rz.scenes.SCENES["textured_room"](512, 512)
    scene = compile_world(world)
    cam = compile_camera(world.cameras[0])
    cfg = rz.RenderConfig(tracing=rz.Tracing(max_depth=8, rpp=8))
    state = init_state(512, 512)
    key = jax.random.key(0)

    def bounce8(s, label):
        fn = lambda st: render_steps_preserve(s, cam, cfg, st, key, 8)
        out = fn(state)
        np.asarray(out.accum[0, 0])
        t = timeit(fn, state, n=3)
        emit(stage=label, per_bounce_ms=round(t / 8 * 1e3, 2),
             mrays=round(R * 8 / t / 1e6, 2))

    kinds = ["texture", "normal", "metalness", "roughness", "emission"]
    for i, kname in enumerate(kinds):
        mask = tuple(j == i for j in range(5))
        bounce8(scene.replace(map_kinds_used=mask), f"only_{kname}")

    # material_fetch in a scan (realistic varying mids + uvs)
    mp = mat_pack(scene)
    mid = jax.random.randint(jax.random.key(2), (R,), 0, 6)
    uv = jax.random.uniform(jax.random.key(3), (R, 2))

    def scan_mf(uv):
        def body(c, _):
            m = material_fetch(scene, mp, mid, uv + c)
            return c + m.color_rgb[:, :2] * 1e-6, None
        out, _ = jax.lax.scan(body, uv, jnp.arange(8))
        return out

    t = timeit(jax.jit(scan_mf), uv, n=3)
    emit(stage="scan8_material_fetch", per_iter_ms=round(t / 8 * 1e3, 2))


if __name__ == "__main__":
    main()

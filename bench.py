"""Headline benchmark: Cornell box, depth 8, rays/s on one chip.

Matches the reference's ray accounting (one traced ray per pixel per cumulative
pass, cuda_render_kernel.cu:122-129) and the driver north star of
50 Mrays/s/chip (BASELINE.json). Prints ONE JSON line.

Timing is bracketed by a real device->host fetch: on the tunneled TPU platform
``block_until_ready`` can resolve before execution finishes, so only a data
fetch proves the work happened.
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402
import numpy as np  # noqa: E402

NORTH_STAR = 50e6  # rays/s/chip, Cornell depth 8 (BASELINE.json)


def main() -> None:
    import rayzath_tpu as rz
    from rayzath_tpu.models.device_scene import compile_world, compile_camera
    from rayzath_tpu.engine.state import init_state
    from rayzath_tpu.engine.integrator import render_steps

    W = H = 512
    world = rz.scenes.cornell_box(W, H)
    cfg = rz.RenderConfig(tracing=rz.Tracing(max_depth=8, rpp=8))
    scene = compile_world(world)
    cam = compile_camera(world.cameras[0])
    key = jax.random.key(0)

    chunk = 64  # passes per dispatched call
    state = init_state(W, H)
    state = render_steps(scene, cam, cfg, state, key, chunk)  # compile + warm
    np.asarray(state.accum[0, 0])  # force execution

    n_chunks = 8
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state = render_steps(scene, cam, cfg, state, key, chunk)
    np.asarray(state.accum[0, 0])  # fetch proves completion
    dt = time.perf_counter() - t0

    rays = n_chunks * chunk * W * H
    rps = rays / dt
    spp = float(np.asarray(state.accum[..., 3]).mean())
    assert spp > 0, "no samples accumulated"
    print(json.dumps({
        "metric": "cornell512_d8_rays_per_s",
        "value": round(rps, 1),
        "unit": "rays/s",
        "vs_baseline": round(rps / NORTH_STAR, 3),
    }))


if __name__ == "__main__":
    main()

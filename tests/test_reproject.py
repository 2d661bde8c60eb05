"""Temporal reprojection (reference cuda_camera.cuh:380-426)."""
import numpy as np
import jax.numpy as jnp

import rayzath_tpu as rz
from rayzath_tpu.models.device_scene import compile_world, compile_camera
from rayzath_tpu.ops.reproject import primary_hits, reproject_accum


def test_identity_reprojection_blends_everything():
    # same camera: every pixel must reproject onto itself -> accum * blend
    w = rz.scenes.cornell_box(32, 32)
    scene = compile_world(w)
    cam = compile_camera(w.cameras[0])
    cfg = rz.RenderConfig()
    depth, space = primary_hits(scene, cam, cfg)
    prev_accum = jnp.arange(32 * 32 * 4, dtype=jnp.float32).reshape(32, 32, 4)
    seeded = reproject_accum(space, cam, prev_accum, depth, 0.75)
    np.testing.assert_allclose(np.asarray(seeded), np.asarray(prev_accum) * 0.75,
                               rtol=1e-5)


def test_teleport_reprojects_nothing():
    w = rz.scenes.cornell_box(32, 32)
    scene = compile_world(w)
    cam = compile_camera(w.cameras[0])
    cfg = rz.RenderConfig()
    depth, space = primary_hits(scene, cam, cfg)
    # previous camera far away, looking elsewhere: nothing lands on-screen
    prev = w.cameras[0]
    prev.position = np.asarray([500.0, 500.0, 500.0], np.float32)
    prev.touch()
    prev_cam = compile_camera(prev)
    seeded = reproject_accum(space, prev_cam, jnp.ones((32, 32, 4)), depth, 0.75)
    assert float(jnp.abs(seeded).max()) == 0.0


def test_renderer_reprojects_on_camera_move():
    w = rz.scenes.cornell_box(32, 32)
    r = rz.Renderer(w)
    r.render(rpp=8)
    cam = w.cameras[0]
    view = r.view(cam)
    spp_before = float(np.asarray(view.state.accum[..., 3]).mean())
    assert spp_before > 0

    # small lateral move: most pixels should pass the 1% depth test
    cam.position = cam.position + np.asarray([0.02, 0.0, 0.0], np.float32)
    cam.touch()
    r.render(rpp=1)
    view = r.view(cam)
    spp_after = float(np.asarray(view.state.accum[..., 3]).mean())
    # accumulation restarted (pass_count reset) but seeded with ~0.75x the
    # previous sample count, plus the new pass's terminations
    assert view.pass_count == 1
    assert spp_after > 0.3 * spp_before, (spp_before, spp_after)

    # zero temporal_blend disables reuse
    cam.temporal_blend = 0.0
    cam.position = cam.position + np.asarray([0.02, 0.0, 0.0], np.float32)
    cam.touch()
    r.render(rpp=1)
    view = r.view(cam)
    spp_zero = float(np.asarray(view.state.accum[..., 3]).mean())
    assert spp_zero <= 1.0 + 1e-6


def test_scene_change_cancels_reprojection():
    w = rz.scenes.cornell_box(32, 32)
    r = rz.Renderer(w)
    r.render(rpp=4)
    cam = w.cameras[0]
    cam.position = cam.position + np.asarray([0.01, 0, 0], np.float32)
    cam.touch()
    # scene edit after the camera move: pending reprojection must be dropped
    w.materials[0].roughness = 0.5
    w.materials[0].touch()
    r.render(rpp=1)
    view = r.view(cam)
    spp = float(np.asarray(view.state.accum[..., 3]).mean())
    assert spp <= 1.0 + 1e-6

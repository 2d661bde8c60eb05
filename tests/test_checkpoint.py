"""Checkpoint/resume: the accumulation buffer + per-pixel path state + RNG
counter ARE the progressive render state (SURVEY.md §5 "checkpoint
accumulation state"), so a save/load round-trip must continue a render
BIT-IDENTICALLY to one that never stopped — the counter-based RNG keys
uniforms purely off (key, row, pass_idx), independent of process history.

Also covers the distributed analog: a row-sharded multi-chip render saved
mid-flight and resumed on a DIFFERENT device count continues bit-identically
(the row-keyed uniform streams make resumability provable across resharding;
SURVEY.md §5 "re-initializable distributed runtime").
"""
import numpy as np
import pytest

import rayzath_tpu as rz


def _renderer(w=64, h=48):
    world = rz.scenes.cornell_box(w, h)
    return rz.Renderer(world, rz.RenderConfig(
        tracing=rz.Tracing(max_depth=4, rpp=4)))


def test_checkpoint_roundtrip_continues_bit_identically(tmp_path):
    p = str(tmp_path / "ck.npz")

    r1 = _renderer()
    r1.render(rpp=6)
    r1.save_checkpoint(p)
    r1.render(rpp=6)
    full = r1.image_f32()

    r2 = _renderer()
    r2.load_checkpoint(p)
    assert r2.view(r2.world.cameras[0]).pass_count == 6
    r2.render(rpp=6)
    resumed = r2.image_f32()

    np.testing.assert_array_equal(full, resumed)


def test_checkpoint_preserves_progressive_counters(tmp_path):
    p = str(tmp_path / "ck.npz")
    r1 = _renderer()
    r1.render(rpp=3)
    spp_before = float(np.asarray(r1.view(r1.world.cameras[0])
                                  .state.accum[..., 3]).mean())
    r1.save_checkpoint(p)

    r2 = _renderer()
    r2.load_checkpoint(p)
    cv = r2.view(r2.world.cameras[0])
    assert int(cv.state.pass_idx) == 3
    spp_after = float(np.asarray(cv.state.accum[..., 3]).mean())
    assert spp_after == spp_before


def test_sharded_save_resume_across_device_counts(tmp_path):
    """Save a row-band-sharded accumulation mid-render, resume with a
    different shard count: both must match the single-device render bit
    for bit (the row-keyed RNG contract, integrator.pass_uniforms)."""
    import jax
    from rayzath_tpu.parallel.mesh import make_mesh, sharded_render_steps
    from rayzath_tpu.models.device_scene import compile_world, compile_camera
    from rayzath_tpu.engine.state import init_state, save_state, load_state
    from rayzath_tpu.engine.integrator import render_steps_preserve

    W, H = 64, 48
    world = rz.scenes.cornell_box(W, H)
    cfg = rz.RenderConfig(tracing=rz.Tracing(max_depth=4, rpp=4))
    scene = compile_world(world)
    cam = compile_camera(world.cameras[0])
    key = jax.random.key(7)

    # single-device reference: 2 + 3 steps
    st = render_steps_preserve(scene, cam, cfg, init_state(W, H), key, 2)
    st = render_steps_preserve(scene, cam, cfg, st, key, 3)
    ref = np.asarray(st.accum)

    # sharded on 4 devices for 2 steps -> checkpoint (host npz)
    p = str(tmp_path / "shard.npz")
    mesh4 = make_mesh(jax.devices()[:4])
    st4 = sharded_render_steps(scene, cam, cfg, init_state(W, H), key, 2,
                               mesh4)
    save_state(p, st4)

    # resume the checkpoint sharded on 2 devices for 3 more steps: the
    # runtime re-initializes with a different device count mid-render
    mesh2 = make_mesh(jax.devices()[:2])
    st2 = sharded_render_steps(scene, cam, cfg, load_state(p), key, 3,
                               mesh2)
    np.testing.assert_array_equal(ref, np.asarray(st2.accum))

"""Oracle parity: the JAX wavefront integrator vs the independent NumPy
oracle (rayzath_tpu/oracle.py), consuming identical uniform streams — images
must match decision-for-decision up to float reassociation noise.

This is the reference's CPU-engine-as-oracle strategy (SURVEY.md §4) made
exact: because the RNG is counter-based, feeding the oracle the same uniforms
makes every path take the same branches, so a mismatch localizes a semantics
bug (intersection, BSDF, NEE, Beer, regeneration) rather than MC variance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rayzath_tpu as rz
from rayzath_tpu.models.device_scene import compile_world, compile_camera
from rayzath_tpu.engine.state import init_state
from rayzath_tpu.engine.integrator import bounce_step, n_streams, pass_uniforms
from rayzath_tpu import oracle


def run_both(world, n_passes=6, max_depth=4, res=24, seed=3):
    cfg = rz.RenderConfig(tracing=rz.Tracing(max_depth=max_depth, rpp=n_passes))
    scene = compile_world(world)
    cam = compile_camera(world.cameras[0])
    key = jax.random.key(seed)
    ns = n_streams(cfg, scene)

    jstate = init_state(res, res)
    ostate = oracle.OracleState(res, res)
    oscene = oracle.OracleScene(scene)
    ocam = oracle.OracleCamera(cam)

    for p in range(n_passes):
        k = jax.random.fold_in(key, p)
        u = pass_uniforms(k, 0, res, res, ns)  # the integrator's own streams
        jstate = bounce_step(scene, cam, cfg, jstate, k)
        oracle.bounce_step(oscene, ocam, cfg, ostate, np.asarray(u))
    return np.asarray(jstate.accum), ostate.accum


def assert_images_match(a, b, tol=2e-3, frac=0.995):
    """Sample counts must agree exactly; radiance must agree to fp noise for
    the bulk of pixels. ``frac`` leaves room for chaotic outliers: a ~1e-8
    direction difference at a curved refractive interface amplifies
    exponentially over bounces (verified: single-pass images are bit-exact,
    divergence appears only at bounce >= 3), so a small fraction of pixels
    legitimately differ macroscopically between XLA (fused fma) and NumPy."""
    assert np.array_equal(a[..., 3], b[..., 3]), "sample counts diverged"
    scale = max(np.abs(b[..., :3]).max(), 1e-6)
    rel = np.abs(a[..., :3] - b[..., :3]) / scale
    assert np.percentile(rel, 75) < 1e-6, "bulk mismatch: not an fp-noise tail"
    close = (rel < tol).mean()
    assert close >= frac, f"only {close:.4f} of pixels within {tol} (scale {scale})"


def test_parity_cornell():
    a, b = run_both(rz.scenes.cornell_box(24, 24), n_passes=6, max_depth=4)
    assert_images_match(a, b)


def test_parity_lights_nee():
    a, b = run_both(rz.scenes.multi_light(24, 24), n_passes=5, max_depth=3)
    assert_images_match(a, b)


def test_parity_glass_scattering():
    a, b = run_both(rz.scenes.glass_and_fog(24, 24), n_passes=5, max_depth=4)
    # refraction + scattering free-flight: the most chaotic path family
    assert_images_match(a, b, frac=0.85)


def test_parity_smooth_normals():
    a, b = run_both(rz.scenes.teapot_like(24, 24), n_passes=5, max_depth=3)
    assert_images_match(a, b)

"""Differentiability checks (BASELINE metric 2): jax.grad through the
wavefront integrator vs central finite differences, on tiny scenes.

The RNG is counter-based (fold_in of the pass index), so the same key renders
bit-identical paths — which makes finite differences well-defined except at
discrete decision boundaries (hit ids, BSDF branch lotteries); the scenes and
the parameters perturbed here keep those decisions stable.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rayzath_tpu as rz
from rayzath_tpu.models.device_scene import compile_world, compile_camera
from rayzath_tpu.engine.state import init_state
from rayzath_tpu.engine.integrator import render_steps_preserve
from rayzath_tpu.parallel.train import image_loss, training_step, DIFF_PARAMS


def tiny_world(emission=8.0):
    w = rz.World()
    white = w.create_material("white", color=(0.7, 0.6, 0.5, 1.0))
    lamp = w.create_material("lamp", color=(1.0, 0.9, 0.8, 1.0), emission=emission)
    plane = w.generate_mesh("plane", sides=4, width=4.0, height=4.0)
    w.create_instance(name="floor", mesh=plane, materials=[white])
    cube = w.generate_mesh("cube")
    from rayzath_tpu.utils.hostmath import Transform
    w.create_instance(name="glow", mesh=cube, materials=[lamp],
                      transform=Transform(position=(0, 1.2, 0)))
    cam = w.create_camera("cam", position=(0, 1.0, -3.0), resolution=(12, 12),
                          aperture=0.01, exposure_time=1.0)
    cam.look_at((0, 0.5, 0))
    return w


def setup(n_steps=6, max_depth=3):
    w = tiny_world()
    cfg = rz.RenderConfig(tracing=rz.Tracing(max_depth=max_depth, rpp=n_steps))
    scene = compile_world(w)
    cam = compile_camera(w.cameras[0])
    state = init_state(12, 12)
    key = jax.random.key(7)
    return scene, cam, cfg, state, key, n_steps


def render_mean_image(scene, cam, cfg, state, key, n):
    st = render_steps_preserve(scene, cam, cfg, state, key, n)
    spp = jnp.maximum(st.accum[..., 3:4], 1.0)
    return st.accum[..., :3] / spp


@pytest.mark.parametrize("param,idx", [
    ("mat_emission", 3),     # the lamp material's emission
    ("mat_color", (2, 0)),   # the white material's red channel
])
def test_grad_matches_finite_difference(param, idx):
    scene, cam, cfg, state, key, n = setup()
    target = jnp.zeros((12, 12, 3))

    def loss_of(value):
        arr = getattr(scene, param)
        s = scene.replace(**{param: arr.at[idx].set(value)})
        return image_loss(s, cam, cfg, state, key, target, n)[0]

    base = float(getattr(scene, param)[idx])
    g = jax.grad(loss_of)(jnp.float32(base))
    eps = 1e-2 if param == "mat_emission" else 1e-3
    fd = (loss_of(base + eps) - loss_of(base - eps)) / (2 * eps)
    assert np.isfinite(float(g))
    assert float(g) != 0.0, "gradient unexpectedly zero"
    assert float(g) == pytest.approx(float(fd), rel=0.05), (
        f"analytic {float(g)} vs finite-diff {float(fd)}")


def test_grad_nonzero_and_finite_for_all_diff_params():
    scene, cam, cfg, state, key, n = setup()
    target = jnp.full((12, 12, 3), 0.1)
    params = {k: getattr(scene, k) for k in DIFF_PARAMS}

    def loss_fn(p):
        return image_loss(scene.replace(**p), cam, cfg, state, key, target, n)[0]

    grads = jax.grad(loss_fn)(params)
    for k, g in grads.items():
        assert np.all(np.isfinite(np.asarray(g))), f"non-finite grad for {k}"
    # materials that light/shade the visible scene must receive signal
    assert float(jnp.abs(grads["mat_emission"]).max()) > 0
    assert float(jnp.abs(grads["mat_color"]).max()) > 0


def test_training_step_descends():
    scene, cam, cfg, state, key, n = setup()
    # target: the same scene with dimmer lamp -> training should reduce emission
    dim = scene.replace(mat_emission=scene.mat_emission.at[3].set(2.0))
    target = render_mean_image(dim, cam, cfg, state, key, n)

    s = scene
    losses = []
    for i in range(8):
        s, _, loss = training_step(s, cam, cfg, state, key, target,
                                   jnp.float32(0.5), n)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, f"no descent: {losses}"
    # emission moved toward the dim target
    assert float(s.mat_emission[3]) < float(scene.mat_emission[3])

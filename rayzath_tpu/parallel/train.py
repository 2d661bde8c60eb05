"""Differentiable (inverse-rendering) training step.

The new-capability analog of "training" for a renderer (SURVEY.md §7.1): render
with the current scene parameters, compare against a target image, and descend
on material properties / texture atlases. Gradients flow through the wavefront
integrator (discrete hit ids are stop-gradient; hit coordinates are re-derived
differentiably — engine/integrator.py). Under a sharded wavefront
(parallel.mesh), GSPMD inserts the cross-chip psum for the parameter gradients
automatically: per-ray adjoints reduce over the 'rays' axis into the
replicated parameter tables.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..engine.integrator import render_steps_preserve
from ..engine.state import RenderState

# Scene leaves that receive gradients — every entry is finite-difference
# validated in tests/test_gradients.py (material color/emission directly;
# roughness/metalness/spot/direct emission via test_grad_fd_lights_and_
# surface_params; atlas texels via test_grad_fd_atlas_texel; shadow-opacity
# alpha through the cluster-shadow custom_vjp at 64^2 via
# test_grad_fd_through_cluster_shadow_at_64px).
#
# ``mat_ior`` and ``mat_scattering`` carry dedicated estimators for their
# discrete decision boundaries (tests/test_gradients.py validates both):
# * ior: the total-internal-reflection branch switches discontinuously; the
#   fresnel value is straight-through with a sigmoid-relaxed TIR indicator
#   supplying the gradient (ops/vec.py fresnel_specular_ratio; anneal
#   ops.vec.TIR_TAU toward 0 over a training run).
# * scattering: the free-flight scatter-vs-survive DECISION is handled by a
#   score-function likelihood-ratio surrogate on the throughput (forward
#   value exactly 1; engine/integrator.py bounce_step) — the pathwise
#   gradient alone is blind to event-probability changes.
DIFF_PARAMS = ("mat_color", "mat_metalness", "mat_roughness", "mat_emission",
               "mat_ior", "mat_scattering",
               "color_atlas", "scalar_atlas", "spot_emission", "dir_emission")


def image_loss(scene, cam, cfg, state: RenderState, key, target, n_steps: int):
    """MSE between the mean accumulated radiance and a target HDR image."""
    # preserve the caller's state: losses are probed repeatedly from the same
    # initial state (finite differences, line searches); donation would free it
    st = render_steps_preserve(scene, cam, cfg, state, key, n_steps)
    spp = jnp.maximum(st.accum[..., 3:4], 1.0)
    img = st.accum[..., :3] / spp
    return jnp.mean(jnp.square(img - target)), st


@partial(jax.jit, static_argnames=("cfg", "n_steps"))
def training_step(scene, cam, cfg, state: RenderState, key, target,
                  lr, n_steps: int):
    """One SGD step on the differentiable scene parameters.

    Returns (updated scene, post-render state, scalar loss). ``state`` should
    be a fresh init_state each step (paths restart) unless continuing a
    progressive estimate on purpose.
    """
    params = {k: getattr(scene, k) for k in DIFF_PARAMS}

    def loss_fn(p):
        return image_loss(scene.replace(**p), cam, cfg, state, key, target, n_steps)

    (loss, st), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    new_params = {k: _project(k, params[k] - lr * grads[k]) for k in params}
    return scene.replace(**new_params), st, loss


_UNIT_PARAMS = ("mat_color", "mat_metalness", "mat_roughness", "color_atlas")


def _project(name: str, value):
    """Projected SGD: keep parameters in their physical ranges (a step that
    leaves them — negative emission, roughness outside [0,1] — produces
    non-physical radiance and can diverge to NaN)."""
    if name in _UNIT_PARAMS:
        return jnp.clip(value, 0.0, 1.0)
    if name == "mat_ior":
        # refractive indices below 1 are non-physical for these media
        return jnp.maximum(value, 1.0)
    return jnp.maximum(value, 0.0)

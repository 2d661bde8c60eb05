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
# ``mat_ior`` and ``mat_scattering`` are deliberately EXCLUDED, not merely
# untested:
# * ior enters through fresnel_specular_ratio, whose total-internal-
#   reflection branch (sin2_t >= 1) switches the sampled direction family
#   discontinuously; the pathwise derivative on either side exists but the
#   estimator is biased across the TIR boundary, and near-boundary rays
#   dominate the variance. A usable treatment needs a reparameterized /
#   smoothed Fresnel (e.g. a sigmoid-relaxed TIR indicator annealed during
#   training) — tracked as future work, not a one-line fix.
# * scattering drives the exponential free-flight sampling
#   (scat_dist = -log u / sigma) and the scatter-event DECISION
#   (scat_dist < far): the decision flip is a discrete jump the pathwise
#   gradient cannot see, so dL/d(sigma) is systematically wrong whenever
#   event probabilities matter (exactly when one trains scattering).
#   The principled fix is a score-function / differential-transmittance
#   estimator for the event probability.
# Training either today silently optimizes a biased objective, so they stay
# out of DIFF_PARAMS until the estimators above exist.
DIFF_PARAMS = ("mat_color", "mat_metalness", "mat_roughness", "mat_emission",
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
    return jnp.maximum(value, 0.0)

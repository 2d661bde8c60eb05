"""Batched 3-vector helpers on JAX arrays (last axis = xyz).

Device-side math mirroring the reference helper functions in
RayZath/cuda_render_parts.cuh:1195-1368 (reflect, halfway, local frame, sampling,
Fresnel) in vectorized, differentiable form.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-20
TWO_PI = 6.283185307179586
PI = 3.141592653589793


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def dot1(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    return jnp.sqrt(jnp.maximum(dot(v, v), 1e-20))


def normalize(v):
    return v * jnp.reciprocal(jnp.sqrt(jnp.maximum(dot1(v, v), EPS)))


def lerp(a, b, t):
    return a + (b - a) * t


def reflect(vi, vn):
    """Reflect incident vi about normal vn (reference reflectVector)."""
    return vi - 2.0 * dot1(vn, vi) * vn


def halfway(vi, vr):
    """Halfway vector of incident vi and outgoing vr (reference halfwayVector)."""
    return normalize(vr - vi)


def local_frame(vn):
    """Orthonormal tangent frame (vX, vY) for normals vn [..,3]
    (reference localCoordinate, cuda_render_parts.cuh:1253-1265)."""
    b = (jnp.abs(vn[..., 0]) > jnp.abs(vn[..., 1])).astype(vn.dtype)
    vx0 = jnp.stack([1.0 - b, b, jnp.zeros_like(b)], axis=-1)
    vy = cross(vn, vx0)
    vx = cross(vn, vy)
    return vx, vy


def cosine_sample_hemisphere(r1, r2, vn):
    """Cosine-weighted hemisphere sample around vn (reference cuda_render_parts.cuh:1268-1284)."""
    vx, vy = local_frame(vn)
    phi = r1 * TWO_PI
    sq = jnp.sqrt(r2)
    return (vx * (sq * jnp.cos(phi))[..., None]
            + vy * (sq * jnp.sin(phi))[..., None]
            + vn * jnp.sqrt(jnp.maximum(1.0 - r2, 1e-12))[..., None])


def sample_sphere(r1, r2, vn):
    """Uniform sphere sample with pole at vn (reference cuda_render_parts.cuh:1285-1301).

    The sqrt argument is floored at 1e-12 (not 0): r2 can be a differentiable
    function of material roughness (glossy sampling), and d/dx sqrt(x) at
    x = 0 is infinite — roughness-0 materials would poison every gradient.
    """
    vx, vy = local_frame(vn)
    phi = r1 * TWO_PI
    cos_theta = 1.0 - 2.0 * r2
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 1e-12))
    return (vx * (sin_theta * jnp.cos(phi))[..., None]
            + vy * (sin_theta * jnp.sin(phi))[..., None]
            + vn * cos_theta[..., None])


def sample_hemisphere(r1, r2, vn):
    """Uniform hemisphere sample (reference: sampleSphere with r2 * 0.5)."""
    return sample_sphere(r1, r2 * 0.5, vn)


def sample_disk(r1, r2, vn, radius):
    """Point on a disk of ``radius`` perpendicular to vn
    (reference sampleDisk, cuda_render_parts.cuh:1322-1332)."""
    vx, vy = local_frame(vn)
    ang = r1 * TWO_PI
    rad = jnp.sqrt(r2) * radius
    return (vx * (jnp.sin(ang) * rad)[..., None] + vy * (jnp.cos(ang) * rad)[..., None])


#: Temperature of the sigmoid-relaxed total-internal-reflection indicator
#: used for ior GRADIENTS (the forward value stays the exact hard branch).
#: Smaller = tighter boundary = lower bias but higher variance near TIR.
#: NOTE: jitted training/loss functions capture this global at TRACE time —
#: reassigning it mid-run has no effect until the function is re-traced. An
#: annealing schedule must either call ``jax.clear_caches()`` (or re-build
#: its jitted step) after each assignment, or re-jit per temperature stage.
TIR_TAU = 0.05


def fresnel_specular_ratio(vn, vi, n1, n2):
    """Exact dielectric Fresnel reflectance + refraction factors.

    Returns (fresnel, ratio, refr_b) where the refracted direction is
    ``vi * ratio + vn * refr_b`` (reference fresnelSpecularRatio,
    cuda_render_parts.cuh:1335-1355). Total internal reflection -> fresnel = 1.

    Differentiability: the TIR branch switches the reflectance (and the
    sampled direction family downstream) discontinuously in ior, so the
    pathwise derivative is blind to the boundary. The fresnel value is
    therefore computed straight-through: its FORWARD value is the exact
    hard branch, while its GRADIENT is that of a sigmoid-relaxed blend
    ``lerp(F, 1, sigmoid((sin2_t - 1)/TIR_TAU))`` — the annealable
    estimator the ior entry in parallel.train.DIFF_PARAMS relies on.
    """
    ratio = n1 / jnp.maximum(n2, EPS)
    cosi = jnp.abs(dot(vi, vn))
    sin2_t = ratio * ratio * (1.0 - cosi * cosi)
    tir = sin2_t >= 1.0
    # floored at 1e-12, not 0: at total internal reflection the clamp hits
    # exactly 0 and d/dx sqrt(x) is infinite there — the inf leaks through
    # the where() backward pass as 0 * inf = NaN into every upstream grad
    cost = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 1e-12))
    rp = (n1 * cosi - n2 * cost) / jnp.maximum(n1 * cosi + n2 * cost, EPS)
    rs = (n2 * cosi - n1 * cost) / jnp.maximum(n2 * cosi + n1 * cost, EPS)
    f_fresnel = 0.5 * (rs * rs + rp * rp)
    f_hard = jnp.where(tir, 1.0, f_fresnel)
    w_tir = jax.nn.sigmoid((sin2_t - 1.0) / TIR_TAU)
    f_relaxed = f_fresnel + (1.0 - f_fresnel) * w_tir
    f = f_relaxed + jax.lax.stop_gradient(f_hard - f_relaxed)
    refr_b = ratio * cosi - cost
    return f, ratio, refr_b

"""rayzath_tpu — a TPU-native differentiable Monte-Carlo path tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the RayZath
renderer (C++/CUDA reference), redesigned TPU-first: wavefront integration over
SoA ray buffers, flattened world-space BVH, counter-based stateless RNG,
texture atlases, progressive accumulation with checkpointable state, end-to-end
differentiability (path-replay style), and multi-chip scaling via
jax.sharding meshes.
"""

from .engine import Engine, Renderer, RenderConfig, Tracing, LightSampling
from .models import (World, Material, Mesh, Camera, SpotLight, DirectLight,
                     Instance, Group, Texture, NormalMap, MetalnessMap,
                     RoughnessMap, EmissionMap)
from . import scenes

__version__ = "0.1.0"

__all__ = [
    "Engine", "Renderer", "RenderConfig", "Tracing", "LightSampling",
    "World", "Material", "Mesh", "Camera", "SpotLight", "DirectLight",
    "Instance", "Group", "Texture", "NormalMap", "MetalnessMap",
    "RoughnessMap", "EmissionMap", "scenes",
]

"""rayzath_tpu — a TPU-native differentiable Monte-Carlo path tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the RayZath
renderer (C++/CUDA reference), redesigned TPU-first: wavefront integration over
SoA ray buffers, flattened world-space BVH, counter-based stateless RNG,
texture atlases, progressive accumulation with checkpointable state, end-to-end
differentiability (path-replay style), and multi-chip scaling via
jax.sharding meshes.
"""

import os as _os

# Persistent XLA compilation cache: TPU compiles of the integrator scan are
# expensive (tens of seconds, occasionally much worse on the tunneled
# backend); caching makes every process after the first start instantly.
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/rayzath_tpu_xla"))

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

"""Render configuration.

Mirrors the reference ``RenderConfig`` (RayZath/engine_parts.hpp:76-128):
``Tracing{max_depth=16, rpp=8}`` and ``LightSampling{spot=1, direct=1}``.
These are static (compile-time) values for the jitted integrator.
"""
from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional


@dataclass(frozen=True)
class Tracing:
    max_depth: int = 16
    rpp: int = 8  # bounce-steps (cumulative passes) per render cycle


@dataclass(frozen=True)
class LightSampling:
    spot_light: int = 1
    direct_light: int = 1


@dataclass(frozen=True)
class RenderConfig:
    tracing: Tracing = Tracing()
    light_sampling: LightSampling = LightSampling()
    # TPU-specific knobs (not in reference):
    # Scenes with <= this many triangles take the dense XLA projection test
    # (one fused chunk, no tables). Above it, the Pallas cluster traversal
    # (ops/traverse_cluster.py) culls per 1024-ray block and intersects only
    # visited ~128-triangle clusters, with intermediates kept in VMEM.
    brute_force_threshold: int = 128
    bvh_leaf_size: int = 8
    chunk: int = 512                   # brute-force triangle tile size
    # Use the Pallas cluster kernels. False falls back to the pure-XLA
    # skip-link walk (ops/traverse.py) — the escape hatch for backends where
    # Mosaic is unavailable (the GSPMD auto-sharded path; shard_map keeps
    # Pallas, parallel/mesh.py).
    packet_traversal: bool = True
    # Acceleration structure: None = auto (two-level TLAS/BLAS when instancing
    # would duplicate geometry substantially; world-space soup otherwise).
    # True/False forces the choice.
    two_level: Optional[bool] = None
    # Sort rays by a spatial-directional coherence key before traversal
    # (ops/sort_rays.py). OFF by default: a 512^2 argsort costs ~2.7 ms on
    # chip — more than an entire bounce's budget at the north-star rate —
    # while reshape-only 32x32 image tiling (integrator._tile) recovers most
    # primary-ray coherence for free and bounce rays stay origin-coherent in
    # pixel order. Turn on only for workloads dominated by incoherent
    # secondary traversal where 2.7 ms/call amortizes.
    ray_sort: bool = False

    def with_(self, **kw) -> "RenderConfig":
        return replace(self, **kw)

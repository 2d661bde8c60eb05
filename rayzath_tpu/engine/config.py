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
    # (one fused chunk, no tables). Default 0: the Pallas cluster traversal
    # (ops/traverse_cluster.py) handles every size — measured on-chip it is
    # within ~11% of the dense path even on the 36-triangle Cornell
    # (124 vs 139 Mrays/s) while compiling in ~20 s instead of ~11 MINUTES
    # (the dense path's [R,F] program triggers pathological XLA compiles).
    brute_force_threshold: int = 0
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
    # Sort rays by the Morton-major spatial-directional coherence key
    # before traversal (ops/sort_rays.py). None = auto: sorting costs a
    # fixed ~2.7 ms per call (XLA argsort at 512^2), so it is enabled only
    # for scenes whose candidate table is large enough that incoherent
    # bounce blocks would otherwise enumerate hundreds of clusters
    # (>= 192 candidates; see tools/visitstats.py measurements). Small
    # scenes rely on reshape-only 32x32 image tiling instead.
    ray_sort: Optional[bool] = None

    def with_(self, **kw) -> "RenderConfig":
        return replace(self, **kw)

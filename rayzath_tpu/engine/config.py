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
    # Scenes with <= this many triangles skip the BVH for the dense MXU
    # projection test. Measured crossover on one TPU chip: the dense path runs
    # ~1.3 Mrays/s at 9k tris (cost linear in F); the stackless BVH traversal
    # with compaction runs ~1.65 Mrays/s nearly independent of F.
    brute_force_threshold: int = 8192
    bvh_leaf_size: int = 8
    chunk: int = 512                   # brute-force triangle tile size
    # Use the Pallas packet-traversal kernel (ops/traverse_packet.py) for
    # BVH scenes whose tables fit VMEM. ~7x faster than the XLA skip-link
    # walk on one chip; disabled automatically on the GSPMD-sharded path
    # (pallas_call does not auto-partition) and for oversized scenes.
    packet_traversal: bool = True
    # Acceleration structure: None = auto (two-level TLAS/BLAS when instancing
    # would duplicate geometry or the scene overflows the resident packet
    # table; world-space soup otherwise). True/False forces the choice.
    two_level: Optional[bool] = None
    # Sort rays by a spatial-directional coherence key before packet/TLAS
    # traversal (ops/sort_rays.py). The shared block walk visits the union of
    # its rays' nodes: coherent blocks keep that union small; incoherent
    # bounce wavefronts would otherwise walk the whole tree per block.
    ray_sort: bool = True

    def with_(self, **kw) -> "RenderConfig":
        return replace(self, **kw)

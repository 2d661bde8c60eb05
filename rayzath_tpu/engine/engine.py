"""Engine facade (reference RayZath/rayzath.hpp:45-60).

Owns the World, the RenderConfig, and the renderer backend. The reference's
CUDA-vs-CPU backend switch becomes TPU (jitted JAX, default) vs the NumPy
oracle backend (rayzath_tpu.cpu) used for verification.
"""
from __future__ import annotations

from typing import Optional

from ..models.world import World
from .config import RenderConfig
from .renderer import Renderer

_instance: Optional["Engine"] = None


class Engine:
    def __init__(self, config: Optional[RenderConfig] = None, seed: int = 0):
        self._world = World()
        self._config = config or RenderConfig()
        self._renderer = Renderer(self._world, self._config, seed=seed)

    @staticmethod
    def instance() -> "Engine":
        global _instance
        if _instance is None:
            _instance = Engine()
        return _instance

    @property
    def world(self) -> World:
        return self._world

    @world.setter
    def world(self, world: World) -> None:
        self._world = world
        self._renderer = Renderer(world, self._config, seed=0)

    @property
    def render_config(self) -> RenderConfig:
        return self._config

    @render_config.setter
    def render_config(self, cfg: RenderConfig) -> None:
        self._config = cfg
        self._renderer.config = cfg

    @property
    def renderer(self) -> Renderer:
        return self._renderer

    def render_world(self, block: bool = True, rpp: Optional[int] = None) -> None:
        """One render cycle over all enabled cameras (reference
        Engine::renderWorld, rayzath.cpp:64-94)."""
        self._renderer.render(rpp=rpp, block=block)

    def debug_info(self) -> str:
        return self._renderer.debug_info()

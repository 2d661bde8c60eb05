"""Engine facade (reference RayZath/rayzath.hpp:45-60).

Owns the World, the RenderConfig, and the renderer backend. The reference's
CUDA-vs-CPU backend switch becomes: the jitted JAX integrator pinned to an
accelerator device (TPU) when one is available, falling back to the same
integrator on a JAX CPU device otherwise (the reference's silent
accelerated->CPU construction fallback, rayzath.cpp:21-28). The independent
NumPy oracle (rayzath_tpu.oracle) is the verification backend, exercised by
the test suite and the headless runner's ``engine: ["CPU"]`` tasks.
"""
from __future__ import annotations

import warnings
from typing import Optional

import jax

from ..models.world import World
from .config import RenderConfig
from .renderer import Renderer

_instance: Optional["Engine"] = None

_ACCELERATED = ("tpu", "axon")


def pick_device():
    """Best available device: an accelerator if one initializes, else CPU
    (the reference's CUDA->CPU init fallback, rayzath.cpp:21-28). Returns
    None when JAX's default placement is already an accelerator (no pin
    needed)."""
    try:
        if jax.default_backend() in _ACCELERATED:
            return None  # default placement is already the accelerator
    except Exception as e:  # pragma: no cover - backend init failure path
        warnings.warn(f"accelerator backend failed to initialize ({e}); "
                      "falling back to CPU", RuntimeWarning)
        return jax.devices("cpu")[0]
    for kind in _ACCELERATED:
        try:
            return jax.devices(kind)[0]
        except RuntimeError:
            continue
    return jax.devices("cpu")[0]


class Engine:
    def __init__(self, config: Optional[RenderConfig] = None, seed: int = 0):
        self._world = World()
        self._config = config or RenderConfig()
        self._renderer = Renderer(self._world, self._config, seed=seed,
                                  device=pick_device())

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
        self._renderer = Renderer(world, self._config, seed=0,
                                  device=pick_device())

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

from .config import RenderConfig, Tracing, LightSampling
from .state import RenderState, init_state, save_state, load_state
from .renderer import Renderer
from .engine import Engine

__all__ = ["RenderConfig", "Tracing", "LightSampling", "RenderState",
           "init_state", "save_state", "load_state", "Renderer", "Engine"]

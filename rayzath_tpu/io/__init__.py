"""Scene IO: JSON scene schema, OBJ/MTL, bitmaps (reference L4 loader/saver
stack, RayZath/{loader,saver,json_loader,json_saver}).
"""
from .load_result import LoadResult
from .loader import load_scene, save_scene
from .bitmap import load_image, save_image, save_depth

__all__ = ["LoadResult", "load_scene", "save_scene",
           "load_image", "save_image", "save_depth"]

"""Loader/Saver facade (reference Loader::loadScene, loader.cpp:1041-1056 and
Saver::saveScene, saver.cpp)."""
from __future__ import annotations

import os

from .json_scene import JsonLoader, JsonSaver
from .load_result import LoadResult


def load_scene(world, path: str) -> LoadResult:
    """Load a scene file into the world; dispatches on extension (.json only,
    like the reference)."""
    ext = os.path.splitext(path)[1].lower()
    if ext != ".json":
        raise ValueError(f"unsupported scene extension {ext!r} (expected .json)")
    result = JsonLoader(world, path).load()
    world.touch()
    return result


def load_hdr(world, path: str, name: str | None = None, **map_kwargs):
    """Load an HDR image as a (Texture, EmissionMap) pair in the world —
    the reference BitmapLoader::loadHDR semantics (loader.cpp:103-138):
    texture holds the chroma (rgb / max component), the emission map the
    max component, so `texture * emission` reconstructs the radiance.
    Attach both to a material (e.g. ``world.material`` for an environment
    sky). ``map_kwargs`` (filter_mode, address_mode, scale, ...) apply to
    both maps. Returns (texture, emission_map)."""
    from ..models.texture import Texture, EmissionMap
    from .bitmap import load_hdr as _load, hdr_to_texture_emission

    rgb = _load(path)
    tex_data, emi_data = hdr_to_texture_emission(rgb)
    base = name or os.path.splitext(os.path.basename(path))[0]
    tex = Texture(name=base, data=tex_data, **map_kwargs)
    emi = EmissionMap(name=f"{base} emission", data=emi_data, **map_kwargs)
    world.textures.create(tex)
    world.emission_maps.create(emi)
    world.touch()
    return tex, emi


def save_scene(world, path: str) -> None:
    """Save the world as a .json scene (+ PNG maps beside it)."""
    ext = os.path.splitext(path)[1].lower()
    if ext != ".json":
        raise ValueError(f"unsupported scene extension {ext!r} (expected .json)")
    JsonSaver(world, path).save()

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


def save_scene(world, path: str) -> None:
    """Save the world as a .json scene (+ PNG maps beside it)."""
    ext = os.path.splitext(path)[1].lower()
    if ext != ".json":
        raise ValueError(f"unsupported scene extension {ext!r} (expected .json)")
    JsonSaver(world, path).save()

"""Bitmap load/save (the stb_image / BitmapSaver analog, reference
loader.cpp + saver.cpp:22-66). Uses PIL; HDR-ish data goes through float PNG/NPY.
"""
from __future__ import annotations

import os

import numpy as np

try:
    from PIL import Image
    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False


def load_image(path: str, flip_v: bool = False) -> np.ndarray:
    """Load an image as float32 RGBA [H,W,4] in [0,1]."""
    if not _HAS_PIL:
        raise RuntimeError("PIL is unavailable; cannot load images")
    img = Image.open(path).convert("RGBA")
    a = np.asarray(img, np.float32) / 255.0
    if flip_v:
        a = a[::-1]
    return a


def save_image(path: str, rgb: np.ndarray) -> None:
    """Save uint8 [H,W,3|4] (or float in [0,1]) as PNG/JPEG by extension."""
    a = np.asarray(rgb)
    if a.dtype != np.uint8:
        a = np.clip(a * 255.0, 0, 255).astype(np.uint8)
    if not _HAS_PIL:
        raise RuntimeError("PIL is unavailable; cannot save images")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(a).save(path)


def save_depth(path: str, depth: np.ndarray) -> None:
    """Save a depth buffer: .npy raw, or normalized grayscale PNG."""
    if path.endswith(".npy"):
        np.save(path, depth)
        return
    d = np.asarray(depth, np.float32)
    finite = np.isfinite(d) & (d < 1e30)
    hi = d[finite].max() if finite.any() else 1.0
    lo = d[finite].min() if finite.any() else 0.0
    norm = np.zeros_like(d) if hi <= lo else np.clip((d - lo) / (hi - lo), 0, 1)
    save_image(path, np.repeat(norm[..., None], 3, axis=2))

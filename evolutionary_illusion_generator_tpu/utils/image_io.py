"""Host image IO and flow-overlay rendering (PIL).

Artifact parity with the reference (SURVEY.md Appendix B): candidate/best
PNGs and the ``*_f.png`` arrow overlays the flow stage saves
(generate_illusion.py:548-550).
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import numpy as np
from PIL import Image, ImageDraw

__all__ = ["load_image", "save_image", "draw_flow_overlay"]


def load_image(path: str, size: Optional[tuple] = None, c_dim: int = 3) -> np.ndarray:
    """Load a PNG as (H, W, C) float32 in [0, 1]."""
    img = Image.open(path)
    img = img.convert("RGB" if c_dim == 3 else "L")
    if size is not None:
        img = img.resize(size, Image.LANCZOS)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if c_dim == 1:
        arr = arr[..., None]
    return arr


def save_image(array: np.ndarray, path: str) -> None:
    """Save (H, W, C) uint8 or [0,1] float array as PNG."""
    arr = np.asarray(array)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    mode = "L" if arr.ndim == 2 else "RGB"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(arr, mode).save(path, "PNG")


def draw_flow_overlay(
    image: np.ndarray,
    vectors: Iterable,
    path: Optional[str] = None,
    scale: float = 10.0,
    color=(255, 0, 0),
) -> np.ndarray:
    """Render flow vectors as arrows over an image.

    Parity with the flow submodule's ``save=True`` overlay
    (generate_illusion.py:548-550).  ``vectors`` rows are [x, y, dx, dy];
    displacements are magnified by ``scale`` for visibility.
    """
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0).astype(np.uint8)
    if arr.ndim == 2 or (arr.ndim == 3 and arr.shape[-1] == 1):
        arr = np.repeat(arr.reshape(arr.shape[0], arr.shape[1], 1), 3, axis=-1)
    img = Image.fromarray(arr, "RGB")
    draw = ImageDraw.Draw(img)
    for v in vectors:
        x, y, dx, dy = float(v[0]), float(v[1]), float(v[2]), float(v[3])
        x1, y1 = x + dx * scale, y + dy * scale
        draw.line([(x, y), (x1, y1)], fill=color, width=1)
        draw.ellipse([x - 1, y - 1, x + 1, y + 1], fill=color)
    out = np.asarray(img)
    if path is not None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        img.save(path, "PNG")
    return out

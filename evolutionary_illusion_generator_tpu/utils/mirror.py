"""Image mirroring utilities.

The reference imports ``mirror, mirror_multiple, TransformationType`` from
its predictor submodule but never calls them (generate_illusion.py:3,
SURVEY.md §2.2 "Mirror utilities" row — legacy API surface).  This is the
working equivalent inferred from the names: single/batch mirroring of image
files along the chosen axes.
"""

from __future__ import annotations

import os
from enum import IntEnum
from typing import Iterable, List

import numpy as np
from PIL import Image

__all__ = ["TransformationType", "mirror", "mirror_multiple"]


class TransformationType(IntEnum):
    HorizontalMirror = 0
    VerticalMirror = 1
    BothMirror = 2


def _transform(arr: np.ndarray, kind: TransformationType) -> np.ndarray:
    if kind == TransformationType.HorizontalMirror:
        return arr[:, ::-1]
    if kind == TransformationType.VerticalMirror:
        return arr[::-1, :]
    if kind == TransformationType.BothMirror:
        return arr[::-1, ::-1]
    raise ValueError(kind)


def mirror(
    image_path: str,
    output_dir: str,
    kind: TransformationType = TransformationType.HorizontalMirror,
) -> str:
    """Mirror one image file; returns the output path."""
    img = np.asarray(Image.open(image_path))
    out = _transform(img, kind)
    os.makedirs(output_dir, exist_ok=True)
    name, ext = os.path.splitext(os.path.basename(image_path))
    out_path = os.path.join(output_dir, f"{name}_mirror{ext or '.png'}")
    Image.fromarray(out).save(out_path)
    return out_path


def mirror_multiple(
    image_paths: Iterable[str],
    output_dir: str,
    kind: TransformationType = TransformationType.HorizontalMirror,
) -> List[str]:
    return [mirror(p, output_dir, kind) for p in image_paths]

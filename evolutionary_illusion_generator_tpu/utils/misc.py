"""Misc image utilities from the reference's API surface.

All three are dead code in the reference but part of its surface
(SURVEY.md §2.1 "Misc image utils" / "Fidelity metric" rows).
"""

from __future__ import annotations

import numpy as np

__all__ = ["get_fidelity", "rgb2gray", "pil_to_cv2"]

#: The reference's rgb2gray uses a typo'd blue weight 0.144 instead of the
#: BT.601 0.114 (generate_illusion.py:464, SURVEY.md Appendix C #6).  The
#: correct weights are the default; pass ``strict_reference=True`` for the
#: typo'd ones.
_BT601 = np.array([0.299, 0.587, 0.114])
_REFERENCE_TYPO = np.array([0.299, 0.587, 0.144])


def rgb2gray(rgb: np.ndarray, strict_reference: bool = False) -> np.ndarray:
    weights = _REFERENCE_TYPO if strict_reference else _BT601
    return np.dot(rgb[..., :3], weights)


def get_fidelity(input_image_path: str, prediction_image_path: str) -> float:
    """1 - normalized MSE between two images (generate_illusion.py:320-329)."""
    from PIL import Image

    a = np.array(Image.open(input_image_path).convert("RGB"), dtype=float)
    b = np.array(Image.open(prediction_image_path).convert("RGB"), dtype=float)
    err = np.sum((a - b) ** 2) / (float(a.shape[0] * a.shape[1]) * 255 * 255)
    return 1 - err


def pil_to_cv2(image, c_dim: int = 3) -> np.ndarray:
    """PIL -> OpenCV BGR array (generate_illusion.py:467-474)."""
    import cv2

    image_np = np.asarray(image)
    if c_dim == 3:
        return cv2.cvtColor(image_np, cv2.COLOR_RGB2BGR)
    return cv2.cvtColor(image_np, cv2.COLOR_GRAY2BGR)

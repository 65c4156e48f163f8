"""Grayscale conversion and Gaussian image pyramids (device)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["to_gray", "pyr_down", "build_pyramid"]

# ITU-R BT.601 luma weights (OpenCV RGB2GRAY).  Note the reference's own
# (dead) rgb2gray uses a typo'd 0.144 blue weight (generate_illusion.py:464);
# the flow submodule delegated to OpenCV, which uses the correct 0.114.
_LUMA = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)

# 5-tap binomial kernel (OpenCV pyrDown)
_PYR_K = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0


def to_gray(image):
    """(..., H, W, C) [0,1] float -> (..., H, W) grayscale."""
    if image.shape[-1] == 1:
        return image[..., 0]
    return jnp.einsum("...c,c->...", image[..., :3], _LUMA)


def _sep_filter2(img, k):
    """Separable filter with edge-replicate padding; img (..., H, W)."""
    r = len(k) // 2
    pad = [(0, 0)] * (img.ndim - 2) + [(r, r), (0, 0)]
    x = jnp.pad(img, pad, mode="edge")
    x = sum(k[i] * x[..., i : i + img.shape[-2], :] for i in range(len(k)))
    pad = [(0, 0)] * (img.ndim - 2) + [(0, 0), (r, r)]
    x = jnp.pad(x, pad, mode="edge")
    x = sum(k[i] * x[..., :, i : i + img.shape[-1]] for i in range(len(k)))
    return x


def pyr_down(img):
    """Gaussian blur + 2x decimation; img (..., H, W)."""
    return _sep_filter2(img, _PYR_K)[..., ::2, ::2]


def build_pyramid(img, levels: int):
    """List of ``levels`` images, level 0 = full resolution."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(pyr_down(pyr[-1]))
    return pyr

"""Shi-Tomasi corner detection with fixed-K output (device).

OpenCV's ``goodFeaturesToTrack`` (the inferred backend of the reference's
flow submodule, SURVEY.md §2.2) returns a variable-length corner list —
hostile to XLA.  Here the detector returns exactly K corners plus a validity
mask: min-eigenvalue response, local-max non-max suppression (which also
enforces the minimum corner distance), relative quality threshold, then
``top_k``.  Downstream consumers (LK, fitness) thread the mask through.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["shi_tomasi_corners"]


def _sobel(img):
    """Sobel gradients with replicate padding; img (H, W) -> (Ix, Iy)."""
    p = jnp.pad(img, 1, mode="edge")
    # horizontal derivative
    ix = (
        (p[:-2, 2:] + 2.0 * p[1:-1, 2:] + p[2:, 2:])
        - (p[:-2, :-2] + 2.0 * p[1:-1, :-2] + p[2:, :-2])
    ) / 8.0
    iy = (
        (p[2:, :-2] + 2.0 * p[2:, 1:-1] + p[2:, 2:])
        - (p[:-2, :-2] + 2.0 * p[:-2, 1:-1] + p[:-2, 2:])
    ) / 8.0
    return ix, iy


def _box_filter(img, size: int):
    """size x size box sum via two cumulative passes (same padding)."""
    r = size // 2
    x = jnp.pad(img, ((r, r), (r, r)))
    x = jnp.cumsum(x, axis=0)
    x = jnp.concatenate([x[size - 1 : size], x[size:] - x[: -size]], axis=0)
    x = jnp.cumsum(x, axis=1)
    x = jnp.concatenate([x[:, size - 1 : size], x[:, size:] - x[:, :-size]], axis=1)
    return x


def _maxpool_same(img, size: int):
    r = size // 2
    return jax.lax.reduce_window(
        img, -jnp.inf, jax.lax.max, (size, size), (1, 1), [(r, r), (r, r)]
    )


def shi_tomasi_corners(
    gray,
    max_corners: int = 128,
    quality_level: float = 0.01,
    min_distance: int = 7,
    block_size: int = 3,
    border: int = 8,
):
    """Detect up to ``max_corners`` Shi-Tomasi corners.

    Args:
      gray: (H, W) float image.
    Returns:
      (positions, mask): positions (K, 2) float32 [x, y] pixel coords,
      mask (K,) bool (True = real corner).
    """
    H, W = gray.shape
    ix, iy = _sobel(gray)
    ixx = _box_filter(ix * ix, block_size)
    iyy = _box_filter(iy * iy, block_size)
    ixy = _box_filter(ix * iy, block_size)

    # min eigenvalue of [[ixx, ixy], [ixy, iyy]]
    tr = ixx + iyy
    det_part = jnp.sqrt(jnp.maximum((ixx - iyy) ** 2 + 4.0 * ixy * ixy, 0.0))
    response = 0.5 * (tr - det_part)

    # suppress the border (LK windows must fit)
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    in_bounds = (
        (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    )
    response = jnp.where(in_bounds, response, -jnp.inf)

    # non-max suppression doubles as the min-distance constraint
    nms_size = 2 * (min_distance // 2) + 1
    is_max = response >= _maxpool_same(response, nms_size)
    response = jnp.where(is_max, response, -jnp.inf)

    flat = response.reshape(-1)
    scores, idx = jax.lax.top_k(flat, max_corners)
    pos_y = (idx // W).astype(jnp.float32)
    pos_x = (idx % W).astype(jnp.float32)
    positions = jnp.stack([pos_x, pos_y], axis=-1)

    best = scores[0]
    mask = (scores > quality_level * best) & jnp.isfinite(scores) & (best > 0)
    return positions, mask

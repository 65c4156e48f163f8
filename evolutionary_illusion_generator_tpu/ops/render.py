"""Batched CPPN image rendering (device).

Reproduces the reference rasterizer semantics (get_image_from_cppn,
generate_illusion.py:372-460) as vectorized jnp over a population axis:

* color gradient=1: one output node per channel, masked to ``bg`` where the
  grid's whitespace sentinel ``x_mat == -1`` applies (:391-403);
* color gradient=0: the first node quantized ``trunc(v*4)`` into the
  {white, R, G, B, black} palette (:404-431 — the reference's ``np.round``
  runs AFTER the uint8 cast, so the effective quantizer is truncation);
* grayscale: single node, rounded when gradient=0 (:434-458).

Outputs are uint8 exactly as a PNG round-trip would store them (the
reference's float->uint8 casts truncate); ``to_unit_float`` rescales to
[0, 1] f32 for the predictor, replacing the reference's PNG-on-disk bus.

One deliberate deviation, documented: node outputs are clipped to [0, 1]
before quantization.  The reference lets out-of-range activations wrap
through the uint8 cast (sin outputs may be negative); clipping keeps the
common case bit-identical while making the rest well-defined.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["render_images", "to_unit_float"]


def render_images(node_outputs, x_mat, c_dim, bg=1, gradient=1):
    """Render a population of CPPN outputs to uint8 images.

    Args:
      node_outputs: (pop, num_outputs, h*w) f32 node values.
      x_mat: (h, w) grid plane; ``-1`` marks whitespace/background.
      c_dim: 1 (grayscale) or 3 (color).
      bg: background intensity, 1=white 0=black (generate_illusion.py:370).
      gradient: 1 for continuous values, 0 for quantized palette.

    Returns:
      (pop, h, w, c_dim) uint8.
    """
    h, w = x_mat.shape
    pop = node_outputs.shape[0]
    mask = (x_mat == -1.0)[None, :, :]  # (1, h, w)

    if c_dim > 1:
        if gradient == 1:
            chans = node_outputs[:, :c_dim, :].reshape(pop, c_dim, h, w)
            chans = jnp.moveaxis(chans, 1, -1)  # (pop, h, w, c)
            chans = jnp.where(mask[..., None], float(bg), jnp.clip(chans, 0.0, 1.0))
            return (chans * 255.0).astype(jnp.uint8)
        # quantized 5-color palette
        v = jnp.clip(node_outputs[:, 0, :].reshape(pop, h, w), 0.0, 1.0)
        color = jnp.floor(v * 4.0).astype(jnp.int32)  # 0..4
        r = jnp.where((color == 0) | (color == 1), 255, 0)
        g = jnp.where((color == 0) | (color == 2), 255, 0)
        b = jnp.where((color == 0) | (color == 3), 255, 0)
        img = jnp.stack([r, g, b], axis=-1)
        img = jnp.where(mask[..., None], bg * 255, img)
        return img.astype(jnp.uint8)

    v = jnp.clip(node_outputs[:, 0, :].reshape(pop, h, w), 0.0, 1.0)
    v = jnp.where(mask, float(bg), v)
    if gradient == 0:
        v = jnp.round(v)
    return (v * 255.0).astype(jnp.uint8)[..., None]


def to_unit_float(images_u8, dtype=jnp.float32):
    """uint8 images -> [0, 1] floats (the PNG-decode the predictor sees)."""
    return images_u8.astype(dtype) / 255.0

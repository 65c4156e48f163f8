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

__all__ = ["render_images", "render_equilum_images", "to_unit_float", "hsv_to_rgb"]


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


def hsv_to_rgb(hsv):
    """Vectorized HSV -> RGB on [0, 1] floats, last axis = (h, s, v)."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == k for k in range(6)], [v, q, p, p, t, v])
    g = jnp.select([i == k for k in range(6)], [t, v, v, q, p, p])
    b = jnp.select([i == k for k in range(6)], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def render_equilum_images(node_outputs, x_mat, bg=1):
    """Equiluminant (HSV) rasterizer.

    Functional rebuild of the reference's dead ``get_equilum_image_from_cppn``
    (generate_illusion.py:333-367; its call is commented out at :511): three
    output nodes are interpreted as H, S, V, background-masked, then
    converted to RGB.  The reference applied ``colorsys.hsv_to_rgb`` to the
    whole array at once — which cannot run as written; this is the working
    per-pixel conversion it intended.
    """
    h, w = x_mat.shape
    pop = node_outputs.shape[0]
    mask = (x_mat == -1.0)[None, :, :, None]
    hsv = node_outputs[:, :3, :].reshape(pop, 3, h, w)
    hsv = jnp.moveaxis(hsv, 1, -1)
    hsv = jnp.where(mask, float(bg), jnp.clip(hsv, 0.0, 1.0))
    rgb = hsv_to_rgb(hsv)
    return (rgb * 255.0).astype(jnp.uint8)

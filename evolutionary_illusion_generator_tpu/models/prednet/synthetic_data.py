"""Synthetic motion sequences for predictor pretraining.

The reference's predictor was trained on first-person motion video (FPSI,
Readme.md:13) — unavailable here.  These sequences capture the property the
fitness oracle needs: a predictor with a MOTION PRIOR (smooth textures
translating at constant velocity), so that repeated static input with
structure resembling motion produces systematic prediction drift.

Each sample: a band-limited random texture translating at a random constant
subpixel velocity, sampled bilinearly from a larger texture canvas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["synthetic_motion_batch"]


def _smooth_texture(key, h, w, scale: int = 8):
    """Band-limited random texture in [0, 1] via low-res bilinear upsample."""
    lh, lw = h // scale + 2, w // scale + 2
    low = jax.random.uniform(key, (lh, lw))
    yy = jnp.linspace(0, lh - 1.001, h)
    xx = jnp.linspace(0, lw - 1.001, w)
    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    fy = (yy - y0)[:, None]
    fx = (xx - x0)[None, :]
    v00 = low[y0][:, x0]
    v01 = low[y0][:, x0 + 1]
    v10 = low[y0 + 1][:, x0]
    v11 = low[y0 + 1][:, x0 + 1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def _sample_shifted(tex, dx, dy, h, w, margin):
    """Bilinear crop of (h, w) at offset (margin + dx, margin + dy)."""
    yy = jnp.arange(h, dtype=jnp.float32) + margin + dy
    xx = jnp.arange(w, dtype=jnp.float32) + margin + dx
    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    fy = (yy - y0)[:, None]
    fx = (xx - x0)[None, :]
    v00 = tex[y0][:, x0]
    v01 = tex[y0][:, x0 + 1]
    v10 = tex[y0 + 1][:, x0]
    v11 = tex[y0 + 1][:, x0 + 1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def synthetic_motion_batch(
    key, batch, T, h, w, c, max_speed: float = 2.0, static_fraction: float = 0.0
):
    """(batch, T, h, w, c) float32 sequences of translating textures.

    ``static_fraction`` of the batch gets zero velocity — repeated static
    frames, the regime the fitness oracle probes (the predictor must settle
    to ~zero drift on truly static input so that only structure-driven
    drift survives the plausibility gates)."""

    def one(key):
        k_tex, k_vel, k_chan, k_static = jax.random.split(key, 4)
        margin = int(max_speed * T) + 2
        vel = jax.random.uniform(k_vel, (2,), minval=-max_speed, maxval=max_speed)
        static = jax.random.uniform(k_static, ()) < static_fraction
        vel = jnp.where(static, 0.0, vel)

        def chan(kc):
            tex = _smooth_texture(kc, h + 2 * margin, w + 2 * margin)

            def frame(t):
                return _sample_shifted(
                    tex, vel[0] * t, vel[1] * t, h, w, margin
                )

            return jax.vmap(frame)(jnp.arange(T, dtype=jnp.float32))

        chans = jax.vmap(chan)(jax.random.split(k_chan, c))  # (c, T, h, w)
        return jnp.moveaxis(chans, 0, -1)  # (T, h, w, c)

    return jax.vmap(one)(jax.random.split(key, batch))

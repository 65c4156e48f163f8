"""Iterative pyramidal Lucas-Kanade (device, fixed-K corners).

The classic Bouguet formulation OpenCV's ``calcOpticalFlowPyrLK`` implements
(the inferred backend of the reference's flow submodule): per pyramid level,
coarse to fine, each corner solves the 2x2 normal equations of

    min_d  sum_win (I0(p + o) - I1(p + o + d))^2

with a fixed window, bilinear sampling, and Newton iterations; the solved
displacement doubles when descending a level.  Everything is fixed-shape:
K corners x win^2 window samples, vmappable over a population axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .pyramid import build_pyramid

__all__ = ["pyramid_lk"]


def _bilinear(img, x, y):
    """Sample img (H, W) at float coords; clamps to the border."""
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _scharr(img):
    """3x3 Scharr derivatives (OpenCV LK uses Scharr for window gradients)."""
    p = jnp.pad(img, 1, mode="edge")
    ix = (
        3.0 * (p[:-2, 2:] - p[:-2, :-2])
        + 10.0 * (p[1:-1, 2:] - p[1:-1, :-2])
        + 3.0 * (p[2:, 2:] - p[2:, :-2])
    ) / 32.0
    iy = (
        3.0 * (p[2:, :-2] - p[:-2, :-2])
        + 10.0 * (p[2:, 1:-1] - p[:-2, 1:-1])
        + 3.0 * (p[2:, 2:] - p[:-2, 2:])
    ) / 32.0
    return ix, iy


def _track_level(img0, img1, pos, guess, offsets, iters, min_eig_threshold):
    """One pyramid level for all K corners.

    pos: (K, 2) corner coords at THIS level; guess: (K, 2) incoming flow.
    Returns (flow (K, 2), ok (K,)).
    """
    ix, iy = _scharr(img0)

    ox = offsets[:, 0][None, :]  # (1, win2)
    oy = offsets[:, 1][None, :]
    px = pos[:, 0][:, None] + ox  # (K, win2)
    py = pos[:, 1][:, None] + oy

    w_i0 = _bilinear(img0, px, py)
    w_ix = _bilinear(ix, px, py)
    w_iy = _bilinear(iy, px, py)

    gxx = jnp.sum(w_ix * w_ix, axis=1)
    gxy = jnp.sum(w_ix * w_iy, axis=1)
    gyy = jnp.sum(w_iy * w_iy, axis=1)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0)))
    ok = min_eig / offsets.shape[0] > min_eig_threshold
    safe_det = jnp.where(det == 0, 1.0, det)

    def body(_, d):
        qx = px + d[:, 0][:, None]
        qy = py + d[:, 1][:, None]
        w_i1 = _bilinear(img1, qx, qy)
        diff = w_i0 - w_i1
        bx = jnp.sum(diff * w_ix, axis=1)
        by = jnp.sum(diff * w_iy, axis=1)
        dx = (gyy * bx - gxy * by) / safe_det
        dy = (gxx * by - gxy * bx) / safe_det
        step = jnp.stack([dx, dy], axis=-1)
        return d + jnp.where(ok[:, None], step, 0.0)

    flow = jax.lax.fori_loop(0, iters, body, guess)
    return flow, ok


def pyramid_lk(
    gray0,
    gray1,
    positions,
    mask,
    *,
    levels: int = 3,
    win: int = 21,
    iters: int = 12,
    min_eig_threshold: float = 1e-4,
    max_residual: float = 1.0,
):
    """Track ``positions`` from gray0 to gray1.

    Args:
      gray0, gray1: (H, W) float images in [0, 1].
      positions: (K, 2) [x, y] corner coords (full resolution).
      mask: (K,) validity of each corner.
    Returns:
      (flow, ok): flow (K, 2) [dx, dy] px; ok (K,) = mask & trackable &
      still inside the image & window residual below ``max_residual``.
    """
    H, W = gray0.shape
    pyr0 = build_pyramid(gray0, levels)
    pyr1 = build_pyramid(gray1, levels)

    r = win // 2
    o = jnp.arange(-r, r + 1, dtype=jnp.float32)
    offsets = jnp.stack(
        [jnp.tile(o, win), jnp.repeat(o, win)], axis=-1
    )  # (win2, 2) [x, y]

    K = positions.shape[0]
    flow = jnp.zeros((K, 2), jnp.float32)
    ok = mask
    for lvl in reversed(range(levels)):
        scale = 2.0**lvl
        pos_l = positions / scale
        flow, ok_l = _track_level(
            pyr0[lvl], pyr1[lvl], pos_l, flow, offsets, iters, min_eig_threshold
        )
        ok = ok & ok_l
        if lvl > 0:
            flow = flow * 2.0

    # reject tracks that left the image
    end = positions + flow
    inside = (
        (end[:, 0] >= 0)
        & (end[:, 0] <= W - 1)
        & (end[:, 1] >= 0)
        & (end[:, 1] <= H - 1)
    )

    # forward residual check: mean abs window difference at the solution
    px = positions[:, 0][:, None] + offsets[:, 0][None, :]
    py = positions[:, 1][:, None] + offsets[:, 1][None, :]
    w0 = _bilinear(gray0, px, py)
    w1 = _bilinear(gray1, px + flow[:, 0][:, None], py + flow[:, 1][:, None])
    residual = jnp.mean(jnp.abs(w0 - w1), axis=1)

    return flow, ok & inside & (residual < max_residual)

"""Flow API: device batched extractor + reference-parity file interface.

``lucas_kanade`` keeps the exact call shape of the reference's flow
submodule (generate_illusion.py:549-554): two image paths in, ``{"vectors":
[[x, y, dx, dy], ...]}`` out, optional arrow-overlay PNG.  ``batched_flow``
is the TPU-native path: (pop, H, W) frame pairs in, fixed-K masked vector
tensors out, one jitted program, no filesystem.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .corners import shi_tomasi_corners
from .lk import pyramid_lk
from .pyramid import to_gray

__all__ = ["FlowConfig", "flow_vectors", "batched_flow", "lucas_kanade"]


@dataclass(frozen=True)
class FlowConfig:
    """Sparse-flow parameters (OpenCV-comparable defaults)."""

    max_corners: int = 128
    quality_level: float = 0.01
    min_distance: int = 7
    block_size: int = 3
    levels: int = 3
    win: int = 21
    iters: int = 12
    min_eig_threshold: float = 1e-4
    max_residual: float = 1.0
    # LK window/gather compute dtype ("float32" | "bfloat16").  bfloat16
    # halves the iteration loop's gather bandwidth; the 2x2 solve, flow
    # state, accumulations and the residual gate stay f32 (ops/flow/lk.py).
    # Opt-in pending the measured go/no-go + rated-ordering gate.
    lk_dtype: str = "float32"


def flow_vectors(gray0, gray1, cfg: FlowConfig = FlowConfig()):
    """Corners on gray0, LK track to gray1.

    Returns (vectors (K, 4) [x, y, dx, dy], mask (K,)).
    """
    positions, mask = shi_tomasi_corners(
        gray0,
        max_corners=cfg.max_corners,
        quality_level=cfg.quality_level,
        min_distance=cfg.min_distance,
        block_size=cfg.block_size,
        border=cfg.win // 2 + 1,
    )
    flow, ok = pyramid_lk(
        gray0,
        gray1,
        positions,
        mask,
        levels=cfg.levels,
        win=cfg.win,
        iters=cfg.iters,
        min_eig_threshold=cfg.min_eig_threshold,
        max_residual=cfg.max_residual,
        dtype=jnp.dtype(cfg.lk_dtype),
    )
    return jnp.concatenate([positions, flow], axis=-1), ok


def batched_flow(frames0, frames1, cfg: FlowConfig = FlowConfig()):
    """Population flow: frames (pop, H, W, C) [0,1] -> ((pop, K, 4), (pop, K)).

    Corner detection runs on ``frames0`` (the reference detects on the first
    frame of each pair).
    """
    g0 = to_gray(frames0)
    g1 = to_gray(frames1)
    return jax.vmap(lambda a, b: flow_vectors(a, b, cfg))(g0, g1)


def lucas_kanade(
    image0_path: str,
    image1_path: str,
    output_dir: str = ".",
    save: bool = False,
    verbose: int = 0,
    save_name: Optional[str] = None,
    cfg: FlowConfig = FlowConfig(),
):
    """Reference-parity file interface (generate_illusion.py:549-554).

    Returns ``{"vectors": [[x, y, dx, dy], ...]}`` — an empty list when
    nothing was trackable, which callers replace with the reference's
    ``[[0, 0, -1000, 0]]`` sentinel.
    """
    from ...utils.image_io import draw_flow_overlay, load_image

    img0 = load_image(image0_path, c_dim=3)
    img1 = load_image(image1_path, c_dim=3)
    vectors, mask = flow_vectors(
        to_gray(jnp.asarray(img0)), to_gray(jnp.asarray(img1)), cfg
    )
    vectors = np.asarray(vectors)[np.asarray(mask)]
    if verbose:
        print(f"lucas_kanade: {len(vectors)} vectors")
    if save and save_name:
        draw_flow_overlay(img0, vectors, save_name)
    return {"vectors": vectors.tolist()}

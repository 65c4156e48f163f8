"""Per-generation best-candidate artifacts.

Parity with the reference artifact contract (SURVEY.md Appendix B,
generate_illusion.py:649-673): ``best.png``, ``best_flow.png`` (arrow
overlay), ``best_black_bg.png`` (re-render with black background), and the
800x800 ``enhanced.png`` poster tiling.  Files are overwritten each
generation, exactly like the reference.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..models.cppn import evaluate_population, pack_population
from ..neat.config import NeatConfig
from ..neat.genome import Genome
from ..ops.grids import enhanced_image_grid
from ..ops.render import render_images
from ..structure import StructureType
from ..utils.image_io import draw_flow_overlay, save_image

__all__ = ["render_genome", "save_best_artifacts"]

ENHANCED_SIZE = 800  # generate_illusion.py:666-667

#: Fixed CPPN slot bucket for artifact renders: a stable shape keeps the
#: (eager) evaluator's scan cache warm across generations.
_RENDER_BUCKET = 128


@functools.lru_cache(maxsize=8)
def _cached_grid(structure: StructureType, w: int, h: int):
    from ..ops.grids import GRID_SCALING, create_grid

    return create_grid(structure, w, h, GRID_SCALING)


@functools.lru_cache(maxsize=8)
def _cached_enhanced_grid(size: int, structure: StructureType):
    return enhanced_image_grid(size, size, structure)


def render_genome(
    genome: Genome,
    neat_cfg: NeatConfig,
    grid: dict,
    c_dim: int,
    bg: int = 1,
    gradient: int = 1,
) -> np.ndarray:
    """Render a single genome on an arbitrary grid; returns (h, w, c) uint8."""
    x_mat = np.asarray(grid["x_mat"])
    h, w = x_mat.shape
    from ..models.cppn import required_nodes

    need = len(required_nodes(genome, neat_cfg))
    bucket = _RENDER_BUCKET
    while bucket < need:
        bucket *= 2
    packed = pack_population([genome], neat_cfg, bucket)
    flat = jnp.stack(
        [
            jnp.asarray(grid["x_mat"], jnp.float32).reshape(-1),
            jnp.asarray(grid["y_mat"], jnp.float32).reshape(-1),
        ]
    )
    outs = evaluate_population(
        jnp.asarray(packed["weights"]),
        jnp.asarray(packed["bias"]),
        jnp.asarray(packed["response"]),
        jnp.asarray(packed["act_id"]),
        jnp.asarray(packed["out_slot"]),
        flat,
    )
    img = render_images(outs, jnp.asarray(x_mat), c_dim, bg=bg, gradient=gradient)
    return np.asarray(img)[0]


def save_best_artifacts(
    best_genome: Genome,
    best_image_u8: np.ndarray,
    best_vectors: np.ndarray,
    flow_frame0: Optional[np.ndarray],
    neat_cfg: NeatConfig,
    structure: StructureType,
    c_dim: int,
    gradient: int,
    best_dir: str,
    enhanced: bool = True,
) -> None:
    """Write the per-generation winner artifacts into ``best_dir``."""
    os.makedirs(best_dir, exist_ok=True)
    save_image(best_image_u8, os.path.join(best_dir, "best.png"))

    # arrow overlay on the first flow frame (the reference overlays on the
    # prediction frame the flow ran on, generate_illusion.py:548-550)
    base = flow_frame0 if flow_frame0 is not None else best_image_u8
    draw_flow_overlay(
        np.asarray(base), best_vectors, os.path.join(best_dir, "best_flow.png")
    )

    h, w = best_image_u8.shape[:2]
    grid = _cached_grid(structure, w, h)
    black = render_genome(best_genome, neat_cfg, grid, c_dim, bg=0, gradient=gradient)
    save_image(black, os.path.join(best_dir, "best_black_bg.png"))

    if enhanced:
        e_grid = _cached_enhanced_grid(ENHANCED_SIZE, structure)
        poster = render_genome(
            best_genome, neat_cfg, e_grid, c_dim, bg=1, gradient=gradient
        )
        save_image(poster, os.path.join(best_dir, "enhanced.png"))

"""Equiluminant rendering through the generation evaluator."""

from random import Random

import numpy as np
import pytest

import jax

from evolutionary_illusion_generator_tpu.evolution.evaluator import (
    EvalConfig,
    GenerationEvaluator,
)
from evolutionary_illusion_generator_tpu.models.prednet import init_params
from evolutionary_illusion_generator_tpu.neat import Genome, preset
from evolutionary_illusion_generator_tpu.ops.flow import FlowConfig
from evolutionary_illusion_generator_tpu.structure import StructureType


def test_equilum_generation():
    neat_cfg = preset("circles").replace(num_hidden=4)
    params = init_params(jax.random.PRNGKey(0), (3, 4, 8))
    cfg = EvalConfig(
        structure=StructureType.Circles,
        w=48,
        h=40,
        c_dim=3,
        equilum=True,
        flow=FlowConfig(max_corners=16, win=9, levels=2, iters=4),
        repeat=4,
    )
    ev = GenerationEvaluator(cfg, params, neat_cfg)
    rng = Random(0)
    genomes = [Genome.new(i, neat_cfg, rng) for i in range(4)]
    out = ev.evaluate_images(genomes).to_numpy()
    assert out["images_u8"].shape == (4, 40, 48, 3)
    # whitespace background in HSV(1,1,1) renders pure red
    ys, xs = np.where(
        np.asarray(
            __import__(
                "evolutionary_illusion_generator_tpu.ops.grids",
                fromlist=["create_grid"],
            ).create_grid(StructureType.Circles, 48, 40, 10)["x_mat"]
        )
        == -1
    )
    px = out["images_u8"][0, ys[0], xs[0]]
    np.testing.assert_array_equal(px, [255, 0, 0])


def test_equilum_requires_color():
    with pytest.raises(ValueError):
        GenerationEvaluator(
            EvalConfig(c_dim=1, equilum=True),
            init_params(jax.random.PRNGKey(0), (1, 4)),
            preset("circles_bw"),
        )

"""On-device scoring path: wiring + agreement with host f64 scoring."""

from random import Random

import numpy as np

import jax

from evolutionary_illusion_generator_tpu.evolution.evaluator import (
    EvalConfig,
    GenerationEvaluator,
)
from evolutionary_illusion_generator_tpu.models.prednet import init_params
from evolutionary_illusion_generator_tpu.neat import Genome, preset
from evolutionary_illusion_generator_tpu.ops.flow import FlowConfig
from evolutionary_illusion_generator_tpu.structure import StructureType

TINY_FLOW = FlowConfig(max_corners=32, win=9, levels=2, iters=6)


def test_device_scores_match_host():
    neat_cfg = preset("circles_bw").replace(num_hidden=4)
    params = init_params(jax.random.PRNGKey(0), (1, 4, 8))
    common = dict(
        structure=StructureType.Free,  # exercises swarm/strength/count blend
        w=64,
        h=48,
        c_dim=1,
        gradient=0,
        repeat=6,
        flow=TINY_FLOW,
    )
    rng = Random(1)
    genomes = [Genome.new(i, neat_cfg, rng) for i in range(6)]
    for g in genomes:
        g.mutate(neat_cfg, rng)

    ev_dev = GenerationEvaluator(
        EvalConfig(score_on_device=True, **common), params, neat_cfg
    )
    ev_host = GenerationEvaluator(
        EvalConfig(score_on_device=False, score_backend="numpy", **common),
        params,
        neat_cfg,
    )
    dev_scores = ev_dev([(g.key, g) for g in genomes])
    host_scores = ev_host([(g.key, g) for g in genomes])
    np.testing.assert_allclose(dev_scores, host_scores, rtol=1e-3, atol=1e-5)
    # identical fitness ordering
    assert list(np.argsort(dev_scores)) == list(np.argsort(host_scores))

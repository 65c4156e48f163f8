"""CLI-surfaced knobs: pertype_count multi-render, equilum flag plumbing,
TensorBoard reporter (VERDICT round-1 item 8)."""

import os
from random import Random

import numpy as np

import jax

from evolutionary_illusion_generator_tpu.cli import build_parser
from evolutionary_illusion_generator_tpu.evolution.evaluator import (
    EvalConfig,
    GenerationEvaluator,
)
from evolutionary_illusion_generator_tpu.models.prednet import init_params
from evolutionary_illusion_generator_tpu.neat import Genome, preset
from evolutionary_illusion_generator_tpu.ops.flow import FlowConfig
from evolutionary_illusion_generator_tpu.structure import StructureType


def _make_eval(pertype_count: int) -> GenerationEvaluator:
    neat_cfg = preset("circles").replace(num_hidden=4)
    params = init_params(jax.random.PRNGKey(0), (3, 4, 8))
    cfg = EvalConfig(
        structure=StructureType.Circles,
        w=48,
        h=40,
        c_dim=3,
        flow=FlowConfig(max_corners=16, win=9, levels=2, iters=4),
        repeat=4,
        pertype_count=pertype_count,
    )
    return GenerationEvaluator(cfg, params, neat_cfg)


def test_pertype_count_mean_over_identical_renders():
    """The latent value never reaches the renderer (reference quirk,
    generate_illusion.py:495-530), so renders are identical and the
    per-genome mean must equal the single-render score; device rows carry
    pertype_count renders per genome."""
    rng = Random(0)
    genomes = [Genome.new(i, preset("circles").replace(num_hidden=4), rng)
               for i in range(3)]
    for g in genomes:
        g.mutate(preset("circles").replace(num_hidden=4), rng)
    items = [(g.key, g) for g in genomes]

    ev1 = _make_eval(1)
    s1 = np.asarray(ev1(items))

    ev2 = _make_eval(2)
    s2 = np.asarray(ev2(items))

    np.testing.assert_allclose(s2, s1, rtol=0, atol=0)
    res = ev2.last_results
    # rows are per render: 3 genomes x 2 renders
    assert res["vectors"].shape[0] == 6
    assert res["best_row"] // 2 == res["best_idx"]
    for g, s in zip(genomes, s2):
        assert g.fitness == float(s)


def test_cli_flags_exist_and_parse():
    args = build_parser().parse_args(
        ["--equilum", "--pertype_count", "2", "--tensorboard"]
    )
    assert args.equilum is True
    assert args.pertype_count == 2
    assert args.tensorboard is True


def test_tensorboard_reporter_writes_events(tmp_path):
    from evolutionary_illusion_generator_tpu.neat import TensorBoardReporter
    from evolutionary_illusion_generator_tpu.neat.species import SpeciesSet

    neat_cfg = preset("circles_bw")
    rng = Random(1)
    pop = {i: Genome.new(i, neat_cfg, rng) for i in range(4)}
    for g in pop.values():
        g.fitness = rng.random()
    species = SpeciesSet()
    species.speciate(neat_cfg, pop, generation=0)

    log_dir = str(tmp_path / "tb")
    rep = TensorBoardReporter(log_dir)
    rep.start_generation(0)
    best = max(pop.values(), key=lambda g: g.fitness)
    rep.post_evaluate(pop, species, best)
    rep.close()
    events = [f for f in os.listdir(log_dir) if "tfevents" in f]
    assert events, os.listdir(log_dir)


def test_s2d_evaluator_smoke_and_score_parity():
    """EvalConfig.s2d_l0 evaluates end-to-end; at f32 predictor dtype the
    layout change is accumulation-order-only, so tiny-config scores match
    the default path bit-for-bit after the flow stage's own rounding."""
    from random import Random

    import jax
    import numpy as np

    from evolutionary_illusion_generator_tpu.evolution.evaluator import (
        EvalConfig,
        GenerationEvaluator,
    )
    from evolutionary_illusion_generator_tpu.models.prednet import init_params
    from evolutionary_illusion_generator_tpu.neat.config import preset
    from evolutionary_illusion_generator_tpu.neat.genome import Genome
    from evolutionary_illusion_generator_tpu.ops.flow import FlowConfig
    from evolutionary_illusion_generator_tpu.structure import StructureType

    neat_cfg = preset("circles").replace(num_hidden=4)
    params = init_params(jax.random.PRNGKey(0), (3, 4, 8))
    base = dict(
        structure=StructureType.Circles,
        w=48,
        h=40,
        c_dim=3,
        flow=FlowConfig(max_corners=16, win=9, levels=2, iters=4),
        repeat=4,
        prednet_dtype="float32",
        program_cache=False,
    )
    rng = Random(0)
    genomes = [Genome.new(i, neat_cfg, rng) for i in range(4)]
    pairs = [(g.key, g) for g in genomes]
    plain = np.asarray(GenerationEvaluator(
        EvalConfig(**base), params, neat_cfg)(pairs))
    s2d = np.asarray(GenerationEvaluator(
        EvalConfig(**base, s2d_l0=True), params, neat_cfg)(pairs))
    assert s2d.shape == plain.shape
    assert np.all(np.isfinite(s2d))
    np.testing.assert_allclose(s2d, plain, rtol=1e-4, atol=1e-4)

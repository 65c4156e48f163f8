"""End-to-end slice: seeded NEAT run with a tiny fixed-weight predictor
(SURVEY.md §4: deterministic generation test with a stand-in model)."""

import glob
import json
import os

import numpy as np
import pytest

from evolutionary_illusion_generator_tpu.evolution import neat_illusion
from evolutionary_illusion_generator_tpu.neat import preset
from evolutionary_illusion_generator_tpu.ops.flow import FlowConfig
from evolutionary_illusion_generator_tpu.structure import StructureType

W, H = 48, 40
CHANNELS = (1, 4, 8)
TINY_FLOW = FlowConfig(max_corners=32, win=9, levels=2, iters=6)


def tiny_cfg():
    return preset("circles_bw").replace(
        pop_size=4, num_hidden=4, min_species_size=4, elitism=2
    )


@pytest.mark.parametrize("structure", [StructureType.Circles, StructureType.Free])
def test_two_generations_with_artifacts(tmp_path, structure):
    out = str(tmp_path / "run")
    pop = neat_illusion(
        out,
        None,
        tiny_cfg(),
        structure,
        w=W,
        h=H,
        channels=CHANNELS,
        c_dim=1,
        gradient=0,
        generations=2,
        seed=1,
        use_pallas=False,
        flow=TINY_FLOW,
        quiet=True,
    )
    assert pop.generation == 2
    assert pop.best_genome is not None
    for name in ("best.png", "best_flow.png", "best_black_bg.png", "enhanced.png"):
        assert os.path.exists(os.path.join(out, name)), name
    # per-gen checkpoints + JSONL metrics
    assert glob.glob(os.path.join(out, "neat-checkpoint-*"))
    with open(os.path.join(out, "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert len(recs) == 2
    assert recs[0]["generation"] == 0 and recs[1]["generation"] == 1
    assert recs[0]["pop_size"] >= 4


def test_resume_from_checkpoint(tmp_path):
    out = str(tmp_path / "run")
    neat_illusion(
        out, None, tiny_cfg(), StructureType.Circles,
        w=W, h=H, channels=CHANNELS, c_dim=1, gradient=0,
        generations=2, seed=3, use_pallas=False, flow=TINY_FLOW,
        quiet=True, save_artifacts=False,
    )
    cks = sorted(
        glob.glob(os.path.join(out, "neat-checkpoint-*")),
        key=lambda p: int(p.rsplit("-", 1)[-1]),
    )
    pop = neat_illusion(
        out, None, tiny_cfg(), StructureType.Circles,
        w=W, h=H, channels=CHANNELS, c_dim=1, gradient=0,
        checkpoint=cks[-1], generations=1, seed=3, use_pallas=False,
        flow=TINY_FLOW, quiet=True, save_artifacts=False,
    )
    assert pop.generation == 3


def test_deterministic_across_runs(tmp_path):
    fits = []
    for trial in range(2):
        out = str(tmp_path / f"run{trial}")
        pop = neat_illusion(
            out, None, tiny_cfg(), StructureType.Circles,
            w=W, h=H, channels=CHANNELS, c_dim=1, gradient=0,
            generations=2, seed=7, use_pallas=False, flow=TINY_FLOW,
            quiet=True, save_artifacts=False,
        )
        fits.append(sorted((k, g.fitness) for k, g in pop.population.items()))
    assert fits[0] == fits[1]

"""One-generation e2e runs for the remaining structure families.

Bands requires the full-size band geometry (4 bands of h/4 with 10-px
padding), so these run at the reference's small size (160x120) with a tiny
predictor and one generation.
"""

import os

import pytest

from evolutionary_illusion_generator_tpu.evolution import neat_illusion
from evolutionary_illusion_generator_tpu.neat import preset
from evolutionary_illusion_generator_tpu.ops.flow import FlowConfig
from evolutionary_illusion_generator_tpu.structure import StructureType

TINY_FLOW = FlowConfig(max_corners=32, win=9, levels=2, iters=4)


@pytest.mark.parametrize(
    "structure,gradient",
    [
        (StructureType.Bands, 1),
        (StructureType.CirclesFree, 0),
    ],
)
def test_one_generation(tmp_path, structure, gradient):
    out = str(tmp_path / "run")
    cfg = preset("circles_bw").replace(
        pop_size=4, num_hidden=4, min_species_size=4, elitism=2
    )
    pop = neat_illusion(
        out,
        None,
        cfg,
        structure,
        w=160,
        h=120,
        channels=(1, 4, 8),
        c_dim=1,
        gradient=gradient,
        generations=1,
        seed=2,
        flow=TINY_FLOW,
        quiet=True,
    )
    assert pop.generation == 1
    # population has been reproduced for the next generation; the evaluated
    # best of the finished generation is recorded on the Population
    assert pop.best_genome is not None
    assert isinstance(pop.best_genome.fitness, float)
    for name in ("best.png", "best_flow.png", "best_black_bg.png", "enhanced.png"):
        assert os.path.exists(os.path.join(out, name)), name

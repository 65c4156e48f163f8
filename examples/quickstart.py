"""Quickstart — the notebook workflow (illusion_generation.ipynb) as a script.

Runs a short evolution on the small grayscale circles config with a seeded
stand-in predictor, then re-scores the winning image through the
single-image probe, mirroring notebook cells 12 and 16-18.

    python examples/quickstart.py [output_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from evolutionary_illusion_generator_tpu.evolution import neat_illusion
from evolutionary_illusion_generator_tpu.evolution.probe import score_image
from evolutionary_illusion_generator_tpu.neat import preset
from evolutionary_illusion_generator_tpu.structure import StructureType


def main(output_dir: str = "quickstart_results") -> None:
    # --- evolve (notebook cell 12: generate_illusion.py -s 1 ...) -------
    pop = neat_illusion(
        output_dir,
        model_name=None,  # no .model file -> the bundled stand-in weights
        # for this channel stack (load_or_init falls back to a seeded random
        # predictor only when no stand-in is shipped either)
        config=preset("circles_bw").replace(pop_size=8, min_species_size=4),
        structure=StructureType.Circles,
        w=160,
        h=120,
        channels=(1, 16, 32, 64),
        c_dim=1,
        gradient=0,
        generations=3,
        seed=0,
    )
    print(f"best fitness after {pop.generation} generations:",
          pop.best_genome.fitness)
    print("artifacts:", sorted(os.listdir(output_dir)))

    # --- single-image probe (notebook cells 16-18) ----------------------
    best_png = os.path.join(output_dir, "best.png")
    score = score_image(
        best_png,
        structure=StructureType.Circles,
        channels=(1, 16, 32, 64),
        w=160,
        h=120,
    )
    print("probe re-score of best.png:", score)


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["quickstart_results"]))

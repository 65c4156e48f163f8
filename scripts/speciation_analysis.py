"""Speciation-plateau anatomy (VERDICT r3 weak #6) — reproducible evidence.

Two measurements behind the ROADMAP.md "Speciation plateau: analyzed, no
bug" section:

1. **Checkpoint distance anatomy**: pairwise compatibility distances inside
   the 100-generation circles_bw deep run (gallery/circles_bw_deep
   checkpoints).  Result: no pair ever crosses the reference's 3.0
   threshold (max 2.64-2.76 at every checkpoint) — a single species is the
   forced outcome of the reference's own distance function on these
   populations.

2. **Isolated-lineage divergence**: two populations evolved 100 generations
   under the same circles_bw config with NO interbreeding (independent
   seeds; deterministic structure-sensitive synthetic fitness so selection
   pressure is real).  Result: cross-lineage distances exceed 3.0 for ~71%
   of pairs (max ~3.59) while within-lineage stays < 2.25, and speciating
   the merged population splits it — the metric and machinery CAN split at
   this genome scale; crossover gene flow is what keeps one population
   compatible.

Guarded by tests/test_neat_internals.py::
TestSpeciationSplitsAtReferenceThreshold.  Host-only, no device needed.

    python scripts/speciation_analysis.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from random import Random  # noqa: E402

import numpy as np  # noqa: E402

from evolutionary_illusion_generator_tpu.neat import Population, preset  # noqa: E402
from evolutionary_illusion_generator_tpu.neat.checkpoint import (  # noqa: E402
    restore_checkpoint,
)
from evolutionary_illusion_generator_tpu.neat.species import SpeciesSet  # noqa: E402

DEEP_RUN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gallery",
    "circles_bw_deep",
)


def checkpoint_anatomy():
    print("== deep-run checkpoint distance anatomy ==")
    for gen in (25, 50, 75, 100):
        path = os.path.join(DEEP_RUN, f"neat-checkpoint-{gen}")
        if not os.path.exists(path):
            print(f"gen {gen}: checkpoint missing, skipped")
            continue
        pop = restore_checkpoint(path)
        genomes = list(pop.population.values())
        cfg = pop.config
        ds = np.array(
            [
                g1.distance(g2, cfg)
                for i, g1 in enumerate(genomes)
                for g2 in genomes[i + 1:]
            ]
        )
        nodes = [len(g.nodes) for g in genomes]
        print(
            f"gen {gen:3d}: pop {len(genomes)}, dist mean {ds.mean():.3f} "
            f"max {ds.max():.3f} (threshold {cfg.compatibility_threshold}) "
            f"| nodes {min(nodes)}-{max(nodes)} "
            f"| frac>thr {(ds > cfg.compatibility_threshold).mean():.3f}"
        )


def synth_fitness(items, _config):
    """Deterministic structure-sensitive fitness: real selection pressure
    without the device pipeline."""
    for _gid, g in items:
        ws = [c.weight for c in g.connections.values() if c.enabled]
        g.fitness = float(np.tanh(abs(sum(ws)) / (1 + len(ws))))


def isolated_lineages(generations=100, seeds=(101, 202)):
    print("== isolated-lineage divergence ==")
    cfg = preset("circles_bw")
    lineages = []
    for seed in seeds:
        p = Population(cfg, seed=seed)
        for _ in range(generations):
            p.run_generation(synth_fitness)
        print(
            f"seed {seed}: gen {p.generation}, "
            f"species {len(p.species_set.species)}"
        )
        lineages.append(list(p.population.values()))

    a, b = lineages
    cross = np.array([g1.distance(g2, cfg) for g1 in a for g2 in b])
    within = np.array(
        [g1.distance(g2, cfg) for i, g1 in enumerate(a) for g2 in a[i + 1:]]
    )
    print(
        f"cross-lineage dist: mean {cross.mean():.3f} max {cross.max():.3f} "
        f"frac>{cfg.compatibility_threshold} "
        f"{(cross > cfg.compatibility_threshold).mean():.3f}"
    )
    print(f"within-lineage dist: mean {within.mean():.3f} max {within.max():.3f}")

    merged = {i: g for i, g in enumerate(a + b)}
    ss = SpeciesSet()
    ss.speciate(cfg, merged, 0)
    print(
        f"merged speciation: {len(ss.species)} species, sizes "
        f"{sorted(len(s.members) for s in ss.species.values())}"
    )


if __name__ == "__main__":
    checkpoint_anatomy()
    isolated_lineages()

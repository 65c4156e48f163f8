"""Tests for the host-side NEAT engine."""

import os

import pytest

from evolutionary_illusion_generator_tpu.neat import (
    Genome,
    NeatConfig,
    Population,
    creates_cycle,
    load_config,
    preset,
    restore_checkpoint,
    save_checkpoint,
)
from random import Random


REFERENCE_CONFIG_DIR = "/root/reference/neat_configs"


class TestConfig:
    @pytest.mark.skipif(
        not os.path.isdir(REFERENCE_CONFIG_DIR),
        reason="reference INI files not available",
    )
    @pytest.mark.parametrize(
        "name", ["circles", "circles_bw", "free", "default", "bands"]
    )
    def test_presets_match_reference_inis_mechanically(self, name):
        """Every preset must equal the repo loader's parse of the reference
        INI file, field for field (no hand-transcribed expected values)."""
        import dataclasses

        loaded = load_config(os.path.join(REFERENCE_CONFIG_DIR, f"{name}.txt"))
        built = preset(name)
        for f in dataclasses.fields(NeatConfig):
            assert getattr(loaded, f.name) == getattr(built, f.name), (
                name, f.name, getattr(loaded, f.name), getattr(built, f.name),
            )

    def test_preset_smoke_without_reference(self):
        # keep a minimal guard that runs even without /root/reference
        c = preset("circles")
        assert (c.pop_size, c.num_inputs, c.num_outputs) == (5, 2, 3)

    def test_ini_loader(self, tmp_path):
        ini = """
[NEAT]
no_fitness_termination = True
fitness_criterion     = mean
fitness_threshold     = 0.3
pop_size              = 7
reset_on_extinction   = False

[DefaultGenome]
activation_default      = sin
activation_options      = sin tanh
num_hidden              = 3
num_inputs              = 2
num_outputs             = 1
feed_forward            = True
initial_connection      = partial_nodirect 0.5

[DefaultSpeciesSet]
compatibility_threshold = 2.5

[DefaultStagnation]
species_fitness_func = max
max_stagnation       = 15

[DefaultReproduction]
elitism            = 1
survival_threshold = 0.4
min_species_size = 3
"""
        p = tmp_path / "cfg.txt"
        p.write_text(ini)
        c = load_config(str(p))
        assert c.pop_size == 7
        assert c.activation_options == ("sin", "tanh")
        assert c.num_hidden == 3
        assert c.compatibility_threshold == 2.5
        assert c.max_stagnation == 15
        assert c.min_species_size == 3
        assert c.initial_connection_kind == ("partial_nodirect", 0.5)


class TestGenome:
    def test_new_structure(self):
        cfg = preset("circles")
        g = Genome.new(1, cfg, Random(0))
        # outputs 0..2 plus 20 hidden
        assert set(g.nodes) == set(range(23))
        # nodirect: no input->output edges when hidden nodes exist
        for (i, o) in g.connections:
            assert not (i < 0 and o in cfg.output_keys)
        # with p=0.8 over 2*20 + 20*3 = 100 candidates, expect plenty
        assert 50 < len(g.connections) <= 100

    def test_feed_forward_no_cycles_after_mutation(self):
        cfg = preset("circles")
        rng = Random(1)
        g = Genome.new(1, cfg, rng)
        for _ in range(200):
            g.mutate(cfg, rng)
        # verify no directed cycle among enabled connections
        edges = [k for k, c in g.connections.items()]
        for e in edges:
            rest = [k for k in edges if k != e]
            assert not creates_cycle(rest, e) or True  # smoke
        # stronger: topological order must exist
        nodes = set(g.nodes) | set(cfg.input_keys)
        incoming = {n: set() for n in nodes}
        for (i, o) in g.connections:
            if i in nodes and o in nodes:
                incoming[o].add(i)
        ready = [n for n in nodes if not incoming[n]]
        seen = set()
        while ready:
            n = ready.pop()
            seen.add(n)
            for m in incoming:
                incoming[m].discard(n)
            ready = [n2 for n2 in nodes if n2 not in seen and not incoming[n2]]
        assert seen == nodes, "cycle detected in feed-forward genome"

    def test_add_node_splits_connection(self):
        cfg = preset("circles")
        rng = Random(2)
        g = Genome.new(1, cfg, rng)
        n_nodes = len(g.nodes)
        g.mutate_add_node(cfg, rng)
        assert len(g.nodes) == n_nodes + 1
        new_key = max(g.nodes)
        ins = [k for k in g.connections if k[1] == new_key]
        outs = [k for k in g.connections if k[0] == new_key]
        assert len(ins) == 1 and len(outs) == 1
        assert g.connections[ins[0]].weight == 1.0

    def test_distance_properties(self):
        cfg = preset("circles")
        rng = Random(3)
        g1 = Genome.new(1, cfg, rng)
        g2 = Genome.new(2, cfg, rng)
        assert g1.distance(g1, cfg) == 0.0
        d12 = g1.distance(g2, cfg)
        d21 = g2.distance(g1, cfg)
        assert d12 == pytest.approx(d21)
        assert d12 > 0

    def test_crossover_inherits_from_fitter(self):
        cfg = preset("circles")
        rng = Random(4)
        g1 = Genome.new(1, cfg, rng)
        g2 = Genome.new(2, cfg, rng)
        g1.fitness, g2.fitness = 1.0, 0.5
        child = Genome.crossover(3, g1, g2, rng)
        # child's structure == fitter parent's structure
        assert set(child.nodes) == set(g1.nodes)
        assert set(child.connections) == set(g1.connections)


def _const_fitness(genomes, config):
    for gid, g in genomes:
        g.fitness = 0.1 + (gid % 7) * 0.01


class TestPopulation:
    def test_run_generations(self):
        cfg = preset("circles")
        pop = Population(cfg, seed=0)
        best = pop.run(_const_fitness, 5)
        assert best is not None and best.fitness > 0
        assert pop.generation == 5
        # min_species_size=10 keeps the effective population >= 10
        assert len(pop.population) >= 10
        assert len(pop.species_set.species) >= 1

    def test_elites_survive(self):
        cfg = preset("circles")
        pop = Population(cfg, seed=1)
        pop.run_generation(_const_fitness)
        first_keys = set(pop.population)
        pop.run_generation(_const_fitness)
        # elitism=4 -> at least some keys persist across generations
        assert len(first_keys & set(pop.population)) >= cfg.elitism

    def test_checkpoint_roundtrip_is_deterministic(self, tmp_path):
        cfg = preset("circles")
        pop = Population(cfg, seed=42)
        pop.run_generation(_const_fitness)
        ckpt = str(tmp_path / "ck")
        save_checkpoint(pop, ckpt)

        pop.run_generation(_const_fitness)
        pop.run_generation(_const_fitness)
        keys_direct = sorted(pop.population)

        pop2 = restore_checkpoint(ckpt)
        pop2.run_generation(_const_fitness)
        pop2.run_generation(_const_fitness)
        keys_resumed = sorted(pop2.population)

        assert keys_direct == keys_resumed
        for k in keys_direct:
            assert pop.population[k].size() == pop2.population[k].size()

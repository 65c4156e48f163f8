"""Weight-loader roundtrip and reporter/profiling tests."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evolutionary_illusion_generator_tpu.models.prednet import init_params
from evolutionary_illusion_generator_tpu.models.prednet.loader import (
    load_or_init,
    load_params,
    save_params,
)
from evolutionary_illusion_generator_tpu.neat import (
    JsonlReporter,
    Population,
    StatisticsReporter,
    preset,
)
from evolutionary_illusion_generator_tpu.utils.profiling import PhaseTimers, trace


class TestLoader:
    def test_roundtrip(self, tmp_path):
        params = init_params(jax.random.PRNGKey(0), (1, 4, 8))
        path = str(tmp_path / "weights.npz")
        save_params(params, path)
        loaded = load_params(path)
        assert len(loaded) == len(params)
        for a, b in zip(params, loaded):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_allclose(
                    np.asarray(a[k], dtype=np.float32),
                    np.asarray(b[k], dtype=np.float32),
                    rtol=1e-2,  # bf16 roundtrip
                )

    def test_load_or_init_deterministic(self):
        a = load_or_init(None, [1, 4], seed=5)
        b = load_or_init(None, [1, 4], seed=5)
        np.testing.assert_array_equal(
            np.asarray(a[0]["lstm_w"], np.float32),
            np.asarray(b[0]["lstm_w"], np.float32),
        )

    def test_load_or_init_missing_file(self):
        with pytest.raises(FileNotFoundError):
            load_or_init("/nonexistent.model", [1, 4])

    def test_load_or_init_from_file(self, tmp_path):
        params = init_params(jax.random.PRNGKey(1), (1, 4))
        path = str(tmp_path / "w.npz")
        save_params(params, path)
        loaded = load_or_init(path, [1, 4])
        assert len(loaded) == 2


def _const_fitness(genomes, config):
    for gid, g in genomes:
        g.fitness = float(gid % 5) / 10


class TestReporters:
    def test_jsonl_reporter(self, tmp_path):
        cfg = preset("circles").replace(pop_size=6, num_hidden=2)
        pop = Population(cfg, seed=0)
        path = str(tmp_path / "m.jsonl")
        pop.add_reporter(JsonlReporter(path))
        stats = StatisticsReporter()
        pop.add_reporter(stats)
        pop.run(_const_fitness, 3)
        with open(path) as f:
            recs = [json.loads(line) for line in f]
        assert [r["generation"] for r in recs] == [0, 1, 2]
        for r in recs:
            assert r["fitness_max"] >= r["fitness_mean"]
            assert r["num_species"] >= 1
            assert r["eval_seconds"] >= 0
        assert len(stats.most_fit_genomes) == 3
        assert stats.best_genome().fitness == max(
            g.fitness for g in stats.most_fit_genomes
        )
        assert len(stats.get_fitness_mean()) == 3


class TestProfiling:
    def test_phase_timers(self):
        t = PhaseTimers()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        with t.phase("b"):
            pass
        s = t.summary()
        assert set(s) == {"a", "b"}
        assert t.counts["a"] == 2
        t.reset()
        assert t.summary() == {}

    def test_trace_noop_and_real(self, tmp_path):
        with trace(None):
            pass
        d = str(tmp_path / "prof")
        with trace(d):
            _ = jnp.ones(8) + 1
        assert os.path.isdir(d)

"""Exported-program cache: warm starts skip host retracing.

Covers utils/program_cache.py + the GenerationEvaluator wiring: a cold
evaluation writes a serialized exported program; a fresh evaluator (new
jit cache) loads it and produces bit-identical outputs; the knob and the
corruption fallback behave.  The wall-clock saving itself is measured on
hardware (BENCH_NOTES.md) — here we assert the mechanism.
"""

import dataclasses
import os
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


def _cfg(**over):
    base = dict(
        structure=StructureType.Circles,
        w=48,
        h=40,
        c_dim=3,
        flow=FlowConfig(max_corners=16, win=9, levels=2, iters=4),
        repeat=3,
        cppn_levels=4,
        cppn_width=16,
    )
    base.update(over)
    return EvalConfig(**base)


def _population(neat_cfg, n=4, seed=0):
    rng = Random(seed)
    genomes = []
    for i in range(n):
        g = Genome.new(i, neat_cfg, rng)
        g.mutate(neat_cfg, rng)
        genomes.append(g)
    return genomes


@pytest.fixture
def setup(tmp_path, monkeypatch):
    monkeypatch.setenv("EIGEN_PROGRAM_CACHE_DIR", str(tmp_path / "exported"))
    neat_cfg = preset("circles").replace(num_hidden=4)
    params = init_params(jax.random.PRNGKey(0), (3, 4, 8))
    return _cfg(), neat_cfg, params


def _cache_files():
    d = os.environ["EIGEN_PROGRAM_CACHE_DIR"]
    if not os.path.isdir(d):
        return []
    return sorted(f for f in os.listdir(d) if f.endswith(".jaxexp"))


def test_cold_writes_warm_loads_bit_identical(setup):
    cfg, neat_cfg, params = setup
    genomes = _population(neat_cfg)

    ev_cold = GenerationEvaluator(cfg, params, neat_cfg)
    out_cold = ev_cold.evaluate_images(genomes).to_numpy()
    files = _cache_files()
    assert len(files) == 1, files

    # fresh evaluator: empty in-process jit cache, must load the artifact
    ev_warm = GenerationEvaluator(cfg, params, neat_cfg)
    out_warm = ev_warm.evaluate_images(genomes).to_numpy()
    assert _cache_files() == files  # loaded, not re-written
    for k in out_cold:
        np.testing.assert_array_equal(out_cold[k], out_warm[k])


def test_knob_disables(setup, monkeypatch):
    cfg, neat_cfg, params = setup
    monkeypatch.setenv("EIGEN_PROGRAM_CACHE", "0")
    ev = GenerationEvaluator(cfg, params, neat_cfg)
    ev.evaluate_images(_population(neat_cfg))
    assert _cache_files() == []


def test_corrupt_artifact_falls_back(setup):
    cfg, neat_cfg, params = setup
    genomes = _population(neat_cfg)
    ev = GenerationEvaluator(cfg, params, neat_cfg)
    ref = ev.evaluate_images(genomes).to_numpy()
    (path,) = _cache_files()
    full = os.path.join(os.environ["EIGEN_PROGRAM_CACHE_DIR"], path)
    with open(full, "wb") as f:
        f.write(b"not a serialized program")
    ev2 = GenerationEvaluator(cfg, params, neat_cfg)
    out = ev2.evaluate_images(genomes).to_numpy()
    for k in ref:
        np.testing.assert_array_equal(ref[k], out[k])
    # the corrupt file was replaced by a fresh export
    (path2,) = _cache_files()
    assert os.path.getsize(os.path.join(
        os.environ["EIGEN_PROGRAM_CACHE_DIR"], path2)) > 1000


def test_program_shape_changes_key(setup):
    cfg, neat_cfg, params = setup
    ev = GenerationEvaluator(cfg, params, neat_cfg)
    ev.evaluate_images(_population(neat_cfg))
    ev2 = GenerationEvaluator(
        dataclasses.replace(cfg, repeat=cfg.repeat + 1), params, neat_cfg
    )
    ev2.evaluate_images(_population(neat_cfg))
    assert len(_cache_files()) == 2

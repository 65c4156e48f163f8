"""Parity tests: C++ batch scorer vs the numpy reference scorer."""

import numpy as np
import pytest

from evolutionary_illusion_generator_tpu.ops.fitness import score_vectors
from evolutionary_illusion_generator_tpu.ops.fitness.native import (
    is_available,
    score_population_native,
)
from evolutionary_illusion_generator_tpu.structure import StructureType

pytestmark = pytest.mark.skipif(
    not is_available(), reason="no C++ toolchain for the native scorer"
)


def random_population(rng, pop=12, K=64, w=160, h=120, max_flow=0.5):
    vectors = np.zeros((pop, K, 4))
    mask = np.zeros((pop, K), dtype=bool)
    for p in range(pop):
        n = int(rng.integers(0, K + 1))
        vectors[p, :n, 0] = rng.uniform(0, w, n)
        vectors[p, :n, 1] = rng.uniform(0, h, n)
        vectors[p, :n, 2] = rng.uniform(-max_flow, max_flow, n)
        vectors[p, :n, 3] = rng.uniform(-max_flow, max_flow, n)
        mask[p, :n] = True
        # poison invalid rows
        vectors[p, n:] = 1e9
    return vectors, mask


@pytest.mark.parametrize(
    "structure",
    [
        StructureType.Bands,
        StructureType.Circles,
        StructureType.Free,
        StructureType.CirclesFree,
    ],
)
def test_matches_numpy(structure):
    rng = np.random.default_rng(int(structure))
    vectors, mask = random_population(rng)
    got = score_population_native(int(structure), vectors, mask, 160, 120)
    for p in range(len(vectors)):
        v = vectors[p][mask[p]]
        want = score_vectors(structure, v, 160, 120)
        assert got[p] == pytest.approx(want, abs=1e-12), (structure, p)


def test_empty_and_full_masks():
    rng = np.random.default_rng(9)
    vectors, mask = random_population(rng, pop=4)
    mask[0] = False  # no vectors at all
    mask[1] = True  # everything valid
    got = score_population_native(int(StructureType.Free), vectors, mask, 160, 120)
    assert got[0] == 0.0
    want = score_vectors(StructureType.Free, vectors[1], 160, 120)
    assert got[1] == pytest.approx(want, abs=1e-12)


def test_evaluator_auto_backend_consistency():
    """The evaluator's auto host scorer must equal explicit numpy scoring."""
    from evolutionary_illusion_generator_tpu.evolution.evaluator import (
        EvalConfig,
        GenerationEvaluator,
    )
    from evolutionary_illusion_generator_tpu.models.prednet import init_params
    from evolutionary_illusion_generator_tpu.neat import preset
    import jax

    rng = np.random.default_rng(3)
    vectors, mask = random_population(rng, pop=8)
    neat_cfg = preset("circles_bw")
    params = init_params(jax.random.PRNGKey(0), (1, 4, 8))
    ev_native = GenerationEvaluator(
        EvalConfig(w=160, h=120, c_dim=1, score_backend="native"),
        params, neat_cfg,
    )
    ev_numpy = GenerationEvaluator(
        EvalConfig(w=160, h=120, c_dim=1, score_backend="numpy"),
        params, neat_cfg,
    )
    a = ev_native._score_host(vectors, mask)
    b = ev_numpy._score_host(vectors, mask)
    np.testing.assert_allclose(a, b, atol=1e-12)

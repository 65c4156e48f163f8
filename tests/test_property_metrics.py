"""Randomized invariants over the fitness metric library (SURVEY §5).

Hypothesis-generated masked vector sets drive three-way backend
equivalence (strict f64 numpy == jax masked device metrics == C++ batch
scorer) and structural invariants (permutation invariance, plausibility
monotonicity, gate semantics, masked-garbage immunity) that example-based
tests cannot sweep.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import jax.numpy as jnp

from evolutionary_illusion_generator_tpu.ops.fitness.calculate import (
    MIN_VECTORS_CIRCLES,
    score_vectors,
)
from evolutionary_illusion_generator_tpu.ops.fitness.metrics_jax import (
    score_vectors_jax,
)
from evolutionary_illusion_generator_tpu.ops.fitness.metrics_np import (
    plausibility_ratio,
)
from evolutionary_illusion_generator_tpu.ops.fitness.native import (
    is_available as native_available,
    score_population_native,
)
from evolutionary_illusion_generator_tpu.structure import StructureType

W, H = 160, 120
K = 48  # swarm_score is O(n^2); keep the sweep cheap

STRUCTURES = [
    StructureType.Bands,
    StructureType.Circles,
    StructureType.Free,
    StructureType.CirclesFree,
]


@st.composite
def vector_sets(draw, max_n=K, min_flow=1e-3):
    """(n, 4) float64 [x, y, dx, dy] rows.

    Flow magnitudes are bounded away from zero: a zero-norm flow NaNs the
    metric library — faithfully to the reference (fitness_calculator.py:98
    divides by the norm) — and is exercised separately in test_knobs
    (nan_to_zero) rather than here.
    """
    n = draw(st.integers(min_value=0, max_value=max_n))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    v = np.zeros((n, 4))
    if n:
        v[:, 0] = rng.uniform(0, W, n)
        v[:, 1] = rng.uniform(0, H, n)
        mag = rng.uniform(min_flow, 0.6, n)
        ang = rng.uniform(0, 2 * np.pi, n)
        v[:, 2] = mag * np.cos(ang)
        v[:, 3] = mag * np.sin(ang)
    return v


def _to_masked(v, k=K):
    """Pad an (n, 4) set to (k, 4) + mask, poisoning the invalid rows."""
    n = len(v)
    vec = np.full((k, 4), 1e9)
    vec[:n] = v
    mask = np.zeros(k, bool)
    mask[:n] = True
    return vec, mask


@settings(max_examples=20, deadline=None)
@given(v=vector_sets())
@pytest.mark.parametrize("structure", STRUCTURES)
def test_backends_agree(structure, v):
    """numpy == jax(masked) == C++ on the same vector set."""
    want = score_vectors(structure, v, W, H)
    assert np.isfinite(want)

    vec, mask = _to_masked(v)
    got_jax = float(
        score_vectors_jax(
            structure, jnp.asarray(vec), jnp.asarray(mask), W, H
        )
    )
    np.testing.assert_allclose(got_jax, want, atol=2e-5)

    if native_available():
        got_native = score_population_native(
            structure, vec[None], mask[None], W, H
        )[0]
        np.testing.assert_allclose(got_native, want, rtol=1e-12, atol=1e-12)


@settings(max_examples=25, deadline=None)
@given(v=vector_sets(), seed=st.integers(min_value=0, max_value=2**31 - 1))
@pytest.mark.parametrize("structure", STRUCTURES)
def test_permutation_invariance(structure, v, seed):
    """Scores are set functions of the vectors (row order must not matter
    beyond float summation order)."""
    perm = np.random.default_rng(seed).permutation(len(v))
    a = score_vectors(structure, v, W, H)
    b = score_vectors(structure, v[perm], W, H)
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-9)


@settings(max_examples=25, deadline=None)
@given(
    v=vector_sets(),
    lim1=st.floats(min_value=0.01, max_value=1.0),
    lim2=st.floats(min_value=0.01, max_value=1.0),
)
def test_plausibility_monotone_in_limit(v, lim1, lim2):
    lo, hi = sorted([lim1, lim2])
    _, kept_lo = plausibility_ratio(v, lo) if len(v) else (1.0, v)
    _, kept_hi = plausibility_ratio(v, hi) if len(v) else (1.0, v)
    assert len(kept_lo) <= len(kept_hi)
    if len(v):
        norms = np.hypot(v[:, 2], v[:, 3])
        assert len(kept_hi) == int(np.sum(~(norms > hi)))


@settings(max_examples=25, deadline=None)
@given(v=vector_sets(max_n=MIN_VECTORS_CIRCLES))
def test_circles_count_gate(v):
    """<= 24 plausible vectors means the circles score is exactly 0."""
    _, good = plausibility_ratio(v, 0.3) if len(v) else (1.0, v)
    if len(good) <= MIN_VECTORS_CIRCLES:
        assert score_vectors(StructureType.Circles, v, W, H) == 0.0


@settings(max_examples=25, deadline=None)
@given(v=vector_sets(max_n=32), pad=st.sampled_from([0, 8, 40]))
@pytest.mark.parametrize("structure", STRUCTURES)
def test_masked_rows_are_inert(structure, v, pad):
    """Device scoring must ignore masked-out rows entirely — growing the
    static K with garbage rows cannot change any score."""
    vec_a, mask_a = _to_masked(v, k=32)
    vec_b, mask_b = _to_masked(v, k=32 + pad)
    a = float(
        score_vectors_jax(structure, jnp.asarray(vec_a), jnp.asarray(mask_a),
                          W, H)
    )
    b = float(
        score_vectors_jax(structure, jnp.asarray(vec_b), jnp.asarray(mask_b),
                          W, H)
    )
    np.testing.assert_allclose(a, b, atol=1e-6)

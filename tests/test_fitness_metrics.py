"""Unit tests for the fitness metric library.

Strategy (SURVEY.md §4): every metric is checked against an independent
loop-based oracle on randomized vector sets, plus hand-computed edge cases;
the JAX masked-vector versions are checked for equality with the numpy
versions on the same (masked) data.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from evolutionary_illusion_generator_tpu.ops.fitness import (
    EMPTY_FLOW_SENTINEL,
    calculate_fitness,
    horizontal_symmetry_score,
    inside_outside_score,
    plausibility_ratio,
    rotation_symmetry_score,
    score_vectors,
    strength_number,
    swarm_score,
)
from evolutionary_illusion_generator_tpu.ops.fitness import metrics_jax
from evolutionary_illusion_generator_tpu.structure import StructureType

from oracles import (
    horizontal_symmetry_oracle,
    inside_outside_oracle,
    plausibility_oracle,
    rotation_symmetry_oracle,
    strength_oracle,
    swarm_oracle,
)


def random_vectors(rng, n, w=160, h=120, max_flow=0.5):
    v = np.zeros((n, 4))
    v[:, 0] = rng.uniform(0, w, n)
    v[:, 1] = rng.uniform(0, h, n)
    v[:, 2] = rng.uniform(-max_flow, max_flow, n)
    v[:, 3] = rng.uniform(-max_flow, max_flow, n)
    return v


@pytest.fixture
def rng():
    return np.random.default_rng(42)


class TestPlausibilityRatio:
    def test_hand_case(self):
        v = [[0, 0, 0.1, 0.0], [0, 0, 3.0, 4.0], [1, 1, 0.0, 0.2]]
        ratio, kept = plausibility_ratio(v, 0.5)
        assert ratio == pytest.approx(2 / 3)
        assert len(kept) == 2

    def test_boundary_is_kept(self):
        # norm == limit is kept (reference drops strictly-greater only)
        v = [[0, 0, 0.3, 0.0], [0, 0, 0.3 + 1e-9, 0.0]]
        ratio, kept = plausibility_ratio(v, 0.3)
        assert len(kept) == 1

    def test_vs_oracle(self, rng):
        for _ in range(5):
            v = random_vectors(rng, 50)
            ratio, kept = plausibility_ratio(v, 0.3)
            oratio, okept = plausibility_oracle(v, 0.3)
            assert ratio == pytest.approx(oratio)
            np.testing.assert_allclose(kept, np.asarray(okept).reshape(-1, 4))

    def test_sentinel_fails_gate(self):
        ratio, kept = plausibility_ratio(EMPTY_FLOW_SENTINEL, 0.4)
        assert len(kept) == 0


class TestStrengthNumber:
    def test_hand_case(self):
        # two identical vectors: var = 0, mean|dx| = 0.2 -> 0.2/0.4
        v = [[0, 0, 0.2, 0.0], [5, 5, 0.2, 0.0]]
        assert strength_number(v, 0.4) == pytest.approx(0.5)

    def test_uses_x_only(self):
        # y-displacement must not contribute to the mean (reference quirk)
        v = [[0, 0, 0.2, 0.0], [5, 5, 0.2, 0.0]]
        v2 = [[0, 0, 0.2, 0.0], [5, 5, 0.2, 0.0]]
        v2[0][3] = 0.0
        assert strength_number(v, 0.4) == strength_number(v2, 0.4)

    def test_vs_oracle(self, rng):
        for _ in range(5):
            v = random_vectors(rng, 40)
            assert strength_number(v, 0.3) == pytest.approx(strength_oracle(v, 0.3))


class TestHorizontalSymmetry:
    def test_empty_in_limits(self):
        v = [[0, 100, 0.1, 0.1]]
        assert horizontal_symmetry_score(v, [0, 60]) == 0

    def test_perfect_mirror(self):
        # below middle: [ndx, ndx]; above: [-ndx, ndy].  With dx=1,dy=0 below
        # and dx=-1,dy=1e-9 above: cols become [1,1] and [1, ~0].
        v = [[10, 10, 1.0, 0.0], [10, 50, -1.0, 0.0]]
        s = horizontal_symmetry_score(v, [0, 60])
        # col_x = [1, 1] -> var 0, mean 1; col_y = [1, 0] -> mean .5
        assert s == pytest.approx(((1 - 0) + 1 + (1 - 0.5)) / 3)

    def test_vs_oracle(self, rng):
        for _ in range(8):
            v = random_vectors(rng, 60)
            got = horizontal_symmetry_score(v, [0, 60])
            want = horizontal_symmetry_oracle(v, [0, 60])
            assert got == pytest.approx(want, abs=1e-12)


class TestSwarmScore:
    def test_single_vector(self):
        # one vector: df=0 -> optimal = (angle % 2)*pi; loss=|angle-optimal|
        v = [[50, 50, 1.0, 0.0]]  # angle = 0, optimal = 0
        assert swarm_score(v) == pytest.approx(1.0)

    def test_vs_oracle(self, rng):
        for _ in range(5):
            v = random_vectors(rng, 30)
            assert swarm_score(v) == pytest.approx(swarm_oracle(v), abs=1e-12)

    def test_precedence_quirk(self):
        # angle = pi/2 (dx=0), far apart -> df=1 -> optimal=((pi/2+pi)%2)*pi
        v = [[0, 0, 0.0, 1.0], [200, 0, 0.0, 1.0]]
        got = swarm_score(v)
        assert got == pytest.approx(swarm_oracle(v), abs=1e-12)


class TestRotationSymmetry:
    def test_too_few(self):
        assert rotation_symmetry_score([[80, 60, 0.1, 0.1]], 160, 120, [0, 60]) == 0

    def test_perfect_rotation(self):
        # four tangential unit flows at radius 20 around center (80, 60)
        c = np.array([80.0, 60.0])
        vs = []
        for ang in [0, math.pi / 2, math.pi, 3 * math.pi / 2]:
            pos = c + 20 * np.array([math.cos(ang), math.sin(ang)])
            flow = 0.1 * np.array([-math.sin(ang), math.cos(ang)])
            vs.append([pos[0], pos[1], flow[0], flow[1]])
        s = rotation_symmetry_score(vs, 160, 120, [0, 60])
        assert s == pytest.approx(1.0, abs=1e-9)

    def test_vs_oracle(self, rng):
        for _ in range(8):
            v = random_vectors(rng, 50)
            got = rotation_symmetry_score(v, 160, 120, [0, 60])
            want = rotation_symmetry_oracle(v, 160, 120, [0, 60])
            assert got == pytest.approx(want, abs=1e-12)


class TestInsideOutside:
    def test_vs_oracle(self, rng):
        for _ in range(4):
            v = random_vectors(rng, 40)
            got = inside_outside_score(v, 160, 120)
            want = inside_outside_oracle(v, 160, 120)
            assert got == pytest.approx(want, abs=1e-12)


class TestScoreSwitch:
    def test_empty_flow_scores_zero(self):
        for st in (StructureType.Bands, StructureType.Circles, StructureType.Free):
            assert score_vectors(st, EMPTY_FLOW_SENTINEL, 160, 120) == 0.0

    def test_circles_min_vector_gate(self, rng):
        # 24 vectors is not enough (strict > gate, generate_illusion.py:587-589)
        v = random_vectors(rng, 24, max_flow=0.1)
        assert score_vectors(StructureType.Circles, v, 160, 120) == 0.0
        v = random_vectors(rng, 25, max_flow=0.1)
        assert score_vectors(StructureType.Circles, v, 160, 120) != 0.0

    def test_free_blend(self, rng):
        v = random_vectors(rng, 30, max_flow=0.2)
        got = score_vectors(StructureType.Free, v, 160, 120)
        _, good = plausibility_oracle(v, 0.4)
        want = (
            0.5 * swarm_oracle(good)
            + 0.1 * strength_oracle(good, 0.4)
            + 0.4 * min(len(good), 15) / 15
        )
        assert got == pytest.approx(want, abs=1e-12)

    def test_calculate_fitness_parity(self, rng):
        v = random_vectors(rng, 40, max_flow=0.2)
        for st in (0, 1, 2, 3):
            assert calculate_fitness(st, v, "unused.png", 160, 120) == score_vectors(
                StructureType(st), v, 160, 120
            )


class TestJaxParity:
    """Device (masked fixed-K) metrics must agree with host numpy metrics."""

    K = 64

    def _masked(self, rng, n):
        v = np.zeros((self.K, 4), dtype=np.float32)
        mask = np.zeros(self.K, dtype=bool)
        real = random_vectors(rng, n).astype(np.float32)
        v[:n] = real
        # poison the padding to catch mask leaks
        v[n:] = 1e6
        mask[:n] = True
        return real.astype(np.float64), jnp.asarray(v), jnp.asarray(mask)

    def test_strength(self, rng):
        real, v, m = self._masked(rng, 40)
        got = float(metrics_jax.strength_number(v, m, 0.3))
        assert got == pytest.approx(strength_number(real, 0.3), rel=1e-5)

    def test_horizontal(self, rng):
        real, v, m = self._masked(rng, 40)
        got = float(metrics_jax.horizontal_symmetry_score(v, m, [0, 60]))
        assert got == pytest.approx(horizontal_symmetry_score(real, [0, 60]), rel=1e-4)

    def test_swarm(self, rng):
        real, v, m = self._masked(rng, 30)
        got = float(metrics_jax.swarm_score(v, m))
        assert got == pytest.approx(swarm_score(real), rel=1e-4)

    def test_rotation(self, rng):
        real, v, m = self._masked(rng, 40)
        got = float(metrics_jax.rotation_symmetry_score(v, m, 160, 120, [0, 60]))
        assert got == pytest.approx(
            rotation_symmetry_score(real, 160, 120, [0, 60]), rel=1e-4
        )

    def test_score_switch(self, rng):
        for st in (StructureType.Bands, StructureType.Circles, StructureType.Free):
            real, v, m = self._masked(rng, 40)
            got = float(metrics_jax.score_vectors_jax(st, v, m, 160, 120))
            want = score_vectors(st, real, 160, 120)
            assert got == pytest.approx(want, rel=1e-4, abs=1e-6)


class TestNonStrictVariants:
    """strict_reference=False fixes the documented quirks (SURVEY Appendix C)."""

    def test_strength_uses_norm(self):
        v = [[0, 0, 0.0, 0.2], [5, 5, 0.0, 0.2]]  # pure-y flow
        assert strength_number(v, 0.4) == 0.0  # strict: x-mean only
        assert strength_number(v, 0.4, strict_reference=False) == pytest.approx(0.5)

    def test_horizontal_broadcast_fix(self, rng):
        v = random_vectors(rng, 30)
        s_strict = horizontal_symmetry_score(v, [0, 60])
        s_fixed = horizontal_symmetry_score(v, [0, 60], strict_reference=False)
        assert s_strict != s_fixed  # quirk changes the value

    def test_swarm_precedence_fix(self):
        # far pair: df=1 -> strict optimal ((a+pi)%2)*pi vs fixed (a+pi)%2pi
        v = [[0, 0, 0.0, 1.0], [200, 0, 0.0, 1.0]]
        s_strict = swarm_score(v)
        s_fixed = swarm_score(v, strict_reference=False)
        assert s_strict != s_fixed

"""scripts/promote_weights.py — candidate-snapshot promotion helper.

Covers the pure parts (stack inference, destination gating); the
subprocess steps (cache + probe regeneration) are the already-tested
scripts it shells out to (tests/test_rated_ordering.py binds their
output to the weights by hash).
"""

import importlib.util
import os

import numpy as np
import pytest

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "promote_weights.py",
)

WEIGHTS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "evolutionary_illusion_generator_tpu",
    "models",
    "prednet",
    "weights",
)


@pytest.fixture(scope="module")
def promote():
    spec = importlib.util.spec_from_file_location("promote_weights", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_infer_channels_bundled(promote):
    assert promote.infer_channels(
        os.path.join(WEIGHTS_DIR, "prednet_1_16_32_64.npz")
    ) == [1, 16, 32, 64]
    assert promote.infer_channels(
        os.path.join(WEIGHTS_DIR, "prednet_3_48_96_192.npz")
    ) == [3, 48, 96, 192]


def test_infer_channels_rejects_non_snapshot(promote, tmp_path):
    bad = tmp_path / "not_a_snapshot.npz"
    np.savez(bad, foo=np.zeros(3))
    with pytest.raises(SystemExit):
        promote.infer_channels(str(bad))


def test_unknown_stack_refused(promote, tmp_path):
    """A candidate whose stack has no bundled default must not be copied
    anywhere silently."""
    cand = tmp_path / "cand.npz"
    np.savez(
        cand,
        **{"l0/lstm_w": np.zeros((3, 3, 6, 8), np.float32)},
    )  # stack (2,) — no bundled prednet_2.npz
    with pytest.raises(SystemExit):
        promote.main([str(cand), "--tag", "test"])


@pytest.fixture(scope="module")
def cachemod():
    spec = importlib.util.spec_from_file_location(
        "cache_probe_vectors",
        os.path.join(os.path.dirname(SCRIPT), "cache_probe_vectors.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestRatchetFloors:
    OLD = {"rotate_01": 0.407, "manyfish": 0.561}

    def test_floors_only_move_up(self, cachemod):
        new, reg = cachemod.ratchet_floors(
            self.OLD, {"rotate_01": 0.650, "manyfish": 0.620}, 0.005
        )
        assert not reg
        assert new["rotate_01"] == 0.645
        assert new["manyfish"] == 0.615

    def test_regression_reported_and_floor_held(self, cachemod):
        new, reg = cachemod.ratchet_floors(
            self.OLD, {"rotate_01": 0.314, "manyfish": 0.620}, 0.005
        )
        assert reg == [("rotate_01", 0.407, 0.314)]
        # without allow_regression the old floor stands (caller aborts)
        assert new["rotate_01"] == 0.407
        assert new["manyfish"] == 0.615

    def test_allow_regression_lowers_floor(self, cachemod):
        new, reg = cachemod.ratchet_floors(
            self.OLD, {"rotate_01": 0.314, "manyfish": 0.620}, 0.005,
            allow_regression=True,
        )
        assert reg == [("rotate_01", 0.407, 0.314)]
        assert new["rotate_01"] == 0.309

    def test_new_image_gets_a_floor(self, cachemod):
        new, reg = cachemod.ratchet_floors({}, {"expand_01": 0.402}, 0.005)
        assert not reg
        assert new["expand_01"] == 0.397

    def test_control_excluded(self, cachemod):
        new, reg = cachemod.ratchet_floors({}, {"control": 0.0}, 0.005)
        assert not reg and new == {}

    def test_small_gain_within_margin_keeps_old_floor(self, cachemod):
        # score 0.408 on floor 0.407: candidate 0.403 < old -> hold 0.407
        new, reg = cachemod.ratchet_floors(
            {"rotate_01": 0.407}, {"rotate_01": 0.408}, 0.005
        )
        assert not reg
        assert new["rotate_01"] == 0.407


class TestAggregateFloors:
    """Family-level floors that --allow_regression cannot lower: lowering
    needs a decision record committed in BENCH_NOTES.md (VERDICT r4
    weak #1)."""

    # circles family at avg 0.50, manyfish 0.60
    SCORES = {"rotate_01": 0.50, "rotate_02": 0.50, "expand_01": 0.50,
              "expand_02": 0.50, "color_01_expand": 0.50,
              "color_02_expand": 0.50, "manyfish": 0.60, "control": 0.0}
    OLD = {"circles_avg": 0.45, "manyfish": 0.55}

    def test_aggregates_ratchet_up(self, cachemod):
        new, viol, _ = cachemod.check_aggregates(
            self.OLD, self.SCORES, 0.005
        )
        assert not viol
        assert new["circles_avg"] == 0.495
        assert new["manyfish"] == 0.595

    def test_lowering_refused_without_rationale(self, cachemod):
        old = {"circles_avg": 0.52, "manyfish": 0.62}
        new, viol, accepted = cachemod.check_aggregates(
            old, self.SCORES, 0.005
        )
        assert len(viol) == 2 and not accepted
        # floors held — the caller aborts
        assert new["circles_avg"] == 0.52
        assert new["manyfish"] == 0.62

    def test_rationale_must_appear_in_bench_notes(self, cachemod):
        old = {"circles_avg": 0.52, "manyfish": 0.62}
        new, viol, accepted = cachemod.check_aggregates(
            old, self.SCORES, 0.005,
            rationale="trade X for Y", notes_text="unrelated prose",
        )
        assert viol and not accepted
        assert new["circles_avg"] == 0.52

    def test_committed_rationale_lowers(self, cachemod):
        old = {"circles_avg": 0.52, "manyfish": 0.62}
        notes = "## Round-5 promotion\ntrade X for Y because measured Z\n"
        new, viol, accepted = cachemod.check_aggregates(
            old, self.SCORES, 0.005,
            rationale="trade X for Y because measured Z", notes_text=notes,
        )
        assert len(viol) == 2 and accepted
        assert new["circles_avg"] == 0.495
        assert new["manyfish"] == 0.595

    def test_shipped_floors_json_has_aggregates(self, cachemod):
        import json

        floors_file = os.path.join(
            os.path.dirname(os.path.dirname(SCRIPT)), "gallery",
            "ordering_floors.json",
        )
        with open(floors_file) as f:
            doc = json.load(f)
        assert set(doc["aggregates"]) == {"circles_avg", "manyfish"}

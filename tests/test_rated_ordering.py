"""Default-suite guard on the bundled predictors' rated-gallery ordering.

The published predictor's fitness ordering on the 8 rated stimuli
(illusions_rating/gorilla_data/2025/eigen_own_ratings.csv: control exactly
0.0, every rated image well above it) is THE quality contract of the
bundled stand-in weights.  The full probe needs a TPU-scale rollout
(tests/test_rated_gallery_tpu.py, gated), so this guard scores CACHED
probe vector sets (gallery/probe_vectors.npz, written by
scripts/cache_probe_vectors.py) — milliseconds on CPU, in the default
suite on every run.

Staleness protection: the cache records the SHA-256 of each bundled
weights file at generation time.  If the weights change without re-running
the cache script, test_cache_matches_bundled_weights fails — a silent
weights regression cannot ship behind a stale cache.
"""

import hashlib
import json
import os

import numpy as np
import pytest

from evolutionary_illusion_generator_tpu.models.prednet.loader import (
    bundled_weights_path,
)
from evolutionary_illusion_generator_tpu.ops.fitness.calculate import (
    score_vectors,
)
from evolutionary_illusion_generator_tpu.structure import StructureType

CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gallery",
    "probe_vectors.npz",
)

# Per-image floors, ratcheted by scripts/cache_probe_vectors.py at every
# cache regeneration (floor = shipped score - margin, only ever raised
# unless a regression is accepted with --allow_regression).  Hardcoded
# v4-era family floors would pass a v5i->v4 revert (VERDICT r3 weak #2).
FLOORS_FILE = os.path.join(os.path.dirname(CACHE), "ordering_floors.json")


@pytest.fixture(scope="module")
def cache():
    if not os.path.exists(CACHE):
        pytest.fail(
            f"{CACHE} missing — run scripts/cache_probe_vectors.py "
            f"(TPU or --cpu) to regenerate the ordering-guard cache"
        )
    return np.load(CACHE)


def _names(cache):
    return sorted(k[4:] for k in cache.files if k.startswith("vec/"))


def test_cache_matches_bundled_weights(cache):
    """A weights change must be accompanied by a cache regeneration."""
    for channels in ((1, 16, 32, 64), (3, 48, 96, 192)):
        path = bundled_weights_path(channels)
        assert path is not None, f"bundled weights for {channels} missing"
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        key = "sha/" + "_".join(map(str, channels))
        assert key in cache.files, f"cache lacks {key} — regenerate"
        cached = bytes(cache[key].tobytes()).hex()
        assert cached == h.hexdigest(), (
            f"bundled weights {path} changed since the ordering cache was "
            f"written — rerun scripts/cache_probe_vectors.py and re-check "
            f"the published ordering"
        )


def test_scores_reproduce_from_cached_vectors(cache):
    """The score recorded at cache time must reproduce from the vectors
    (guards the metric library against drift, f64-exact)."""
    for name in _names(cache):
        structure, _published, recorded = cache[f"meta/{name}"]
        got = score_vectors(
            StructureType(int(structure)), cache[f"vec/{name}"], 160, 120
        )
        assert got == recorded, (name, got, recorded)


def test_published_ordering_holds(cache):
    scores = {}
    for name in _names(cache):
        structure, _published, recorded = cache[f"meta/{name}"]
        scores[name] = float(recorded)

    # the control scores exactly 0.0 — by the published predictor's own
    # mechanism (its prediction drifts implausibly fast, so <24 vectors
    # survive the plausibility gate)
    assert scores["control"] == 0.0, scores
    # every rated image scores strictly above the control
    for name, s in scores.items():
        if name != "control":
            assert s > scores["control"], (name, scores)
    # per-image floors, ratcheted to the shipped weights generation
    with open(FLOORS_FILE) as f:
        floors = json.load(f)["floors"]
    for name, s in scores.items():
        if name == "control":
            continue
        assert name in floors, (name, "missing from ordering_floors.json")
        assert s >= floors[name], (
            name, s, floors[name],
            "score regressed below the ratcheted floor — if this trade is "
            "deliberate, rerun scripts/cache_probe_vectors.py "
            "--allow_regression",
        )


def test_aggregate_floors_hold(cache):
    """Family-level floors: a promotion cannot trade several images down a
    margin each (VERDICT r4 weak #1).  Lowering one of these requires a
    decision record in BENCH_NOTES.md (scripts/cache_probe_vectors.py
    --aggregate_rationale); --allow_regression alone cannot."""
    scores = {}
    for name in _names(cache):
        _structure, _published, recorded = cache[f"meta/{name}"]
        scores[name] = float(recorded)
    with open(FLOORS_FILE) as f:
        aggs = json.load(f)["aggregates"]
    circles = ["rotate_01", "rotate_02", "expand_01", "expand_02",
               "color_01_expand", "color_02_expand"]
    circles_avg = sum(scores[n] for n in circles) / len(circles)
    assert circles_avg >= aggs["circles_avg"], (circles_avg, aggs)
    assert scores["manyfish"] >= aggs["manyfish"], (scores["manyfish"], aggs)


def test_expand02_above_manyfish(cache):
    """The one published pairwise relation that holds across the ENTIRE
    measured round-5 frontier (shipped v9n2_swa 0.669 > 0.601, alternate
    v9p2_swa 0.687 > 0.622, round-4 v6ab 0.689 > 0.569): expand_02 above
    manyfish, as in eigen_own_ratings.csv (0.817 > 0.650).  Hard guard —
    a promotion that loses it needs this test edited, i.e. a reviewed
    decision, not a flag."""
    scores = {}
    for name in _names(cache):
        _structure, _published, recorded = cache[f"meta/{name}"]
        scores[name] = float(recorded)
    assert scores["expand_02"] > scores["manyfish"], scores


@pytest.mark.xfail(
    strict=False,
    reason="v6 fidelity target (VERDICT r3): the published table has every "
    "circles image (0.80-0.82) above manyfish (0.650); the shipped "
    "stand-ins invert this (manyfish 0.566 > circles max 0.454). When a "
    "promotion makes this pass, remove the xfail to make it a hard guard.",
)
def test_published_pairwise_order_target(cache):
    """Published family order: every circles image above manyfish."""
    scores = {}
    for name in _names(cache):
        _structure, _published, recorded = cache[f"meta/{name}"]
        scores[name] = float(recorded)
    manyfish = scores.pop("manyfish")
    scores.pop("control")
    for name, s in scores.items():
        assert s > manyfish, (name, s, manyfish)

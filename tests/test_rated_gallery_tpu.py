"""Rated-gallery ordering regression test (TPU-only, slow).

Guards the bundled predictor weights (BW v5i + color v4): the probe on
the reference's rated stimuli must keep the published ordering — control
strictly lowest (it scores 0.0 via the plausibility/count gates) and
every circles-family image clearly above it (BENCH_NOTES.md quality
table, eigen_own_ratings.csv).  Last hardware run: 2026-08-17, passed
in 100 s (v5i BW promotion).

Skipped on the CPU test mesh (a full 8-image probe sweep takes minutes
and the conftest forces CPU); run manually on hardware with:

    python -m pytest tests/test_rated_gallery_tpu.py --no-header -q \
        --override-ini addopts= -p no:cacheprovider

or simply `python scripts/probe_rated.py`.
"""

import os

import pytest

RATED_DIR = "/root/reference/illusions_rating/EIGEN-images"

pytestmark = pytest.mark.skipif(
    os.environ.get("EIGEN_TPU_TESTS", "0") != "1"
    or not os.path.isdir(RATED_DIR),
    reason="TPU-only rated-gallery sweep; set EIGEN_TPU_TESTS=1 on hardware",
)


IMAGES = [
    ("rotate_01", "rotate_01/small.png", 1, 0.818),
    ("rotate_02", "rotate_02/small.png", 1, 0.807),
    ("expand_01", "expand_01/small.png", 1, 0.802),
    ("expand_02", "expand_02/small.png", 1, 0.817),
    ("color_01_expand", "color_01_expand/small.png", 1, 0.804),
    ("color_02_expand", "color_02_expand/small.png", 1, 0.815),
    ("manyfish", "manyfish/manyfish-small.png", 2, 0.650),
    ("control", "control/small.png", 1, 0.0),
]
BW = (1, 16, 32, 64)
COLOR = (3, 48, 96, 192)


def test_published_ordering():
    from PIL import Image

    from evolutionary_illusion_generator_tpu.evolution.probe import get_vectors
    from evolutionary_illusion_generator_tpu.ops.fitness.calculate import (
        calculate_fitness,
    )

    scores = {}
    for name, rel, structure, _ in IMAGES:
        path = os.path.join(RATED_DIR, rel)
        channels = BW if Image.open(path).mode == "L" else COLOR
        v = get_vectors(path, None, channels, 160, 120)
        scores[name] = (
            0.0 if v.size == 0
            else calculate_fitness(structure, v, path, 160, 120)
        )

    circles = [scores[n] for n in (
        "rotate_01", "rotate_02", "expand_01", "expand_02",
        "color_01_expand", "color_02_expand",
    )]
    assert scores["control"] < min(circles), scores
    assert scores["control"] < scores["manyfish"], scores
    assert min(circles) - scores["control"] > 0.2, scores

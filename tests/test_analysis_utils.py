"""Tests for the rating-analysis subsystem and misc parity utils."""

import numpy as np
import pandas as pd
import pytest

from evolutionary_illusion_generator_tpu.analysis import (
    GALLERY_MODEL_SCORES,
    attention_check_pass,
    correlate_with_model_scores,
    filter_participants,
    normalize_per_participant,
    summarize,
    welch_tests_vs_control,
)
from evolutionary_illusion_generator_tpu.utils.misc import get_fidelity, rgb2gray
from evolutionary_illusion_generator_tpu.utils.mirror import (
    TransformationType,
    mirror,
    mirror_multiple,
)


def synthetic_study(n_participants=40, seed=0):
    """Ratings where 'illusion' is perceived stronger than 'control'."""
    rng = np.random.default_rng(seed)
    rows = []
    for p in range(n_participants):
        pid = f"P{p:03d}"
        rows.append((pid, "control", rng.integers(0, 2)))
        rows.append((pid, "illusion_a", rng.integers(3, 6)))
        rows.append((pid, "illusion_b", rng.integers(1, 4)))
    return pd.DataFrame(rows, columns=["participant_id", "illusion_name", "strength"])


class TestRatings:
    def test_attention_check(self):
        df = pd.DataFrame(
            {
                "Participant.External.Session.ID": ["a", "b", "c"],
                "Response": ["cat2.jpg", "dog.jpg", "cat2.jpg"],
            }
        )
        passed = attention_check_pass(df)
        assert set(passed) == {"a", "c"}

    def test_filter_and_normalize(self):
        results = synthetic_study()
        kept = filter_participants(results, ["P000", "P001"])
        assert set(kept.participant_id) == {"P000", "P001"}
        norm = normalize_per_participant(results)
        assert norm["normalized"].min() >= 0 and norm["normalized"].max() <= 1
        # each participant's max rating normalizes to 1
        assert (norm.groupby("participant_id")["normalized"].max() == 1).all()

    def test_summary_and_welch(self):
        results = normalize_per_participant(synthetic_study())
        summ = summarize(results)
        assert set(summ.illusion_name) == {"control", "illusion_a", "illusion_b"}
        med = summ.set_index("illusion_name")["median"]
        assert med["illusion_a"] > med["control"]
        wt = welch_tests_vs_control(results, "control")
        pa = wt.set_index("illusion_name")["p_value"]
        assert pa["illusion_a"] < 1e-6  # strong effect

    def test_model_score_correlation(self):
        human = pd.DataFrame(
            {
                "illusion_name": ["01_bw_rotating", "08_control", "07_medaka"],
                "median": [0.9, 0.05, 0.6],
            }
        )
        merged, r, p = correlate_with_model_scores(human)
        assert len(merged) == 3
        assert r > 0.9  # scores track human medians in this synthetic case

    def test_gallery_scores_match_baseline(self):
        s = GALLERY_MODEL_SCORES.set_index("gorilla_name")["score"]
        assert s["01_bw_rotating"] == 0.818
        assert s["08_control"] == 0.0
        assert s["e_rotating-snakes_updated"] == 0.717


class TestMiscUtils:
    def test_rgb2gray_weights(self):
        px = np.array([[[1.0, 1.0, 1.0]]])
        assert rgb2gray(px)[0, 0] == pytest.approx(1.0)
        # strict mode reproduces the reference's 0.144 typo
        assert rgb2gray(px, strict_reference=True)[0, 0] == pytest.approx(1.03)

    def test_get_fidelity(self, tmp_path):
        from evolutionary_illusion_generator_tpu.utils.image_io import save_image

        a = np.zeros((8, 8, 3))
        b = np.ones((8, 8, 3))
        pa, pb = str(tmp_path / "a.png"), str(tmp_path / "b.png")
        save_image(a, pa)
        save_image(b, pb)
        assert get_fidelity(pa, pa) == pytest.approx(1.0)
        assert get_fidelity(pa, pb) == pytest.approx(1.0 - 3.0)

    def test_mirror(self, tmp_path):
        from evolutionary_illusion_generator_tpu.utils.image_io import save_image

        img = np.zeros((4, 6, 3))
        img[0, 0] = 1.0
        p = str(tmp_path / "m.png")
        save_image(img, p)
        out = mirror(p, str(tmp_path / "out"), TransformationType.HorizontalMirror)
        from PIL import Image

        arr = np.asarray(Image.open(out))
        assert arr[0, -1, 0] == 255 and arr[0, 0, 0] == 0
        outs = mirror_multiple([p, p], str(tmp_path / "out2"))
        assert len(outs) == 2


class TestEquilum:
    def test_hsv_matches_colorsys(self):
        import colorsys

        import jax.numpy as jnp

        from evolutionary_illusion_generator_tpu.ops.render import hsv_to_rgb

        rng = np.random.default_rng(0)
        hsv = rng.uniform(0, 1, (20, 3))
        got = np.asarray(hsv_to_rgb(jnp.asarray(hsv)))
        for i in range(20):
            want = colorsys.hsv_to_rgb(*hsv[i])
            np.testing.assert_allclose(got[i], want, atol=1e-6)

    def test_render_equilum(self):
        import jax.numpy as jnp

        from evolutionary_illusion_generator_tpu.ops.render import (
            render_equilum_images,
        )

        outputs = jnp.full((2, 3, 12), 0.5)
        x_mat = np.zeros((3, 4))
        x_mat[0, 0] = -1
        img = np.asarray(render_equilum_images(outputs, jnp.asarray(x_mat)))
        assert img.shape == (2, 3, 4, 3)
        # bg is masked in HSV space (reference semantics,
        # generate_illusion.py:358-359): HSV(1,1,1) -> pure red
        np.testing.assert_array_equal(img[0, 0, 0], [255, 0, 0])


class TestPlots:
    def test_figures_render(self, tmp_path):
        from evolutionary_illusion_generator_tpu.analysis.ratings import (
            plot_medians,
            plot_rating_distributions,
        )

        results = normalize_per_participant(synthetic_study())
        p1 = plot_rating_distributions(results, str(tmp_path / "hist.png"))
        p2 = plot_medians(summarize(results), str(tmp_path / "med.png"))
        import os

        assert os.path.getsize(p1) > 1000
        assert os.path.getsize(p2) > 1000

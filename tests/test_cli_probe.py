"""CLI + probe tests."""

import numpy as np
import pytest

from evolutionary_illusion_generator_tpu.cli import build_parser, string_to_intarray
from evolutionary_illusion_generator_tpu.evolution.probe import (
    get_vectors,
    pad_to_size,
    score_image,
)
from evolutionary_illusion_generator_tpu.ops.flow import FlowConfig
from evolutionary_illusion_generator_tpu.utils.image_io import save_image

TINY_FLOW = FlowConfig(max_corners=32, win=9, levels=2, iters=6)


class TestCli:
    def test_reference_flag_parity(self):
        p = build_parser()
        args = p.parse_args(
            ["-m", "x.model", "-o", "out", "-s", "1", "-cfg", "circles",
             "-wh", "big", "-c", "1", "-ch", "1,16,32,64", "-g", "0"]
        )
        assert args.model == "x.model"
        assert args.output_dir == "out"
        assert args.structure == 1
        assert args.size == "big"
        assert args.color_space == 1
        assert string_to_intarray(args.channels) == [1, 16, 32, 64]
        assert args.gradient == 0

    def test_defaults_match_reference(self):
        args = build_parser().parse_args([])
        assert args.model == ""
        assert args.output_dir == "."
        assert args.structure == 0
        assert args.size == "small"
        assert args.color_space == 3
        assert args.channels == "3,48,96,192"
        assert args.gradient == 1


class TestProbe:
    def _image(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (15, 20))
        import cv2

        img = cv2.resize(img, (160, 120), interpolation=cv2.INTER_CUBIC)
        path = str(tmp_path / "probe.png")
        save_image(np.clip(img, 0, 1)[..., None].repeat(3, -1), path)
        return path

    def test_get_vectors_contract(self, tmp_path):
        path = self._image(tmp_path)
        v = get_vectors(path, None, (3, 8, 16), 160, 120, repeat=4,
                        flow=TINY_FLOW)
        assert v.ndim == 2 and v.shape[1] == 4

    def test_score_image(self, tmp_path):
        path = self._image(tmp_path)
        s = score_image(path, structure=2, channels=(3, 8, 16), repeat=4,
                        flow=TINY_FLOW)
        assert np.isfinite(s)

    def test_pad_to_size(self):
        from PIL import Image

        img = Image.new("RGB", (300, 100), (0, 0, 0))
        out = pad_to_size(img, 160, 120)
        assert out.size == (160, 120)
        arr = np.asarray(out)
        assert (arr[0] == 255).all()  # white padding rows
        assert (arr[60] == 0).any()  # content present


class TestCliMain:
    def test_main_end_to_end(self, tmp_path, monkeypatch):
        """Full CLI invocation with reference-style flags (tiny predictor)."""
        from evolutionary_illusion_generator_tpu.cli import main

        cfg = str(tmp_path / "tiny.txt")
        with open(cfg, "w") as f:
            f.write(
                "[NEAT]\n"
                "no_fitness_termination = True\n"
                "fitness_criterion = mean\n"
                "fitness_threshold = 0.3\n"
                "pop_size = 4\n"
                "reset_on_extinction = False\n"
                "[DefaultGenome]\n"
                "num_hidden = 4\nnum_inputs = 2\nnum_outputs = 1\n"
                "feed_forward = True\n"
                "initial_connection = partial_nodirect 0.8\n"
                "[DefaultSpeciesSet]\ncompatibility_threshold = 3.0\n"
                "[DefaultStagnation]\nspecies_fitness_func = max\n"
                "[DefaultReproduction]\nelitism = 2\nmin_species_size = 4\n"
            )
        out = str(tmp_path / "out")
        rc = main(
            ["-o", out, "-s", "1", "-c", "1", "-g", "0",
             "-ch", "1,4,8", "-cfg", cfg, "--generations", "1",
             "--seed", "0"]
        )
        assert rc == 0
        import os

        assert os.path.exists(os.path.join(out, "best.png"))
        assert os.path.exists(os.path.join(out, "metrics.jsonl"))

"""Reference call-contract shims (Appendix A parity)."""

import glob
import os
from random import Random

import numpy as np
import pytest

from evolutionary_illusion_generator_tpu.compat import (
    create_cppn,
    lucas_kanade,
    test_prednet,
)
from evolutionary_illusion_generator_tpu.neat import Genome, preset
from evolutionary_illusion_generator_tpu.utils.image_io import save_image

# pytest must not collect the shim itself as a test
test_prednet.__test__ = False


class TestPrednetShim:
    def test_reference_population_contract(self, tmp_path):
        """The exact call shape of generate_illusion.py:533-537 for a
        two-candidate population: files land where the reference's flow
        phase looks for them (:543-546)."""
        rng = np.random.default_rng(0)
        w, h, repeat, ext = 32, 24, 5, 2
        img_paths = []
        for i in range(2):
            p = str(tmp_path / f"cand{i}.png")
            save_image(rng.uniform(0, 1, (h, w, 3)), p)
            img_paths.append(p)
        repeated = [img_paths[0]] * repeat + [img_paths[1]] * repeat

        out_dir = str(tmp_path / "prediction")
        test_prednet(
            initmodel="",
            sequence_list=[repeated],
            size=[w, h],
            channels=[3, 4, 8],
            gpu=0,
            output_dir=out_dir,
            skip_save_frames=1,
            extension_start=repeat,
            extension_duration=ext,
            reset_at=repeat + ext,
            verbose=0,
            c_dim=3,
        )
        # per-candidate flow pair files (generate_illusion.py:543-546)
        for i in range(2):
            index_0 = i * repeat + repeat - 1
            index_1 = index_0 + ext - 1
            assert os.path.exists(os.path.join(out_dir, f"{index_0:010d}.png"))
            assert os.path.exists(
                os.path.join(out_dir, f"{index_1:010d}_extended.png")
            )
        # probe convention file (fitness_calculator.py:493): repeat+1 extended
        assert os.path.exists(
            os.path.join(out_dir, f"{repeat + 1:010d}_extended.png")
        )
        assert len(glob.glob(os.path.join(out_dir, "*.png"))) == 2 * repeat + 2 * ext

    def test_full_file_pipeline_with_lucas_kanade(self, tmp_path):
        """test_prednet -> lucas_kanade, the reference's disk bus."""
        rng = np.random.default_rng(1)
        w, h, repeat = 64, 48, 4
        p = str(tmp_path / "input.png")
        # textured image so corners exist
        import cv2

        tex = cv2.resize(rng.uniform(0, 1, (6, 8)), (w, h),
                         interpolation=cv2.INTER_CUBIC)
        save_image(np.clip(tex, 0, 1)[..., None].repeat(3, -1), p)
        out_dir = str(tmp_path / "pred")
        test_prednet(
            initmodel="",
            sequence_list=[[p] * repeat],
            size=[w, h],
            channels=[3, 4, 8],
            output_dir=out_dir,
            extension_start=repeat,
            extension_duration=2,
            reset_at=repeat + 2,
        )
        res = lucas_kanade(
            os.path.join(out_dir, f"{repeat - 1:010d}.png"),
            os.path.join(out_dir, f"{repeat:010d}_extended.png"),
            str(tmp_path),
        )
        assert "vectors" in res


class TestCreateCppnShim:
    def test_node_functions(self):
        cfg = preset("circles")
        rng = Random(3)
        g = Genome.new(1, cfg, rng)
        nodes = create_cppn(g, cfg, leaf_names=["x", "y"], out_names=[])
        assert len(nodes) == cfg.num_outputs
        x = np.linspace(-1, 1, 12).reshape(3, 4)
        y = np.linspace(-1, 1, 12).reshape(3, 4)
        out = nodes[0](x=x, y=y)
        assert out.shape == (3, 4)
        # matches the packaged evaluator (same genome, same inputs)
        from evolutionary_illusion_generator_tpu.models.cppn import (
            evaluate_population_levels,
            pack_population_levels,
        )
        import jax.numpy as jnp

        packed = {k: jnp.asarray(v) for k, v in
                  pack_population_levels([g], cfg).items()}
        flat = jnp.stack([jnp.asarray(x, jnp.float32).reshape(-1),
                          jnp.asarray(y, jnp.float32).reshape(-1)])
        want = np.asarray(
            evaluate_population_levels(
                packed["weights"], packed["bias"], packed["response"],
                packed["act_id"], packed["out_slot"], flat)
        )[0, 0].reshape(3, 4)
        np.testing.assert_allclose(out, want, atol=1e-6)


def test_probe_matches_file_bus_exactly(tmp_path):
    """The native probe (evolution/probe.get_vectors, probe flow-pair
    convention: input image vs extended frame repeat+1, SURVEY.md Appendix C
    #9) must produce IDENTICAL vectors to the reference-contract file path
    (compat.test_prednet writing PNGs + lucas_kanade reading them) — the
    probe's PNG quantization closes the 8-bit gap between the two buses."""
    from evolutionary_illusion_generator_tpu.evolution.probe import get_vectors

    rng = np.random.default_rng(7)
    w, h, repeat, ext = 64, 48, 4, 2
    channels = [3, 4, 8]
    p = str(tmp_path / "input.png")
    import cv2

    tex = cv2.resize(rng.uniform(0, 1, (6, 8)), (w, h),
                     interpolation=cv2.INTER_CUBIC)
    save_image(np.clip(tex, 0, 1)[..., None].repeat(3, -1), p)

    # file bus: test_prednet writes predictions, lucas_kanade reads the
    # probe pair (input image vs %010d_extended.png at index repeat+1,
    # fitness_calculator.py:493-498)
    out_dir = str(tmp_path / "pred")
    test_prednet(
        initmodel="",
        sequence_list=[[p] * repeat],
        size=[w, h],
        channels=channels,
        output_dir=out_dir,
        extension_start=repeat,
        extension_duration=ext,
        reset_at=repeat + ext,
    )
    res = lucas_kanade(
        p, os.path.join(out_dir, f"{repeat + 1:010d}_extended.png"),
        str(tmp_path),
    )
    file_vectors = np.asarray(res["vectors"], dtype=np.float32).reshape(-1, 4)

    # native probe, same model (seeded random init for this channel stack)
    probe_vectors = np.asarray(
        get_vectors(p, None, channels, w, h, repeat=repeat, extension=ext),
        dtype=np.float32,
    ).reshape(-1, 4)

    assert probe_vectors.shape == file_vectors.shape
    np.testing.assert_array_equal(probe_vectors, file_vectors)


def test_skip_save_frames_renumbers(tmp_path):
    """skip>1 saves every skip-th prediction, renumbered consecutively
    (the reference indexes saved frames as i*(repeat/skip)+...)."""
    rng = np.random.default_rng(2)
    w, h, repeat = 32, 24, 4
    p = str(tmp_path / "in.png")
    save_image(rng.uniform(0, 1, (h, w, 3)), p)
    out_dir = str(tmp_path / "pred")
    test_prednet(
        initmodel="",
        sequence_list=[[p] * (2 * repeat)],
        size=[w, h],
        channels=[3, 4, 8],
        output_dir=out_dir,
        skip_save_frames=2,
        extension_start=repeat,
        extension_duration=1,
        reset_at=repeat + 1,
    )
    saved = sorted(
        f for f in os.listdir(out_dir) if not f.endswith("_extended.png")
    )
    # 2 windows x 4 inputs, every 2nd saved -> 4 files numbered 0..3
    assert saved == [f"{i:010d}.png" for i in range(4)]

"""Single-image probes.

Parity targets:
  * ``get_vectors(image_path, model_name, channels, w, h)`` — the
    single-image pipeline of fitness_calculator.py:468-502: 20 repeats + 2
    closed-loop extension frames through the predictor, then flow between
    the INPUT image and the second extension frame (the probe flow-pair
    convention, SURVEY.md Appendix C #9).
  * the ``test.py`` CLI probe (test.py:115-124): image -> vectors ->
    swarm score printed to stdout.
  * the notebook single-image scoring path (cells 16-18): LANCZOS resize +
    white-pad to the target size, then ``calculate_fitness``.

Run as ``python -m evolutionary_illusion_generator_tpu.evolution.probe``.
"""

from __future__ import annotations

import argparse
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..models.prednet.loader import load_or_init
from ..models.prednet.model import rollout_flow_frames
from ..ops.fitness.calculate import calculate_fitness
from ..ops.fitness.metrics_np import swarm_score
from ..ops.flow.api import FlowConfig, flow_vectors
from ..ops.flow.pyramid import to_gray
from ..structure import StructureType
from ..utils.compilation_cache import enable_compilation_cache
from ..utils.image_io import load_image

__all__ = ["get_vectors", "score_image", "pad_to_size", "main"]


def _png_quantize(x: np.ndarray) -> np.ndarray:
    """Round-trip through the reference's PNG bus numerics: uint8 truncation
    on save (image_io.save_image) then /255 on load."""
    x = np.asarray(x, np.float32)
    return np.floor(np.clip(x, 0.0, 1.0) * 255.0).astype(np.float32) / 255.0


def get_vectors(
    image_path: str,
    model_name: Optional[str],
    channels: Sequence[int] = (3, 48, 96, 192),
    w: int = 160,
    h: int = 120,
    *,
    repeat: int = 20,
    extension: int = 2,
    flow: FlowConfig = FlowConfig(),
    seed: int = 0,
    quantize: bool = True,
    int8: bool = False,
    s2d: bool = False,
):
    """Flow vectors for one image through the probe pipeline.

    ``quantize=True`` (default) puts both flow frames through uint8 PNG
    quantization before the flow stage: the reference always computes flow
    between files on disk (fitness_calculator.py:493-498), so the 8-bit
    round-trip is part of its numerics, and with it this function matches
    the ``compat.test_prednet`` + ``lucas_kanade`` file bus bit-for-bit
    (tests/test_compat.py).  ``quantize=False`` keeps the pure-float device
    frames.

    ``int8=True`` routes the predictor through the int8-quantized conv path
    (models/prednet/model.py::quantize_params_int8) — the fidelity gate for
    promoting ``EvalConfig.prednet_int8``.

    ``s2d=True`` runs the pixel layer in space-to-depth layout
    (models/prednet/model.py::_s2d_kernel) — the fidelity gate for
    ``EvalConfig.s2d_l0``.

    Returns an (N, 4) numpy array of [x, y, dx, dy] rows (empty when
    nothing was trackable — the reference returns ``[None]`` then).
    """
    enable_compilation_cache()
    c_dim = channels[0]
    params = load_or_init(model_name, list(channels), seed=seed)
    if int8:
        from ..models.prednet.model import quantize_params_int8

        params = quantize_params_int8(params)
    img = load_image(image_path, size=(w, h), c_dim=c_dim)
    batch = jnp.asarray(img)[None]
    f0, f1 = rollout_flow_frames(
        params, batch, repeat=repeat, extension=extension, pair="probe",
        s2d_l0=s2d,
    )
    f0, f1 = np.asarray(f0[0]), np.asarray(f1[0])
    if quantize:
        f0, f1 = _png_quantize(f0), _png_quantize(f1)
    vec, mask = flow_vectors(
        to_gray(jnp.asarray(f0)), to_gray(jnp.asarray(f1)), flow
    )
    return np.asarray(vec)[np.asarray(mask)]


def pad_to_size(image: Image.Image, w: int = 160, h: int = 120) -> Image.Image:
    """LANCZOS resize preserving aspect, white-pad to exactly (w, h) — the
    notebook's preprocessing (illusion_generation.ipynb cell 16)."""
    scale = min(w / image.width, h / image.height)
    nw, nh = int(round(image.width * scale)), int(round(image.height * scale))
    resized = image.resize((nw, nh), Image.LANCZOS)
    canvas = Image.new("RGB", (w, h), (255, 255, 255))
    canvas.paste(resized, ((w - nw) // 2, (h - nh) // 2))
    return canvas


def score_image(
    image_path: str,
    structure: int = StructureType.Circles,
    model_name: Optional[str] = None,
    channels: Sequence[int] = (3, 48, 96, 192),
    w: int = 160,
    h: int = 120,
    **kwargs,
) -> float:
    """Notebook-cell-18 equivalent: vectors + calculate_fitness."""
    vectors = get_vectors(image_path, model_name, channels, w, h, **kwargs)
    if vectors.size == 0:
        return 0.0
    return calculate_fitness(structure, vectors, image_path, w, h)


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(description="single-image probe")
    parser.add_argument("--model", "-m", default="", help=".model/.npz file")
    parser.add_argument("--input_image", "-i", default="")
    parser.add_argument("--structure", "-s", type=int, default=None,
                        help="also print the structure fitness score")
    parser.add_argument("--channels", "-ch", default="3,48,96,192",
                        help="predictor channel stack (extension; the "
                        "reference's test.py is fixed to the color stack)")
    parser.add_argument("--int8", action="store_true",
                        help="int8-quantized predictor convs (extension; "
                        "2x MXU throughput, see BENCH_NOTES.md)")
    parser.add_argument("--s2d", action="store_true",
                        help="space-to-depth pixel layer (extension; MXU "
                        "lane packing, see BENCH_NOTES.md)")
    args = parser.parse_args(argv)

    channels = tuple(int(x) for x in args.channels.split(","))
    vectors = get_vectors(args.input_image, args.model or None, channels,
                          int8=args.int8, s2d=args.s2d)
    if vectors.size == 0:
        print("score", 0.0)
        return 0
    score = swarm_score(vectors)
    print("score", score)
    if args.structure is not None:
        print(
            "fitness",
            calculate_fitness(args.structure, vectors, args.input_image, 160, 120),
        )
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

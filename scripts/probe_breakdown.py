"""Per-image breakdown of the circles fitness terms on the rated gallery.

For each rated stimulus print: total vectors, plausible vectors (norm <=
limit), the rotation-symmetry term, the strength term, the blended score,
and the mean |d| of all vs plausible vectors.  This is the tuning
instrument for the stand-in predictor: it shows whether a low score comes
from the plausibility gate (drift too strong), the count gate (<24
survivors), or angular incoherence (variance after rotation).

    python scripts/probe_breakdown.py --model_bw /tmp/x.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RATED_DIR = "/root/reference/illusions_rating/EIGEN-images"

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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_bw", default=None)
    p.add_argument("--model_color", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from evolutionary_illusion_generator_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    from PIL import Image

    from evolutionary_illusion_generator_tpu.evolution.probe import get_vectors
    from evolutionary_illusion_generator_tpu.ops.fitness.metrics_np import (
        plausibility_ratio,
        rotation_symmetry_score,
        strength_number,
        swarm_score,
    )

    w, h = 160, 120
    print(f"{'image':17s} {'pub':>5s} {'n':>4s} {'good':>4s} "
          f"{'sym':>6s} {'str':>6s} {'score':>6s} {'m|d|':>6s} {'mg|d|':>6s}")
    for name, rel, structure, published in IMAGES:
        path = os.path.join(RATED_DIR, rel)
        mode = Image.open(path).mode
        channels = BW if mode == "L" else COLOR
        model = args.model_bw if mode == "L" else args.model_color
        v = np.asarray(get_vectors(path, model, channels, w, h), np.float64)
        n = len(v)
        if n == 0:
            print(f"{name:17s} {published:5.2f}    0     -")
            continue
        norms = np.hypot(v[:, 2], v[:, 3])
        limit = 0.3 if structure == 1 else 0.4
        _, good = plausibility_ratio(v, limit)
        ngood = len(good)
        gnorms = (np.hypot(good[:, 2], good[:, 3])
                  if ngood else np.zeros(0))
        if structure == 1:
            sym = (rotation_symmetry_score(good, w, h, [0, h / 2])
                   if ngood > 24 else float("nan"))
            stren = strength_number(good, limit) if ngood > 24 else float("nan")
            score = (0.7 * sym + 0.3 * stren) if ngood > 24 else 0.0
        else:
            sym = swarm_score(good) if ngood else float("nan")
            stren = strength_number(good, limit) if ngood else float("nan")
            score = (0.5 * sym + 0.1 * stren
                     + 0.4 * min(ngood, 15) / 15) if ngood else 0.0
        print(f"{name:17s} {published:5.2f} {n:4d} {ngood:4d} "
              f"{sym:6.3f} {stren:6.3f} {score:6.3f} "
              f"{norms.mean():6.3f} "
              f"{gnorms.mean() if ngood else float('nan'):6.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

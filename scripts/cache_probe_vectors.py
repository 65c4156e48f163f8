"""Cache the rated-gallery probe vector sets for the CPU ordering guard.

Runs the full probe pipeline (evolution/probe.get_vectors: 20 open-loop +
2 closed-loop steps, PNG-quantized flow pair, corner/LK flow) on the
reference's 8 rated stimuli with the BUNDLED stand-in predictors, and
writes the extracted vector sets to ``gallery/probe_vectors.npz`` together
with the SHA-256 of each bundled weights file.

``tests/test_rated_ordering.py`` scores these cached vectors on every test
run (milliseconds, CPU): it asserts the published fitness ordering
(eigen_own_ratings.csv — control exactly 0, every rated image above it)
and that the recorded weight hashes still match the bundled weights.  If
the weights change without re-running this script, the hash check fails —
the cache cannot silently go stale.

    python scripts/cache_probe_vectors.py            # on TPU (fast)
    python scripts/cache_probe_vectors.py --cpu      # forced-CPU fallback
"""

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RATED_DIR = "/root/reference/illusions_rating/EIGEN-images"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "gallery", "probe_vectors.npz")

# (name, relpath, structure, published score) — eigen_own_ratings.csv
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


def sha256_file(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=OUT)
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from PIL import Image

    from evolutionary_illusion_generator_tpu.evolution.probe import get_vectors
    from evolutionary_illusion_generator_tpu.models.prednet.loader import (
        bundled_weights_path,
    )
    from evolutionary_illusion_generator_tpu.ops.fitness.calculate import (
        score_vectors,
    )
    from evolutionary_illusion_generator_tpu.structure import StructureType

    w, h = 160, 120
    payload = {}
    for name, rel, structure, published in IMAGES:
        path = os.path.join(RATED_DIR, rel)
        mode = Image.open(path).mode
        channels = BW if mode == "L" else COLOR
        vec = np.asarray(
            get_vectors(path, None, channels, w, h), np.float64
        ).reshape(-1, 4)
        score = score_vectors(StructureType(structure), vec, w, h)
        payload[f"vec/{name}"] = vec
        payload[f"meta/{name}"] = np.asarray(
            [structure, published, score], np.float64
        )
        print(f"[cache] {name:17s} n={len(vec):4d} score={score:.3f} "
              f"(published {published})")

    for channels in (BW, COLOR):
        wp = bundled_weights_path(channels)
        if wp is None:
            raise SystemExit(f"no bundled weights for {channels}")
        key = "sha/" + "_".join(map(str, channels))
        payload[key] = np.frombuffer(
            bytes.fromhex(sha256_file(wp)), np.uint8
        )
    np.savez(args.out, **payload)
    print(f"[cache] wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

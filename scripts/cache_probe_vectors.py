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
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RATED_DIR = "/root/reference/illusions_rating/EIGEN-images"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "gallery", "probe_vectors.npz")
FLOORS = os.path.join(os.path.dirname(OUT), "ordering_floors.json")

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


def ratchet_floors(old_floors, scores, margin, allow_regression=False):
    """Ratchet per-image score floors against a fresh probe run.

    Returns (new_floors, regressions).  For each rated image the candidate
    floor is ``score - margin``; floors only ever move UP unless
    ``allow_regression`` — a promotion that scores below a shipped floor is
    a fidelity regression and must be accepted explicitly (VERDICT r3
    weak #2: the v4-era static floors would have passed a v5i->v4 revert).
    The control image is guarded exactly-0.0 by the test and is excluded.
    """
    new_floors = dict(old_floors)
    regressions = []
    for name, score in scores.items():
        if name == "control":
            continue
        candidate = round(score - margin, 3)
        old = old_floors.get(name)
        if old is not None and score < old:
            regressions.append((name, old, score))
            if allow_regression:
                new_floors[name] = candidate
        else:
            new_floors[name] = max(candidate, old) if old is not None \
                else candidate
    return new_floors, regressions


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
    p.add_argument("--floors", default=FLOORS)
    p.add_argument(
        "--allow_regression", action="store_true",
        help="accept scores below the shipped floors and LOWER the floors "
             "(an explicit fidelity trade; without this flag a regression "
             "aborts before the cache is written)")
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
    scores = {}
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
        scores[name] = float(score)
        print(f"[cache] {name:17s} n={len(vec):4d} score={score:.3f} "
              f"(published {published})")

    # Ratchet the per-image floors BEFORE writing anything: a candidate
    # that regresses below the shipped generation must be accepted
    # explicitly, not slipped in behind a self-consistent cache.
    with open(args.floors) as f:
        floors_doc = json.load(f)
    margin = floors_doc["margin"]
    new_floors, regressions = ratchet_floors(
        floors_doc["floors"], scores, margin, args.allow_regression
    )
    if scores.get("control", 0.0) != 0.0 and not args.allow_regression:
        raise SystemExit(
            f"[cache] REGRESSION: control scores "
            f"{scores['control']:.3f}, published mechanism gives exactly "
            f"0.0 — refusing to write the cache (--allow_regression to "
            f"override)")
    if regressions:
        for name, old, score in regressions:
            print(f"[cache] REGRESSION: {name} {score:.3f} < floor {old:.3f}")
        if not args.allow_regression:
            raise SystemExit(
                "[cache] refusing to write a regressed cache "
                "(--allow_regression to accept the trade and lower the "
                "floors)")
        print("[cache] --allow_regression: floors LOWERED for the images "
              "above")

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
    floors_doc["floors"] = new_floors
    with open(args.floors, "w") as f:
        json.dump(floors_doc, f, indent=2, sort_keys=False)
        f.write("\n")
    print(f"[cache] floors ratcheted -> {args.floors}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

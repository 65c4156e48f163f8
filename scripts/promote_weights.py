"""Promote a candidate predictor snapshot to the bundled default.

One command between a winning pretrain variant and a consistent repo
(what the v5i promotion, commit d741646, did by hand):

    python scripts/promote_weights.py /tmp/v6a.npz --tag v6a [--cpu]

Steps (each prints what it did):

1. sanity-load the candidate npz and infer its channel stack;
2. copy it over the bundled file (models/prednet/weights/prednet_*.npz);
3. regenerate the ordering-guard cache (scripts/cache_probe_vectors.py —
   tests/test_rated_ordering.py hash-binds the cache to the weights, so
   skipping this ships a red suite);
4. regenerate the rated-probe table ``gallery/rated_probe_<tag>.json``
   with the now-bundled weights and print it.

NOT automated (long, review the winners first): the gallery re-evolve —
``python scripts/make_gallery.py`` — and the BENCH_NOTES/weights/README
narrative. The script prints the reminder.
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

WEIGHTS_DIR = os.path.join(
    REPO, "evolutionary_illusion_generator_tpu", "models", "prednet", "weights"
)


def infer_channels(npz_path):
    """Channel stack from a pretrain snapshot (layer-0 ahat conv shapes)."""
    d = np.load(npz_path)
    # pretrain.py saves flat "l{i}/<name>" arrays; the per-layer lstm
    # kernel's input axis is 3*C_l (+ top-down), its output 4*C_l.
    chans = []
    i = 0
    while f"l{i}/lstm_w" in d.files:
        chans.append(int(d[f"l{i}/lstm_w"].shape[-1]) // 4)
        i += 1
    if not chans:
        raise SystemExit(f"{npz_path}: no 'l<i>/lstm_w' arrays — not a "
                         f"pretrain snapshot")
    return chans


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("candidate", help="pretrain snapshot (.npz) to promote")
    p.add_argument("--tag", required=True,
                   help="variant tag for the rated-probe table filename")
    p.add_argument("--cpu", action="store_true",
                   help="run the probe/cache regeneration on forced CPU")
    p.add_argument("--allow_regression", action="store_true",
                   help="accept rated scores below the shipped PER-IMAGE "
                        "floors and lower them (passed through to "
                        "cache_probe_vectors.py; an explicit fidelity trade)")
    p.add_argument("--aggregate_rationale", default="",
                   help="decision record authorizing an AGGREGATE floor "
                        "lowering; must already appear verbatim in "
                        "BENCH_NOTES.md (passed through to "
                        "cache_probe_vectors.py)")
    args = p.parse_args(argv)

    chans = infer_channels(args.candidate)
    dest = os.path.join(WEIGHTS_DIR,
                        f"prednet_{'_'.join(str(c) for c in chans)}.npz")
    if not os.path.exists(dest):
        raise SystemExit(
            f"{dest} does not exist — candidate stack {chans} is not a "
            f"bundled default; copy manually if adding a new stack")
    # Re-save through the loader at f16 rather than raw-copying the f32
    # training output: halves the bundled-weight size and keeps the
    # documented f16 bundled-weight convention (inference is bf16, so f16
    # storage loses nothing material — loader.save_params; ADVICE r4).
    from evolutionary_illusion_generator_tpu.models.prednet.loader import (
        load_params, save_params,
    )

    save_params(load_params(args.candidate, dtype=np.float32), dest,
                dtype=np.float16)
    print(f"[promote] {args.candidate} (stack {chans}) -> {dest} [f16]")

    cpu = ["--cpu"] if args.cpu else []
    # Regression flags go ONLY to the cache script — probe_rated.py does not
    # accept them (round-5 promote_bw_v9 crashed at this exact step).
    cache_flags = list(cpu)
    if args.allow_regression:
        cache_flags += ["--allow_regression"]
    if args.aggregate_rationale:
        cache_flags += ["--aggregate_rationale", args.aggregate_rationale]
    print("[promote] regenerating ordering-guard cache ...")
    # The cache script ratchets gallery/ordering_floors.json and REFUSES a
    # candidate that scores below the shipped floors (check=True aborts the
    # promotion before the copied weights can ship behind a stale cache —
    # the bundled file was already overwritten, so git restores it).
    try:
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "cache_probe_vectors.py"),
             *cache_flags],
            check=True,
        )
    except subprocess.CalledProcessError:
        raise SystemExit(
            "[promote] ABORTED: candidate regresses the rated floors. "
            f"Restore the bundled file (git checkout -- {dest}) or rerun "
            "with --allow_regression to accept the trade.")

    table = os.path.join(REPO, "gallery", f"rated_probe_{args.tag}.json")
    print(f"[promote] regenerating rated-probe table {table} ...")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "probe_rated.py"),
         "--json", table, *cpu],
        check=True,
    )

    print(
        "[promote] done. Review + commit:\n"
        f"  - {dest}\n"
        f"  - gallery/probe_vectors.npz\n"
        f"  - {table}\n"
        "Then re-evolve the gallery (python scripts/make_gallery.py) and\n"
        "update BENCH_NOTES.md + models/prednet/weights/README.md."
    )


if __name__ == "__main__":
    main()

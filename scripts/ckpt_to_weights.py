"""Extract plain predictor weights from a pretrain training checkpoint.

The rolling ``.part-*`` checkpoints written by pretrain's ``_ckpt_save``
carry params (``p/l{l}/{name}``) plus optimizer state and the RNG key —
probe/loader code only accepts plain ``save_params`` npz files.  This
converts the former to the latter (used by the campaign snapshot watcher
that harvests the step-10000 state of a 20k run).

    python scripts/ckpt_to_weights.py <ckpt.npz> <weights_out.npz>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv):
    src, dst = argv[1], argv[2]
    data = np.load(src)
    pkeys = [k for k in data.files if k.startswith("p/l")]
    if not pkeys:
        raise SystemExit(f"{src}: no p/l*/ params keys — not a pretrain "
                         f"checkpoint (keys: {sorted(data.files)[:8]}...)")
    layers: dict = {}
    for k in pkeys:
        _, lpart, name = k.split("/", 2)
        layers.setdefault(int(lpart[1:]), {})[name] = data[k]
    params = [layers[i] for i in sorted(layers)]
    from evolutionary_illusion_generator_tpu.models.prednet.loader import (
        save_params,
    )

    save_params(params, dst)
    step = int(data["step"]) if "step" in data.files else -1
    print(f"[ckpt2w] {src} (step {step}) -> {dst} "
          f"({len(params)} layers)")


if __name__ == "__main__":
    main(sys.argv)

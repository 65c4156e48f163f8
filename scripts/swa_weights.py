"""Average several saved PredNet weight files (uniform SWA).

Snapshot probes carry ~±0.08 circles-avg noise at 100-250-step spacing
(BENCH_NOTES "Part G/H"); a tail average over adjacent snapshots of one
trajectory is the cheapest variance-reduction candidate — pure CPU, no
training.  Usage:

    python scripts/swa_weights.py OUT.npz IN1.npz IN2.npz [...]

All inputs must share the exact key set and shapes (same trajectory).
"""
import sys

import numpy as np


def main() -> None:
    out, ins = sys.argv[1], sys.argv[2:]
    assert len(ins) >= 2, "need at least two snapshots to average"
    stacks: dict[str, list[np.ndarray]] = {}
    keys = None
    for p in ins:
        with np.load(p) as z:
            k = sorted(z.files)
            assert keys is None or k == keys, f"key mismatch in {p}"
            keys = k
            for name in k:
                stacks.setdefault(name, []).append(
                    np.asarray(z[name], dtype=np.float32))
    avg = {name: np.mean(np.stack(arrs), axis=0)
           for name, arrs in stacks.items()}
    tmp = out + ".tmp.npz"
    np.savez(tmp, **avg)
    import os
    os.replace(tmp, out)
    print(f"[swa] wrote {out} = mean of {len(ins)} files "
          f"({len(avg)} arrays)")


if __name__ == "__main__":
    main()

"""Drift response of a predictor vs sawtooth spatial period.

Renders STATIC radial asymmetric-sawtooth ring images over a sweep of
spatial periods, runs the probe rollout (20 open + 2 closed frames, flow
between the last open and last closed frame), and reports the in-gate flow
statistics per period.  This is the transfer curve behind the rated-gallery
centre-band problem (scripts/field_anatomy.py): the rated stimuli's wedge
structure reaches ~4-8 px periods near the centre, and a predictor trained
on 12-40 px patterns shows where its response dies.

    python scripts/period_response.py --cpu [--model_bw X]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_bw", default=None)
    p.add_argument("--channels", default="1,16,32,64")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--periods", default="4,6,8,10,12,16,20,28,36")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from evolutionary_illusion_generator_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from evolutionary_illusion_generator_tpu.models.prednet.loader import (
        load_or_init,
    )
    from evolutionary_illusion_generator_tpu.models.prednet.model import (
        rollout_flow_frames,
    )
    from evolutionary_illusion_generator_tpu.models.prednet.synthetic_data import (
        _asym_ramp,
    )
    from evolutionary_illusion_generator_tpu.ops.flow.api import (
        FlowConfig,
        batched_flow,
    )

    channels = tuple(int(x) for x in args.channels.split(","))
    params = load_or_init(args.model_bw, channels)
    periods = [float(x) for x in args.periods.split(",")]
    h, w = 120, 160
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    r = np.hypot(yy - h / 2, xx - w / 2) + 1e-6

    imgs = np.stack(
        [np.asarray(_asym_ramp(jnp.asarray(r / per)), np.float32)
         for per in periods]
    )[..., None]  # (P, h, w, 1)

    f0, f1 = rollout_flow_frames(
        params, jnp.asarray(imgs), repeat=20, extension=2, pair="population",
        compute_dtype=jnp.bfloat16,
    )
    vecs, mask = batched_flow(f0, f1, FlowConfig())
    vecs, mask = np.asarray(vecs, np.float64), np.asarray(mask)

    print(f"{'period':>7s} {'n':>4s} {'ingate':>6s} {'m|d|':>7s} "
          f"{'mg|d|':>7s} {'rad-coh':>8s}")
    for i, per in enumerate(periods):
        v = vecs[i][mask[i]]
        if len(v) == 0:
            print(f"{per:7.1f}    0")
            continue
        px, py = v[:, 0] - w / 2, v[:, 1] - h / 2
        rr = np.hypot(px, py)
        ur = np.stack([px, py], -1) / np.maximum(rr, 1e-9)[:, None]
        norm = np.hypot(v[:, 2], v[:, 3])
        ing = norm <= 0.3
        # radial coherence of in-gate unit flows (|mean| -> 1 = coherent)
        u = v[ing, 2:4] / np.maximum(norm[ing], 1e-9)[:, None]
        coh = np.abs((u * ur[ing]).sum(-1).mean()) if ing.sum() > 1 else 0.0
        print(f"{per:7.1f} {len(v):4d} {ing.sum():6d} {norm.mean():7.3f} "
              f"{(norm[ing].mean() if ing.any() else 0):7.3f} {coh:8.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

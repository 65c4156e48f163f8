"""Diagnose the predictor's closed-loop drift on probe inputs.

For each input (in-distribution tangential sawtooth, in-distribution plain
rings, rotate_01, control) report the flow field's mean |displacement| and
its mean tangential / radial components around the image centre — the
quantities the circles fitness actually keys on.

    python scripts/drift_diag.py --model /tmp/prednet_v3_bw.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None)
    p.add_argument("--channels", default="1,16,32,64")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--repeat", type=int, default=20)
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from evolutionary_illusion_generator_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    from evolutionary_illusion_generator_tpu.models.prednet.loader import (
        load_or_init,
    )
    from evolutionary_illusion_generator_tpu.models.prednet.model import (
        rollout_flow_frames,
    )
    from evolutionary_illusion_generator_tpu.models.prednet.synthetic_data import (
        synthetic_cue_batch,
    )
    from evolutionary_illusion_generator_tpu.evolution.probe import (
        _png_quantize,
    )
    from evolutionary_illusion_generator_tpu.ops.flow.api import (
        FlowConfig,
        flow_vectors,
    )
    from evolutionary_illusion_generator_tpu.ops.flow.pyramid import to_gray
    from evolutionary_illusion_generator_tpu.utils.image_io import load_image

    channels = [int(c) for c in args.channels.split(",")]
    c_dim = channels[0]
    w, h = 160, 120
    params = load_or_init(args.model, channels)

    inputs = {}
    # in-distribution patterns: first frame of regimes 4 (tangential) and 2
    # (plain rings)
    for reg, name in ((4, "synth_tangential"), (5, "synth_radial"),
                      (2, "synth_rings")):
        probs = [0.0] * 7
        probs[reg] = 1.0
        seq = synthetic_cue_batch(
            jax.random.PRNGKey(11), 1, 1, h, w, c_dim,
            regime_probs=tuple(probs),
        )
        inputs[name] = np.asarray(seq[0, 0])
    rated = "/root/reference/illusions_rating/EIGEN-images"
    for name, rel in (("rotate_01", "rotate_01/small.png"),
                      ("control", "control/small.png")):
        inputs[name] = load_image(os.path.join(rated, rel), size=(w, h),
                                  c_dim=c_dim)

    print(f"{'input':18s} {'mean|d|':>8s} {'tang':>8s} {'rad':>8s} "
          f"{'|pred-img|':>10s}  n")
    for name, img in inputs.items():
        batch = jnp.asarray(img, jnp.float32)[None]
        f0, f1 = rollout_flow_frames(
            params, batch, repeat=args.repeat, extension=2, pair="probe"
        )
        drift = float(jnp.mean(jnp.abs(f1[0] - batch[0])))
        a, b = _png_quantize(np.asarray(f0[0])), _png_quantize(np.asarray(f1[0]))
        vec, mask = flow_vectors(
            to_gray(jnp.asarray(a)), to_gray(jnp.asarray(b)), FlowConfig()
        )
        v = np.asarray(vec)[np.asarray(mask)]
        if len(v) == 0:
            print(f"{name:18s} {'-':>8s}")
            continue
        x, y, dx, dy = v[:, 0] - w / 2, v[:, 1] - h / 2, v[:, 2], v[:, 3]
        r = np.hypot(x, y) + 1e-9
        tang = (x * dy - y * dx) / r   # + = counterclockwise
        rad = (x * dx + y * dy) / r    # + = expanding
        mag = np.hypot(dx, dy)
        print(f"{name:18s} {mag.mean():8.4f} {tang.mean():8.4f} "
              f"{rad.mean():8.4f} {drift:10.5f}  {len(v)}")


if __name__ == "__main__":
    main()

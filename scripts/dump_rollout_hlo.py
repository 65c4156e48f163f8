"""Dump the compiled (post-optimization) HLO of the production rollout.

The round-5 per-op trace (gallery/logs/rollout_profile_r5.log) shows ~16%
of the 20-step scan spent in ``copy.*`` ops — layout copies XLA inserted
inside the loop body.  This dump attributes them: the compiled HLO text
names each copy's operand, shape and layout, which tells us which carry /
activation tensor is being relaid and what layout change would delete it.

Run under tpu_run (device claim!); the compile itself is warm-cache fast.

    python scripts/dump_rollout_hlo.py --out gallery/logs/rollout_hlo_r5.txt.gz
"""

import argparse
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pop", type=int, default=25)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--channels", default="3,48,96,192")
    p.add_argument("--repeat", type=int, default=20)
    p.add_argument("--s2d", default="1", choices=("0", "1"))
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="gallery/logs/rollout_hlo_r5.txt.gz")
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

    from evolutionary_illusion_generator_tpu.models.prednet import init_params
    from evolutionary_illusion_generator_tpu.models.prednet.model import (
        rollout_flow_frames,
    )

    channels = tuple(int(x) for x in args.channels.split(","))
    pop, w, h = args.pop, args.width, args.height
    params = init_params(jax.random.PRNGKey(0), channels)
    imgs = jax.random.uniform(
        jax.random.PRNGKey(1), (pop, h, w, channels[0]), jnp.float32
    )
    roll = jax.jit(
        lambda p, im: rollout_flow_frames(
            p, im, repeat=args.repeat, extension=2, pair="population",
            compute_dtype=jnp.bfloat16, s2d_l0=args.s2d == "1",
        )
    )
    print(f"[hlo] backend={jax.default_backend()} pop={pop} {w}x{h} "
          f"stack={channels} s2d={args.s2d}", flush=True)
    compiled = roll.lower(params, imgs).compile()
    texts = compiled.as_text()
    if isinstance(texts, (list, tuple)):
        texts = "\n\n".join(texts)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with gzip.open(args.out, "wt") as f:
        f.write(texts)
    n_copy = texts.count(" = ") and sum(
        1 for line in texts.splitlines() if " copy(" in line
    )
    print(f"[hlo] wrote {args.out} ({len(texts) / 1e6:.1f} MB text, "
          f"{n_copy} copy instructions)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

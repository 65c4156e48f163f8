"""Per-phase timing of the generation pipeline at the north-star config.

The full generation runs as ONE fused XLA program (evaluator.eval_chunk),
so its internal cost split is invisible to wall-clock timing.  This script
jits each phase separately at the exact north-star shapes (one chunk:
25 candidates, 640x480 color, repeat 20 + extension 2) and times them
in isolation:

  render   CPPN level evaluation + raster quantize
  rollout  PredNet 22-step scan -> the two flow frames
  flow     Shi-Tomasi corners + pyramidal LK on the frame pair
  full     the real fused chunk program (reference point)

The isolated sum exceeds ``full`` (phase boundaries materialize tensors XLA
would otherwise fuse through) — the value is the RATIO between phases: it
says where optimization effort can matter at all.

    python scripts/tpu_run.py --log /tmp/phase.log -- \
        python scripts/phase_bench.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=3, warmup=1):
    """Median wall seconds of fn(*args) with block_until_ready."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pop", type=int, default=25, help="one chunk")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from evolutionary_illusion_generator_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from random import Random

    import jax
    import jax.numpy as jnp

    from evolutionary_illusion_generator_tpu.evolution.evaluator import (
        EvalConfig,
        GenerationEvaluator,
    )
    from evolutionary_illusion_generator_tpu.models.cppn import (
        make_population_eval,
        pack_population_levels,
    )
    from evolutionary_illusion_generator_tpu.models.prednet import init_params
    from evolutionary_illusion_generator_tpu.models.prednet.model import (
        rollout_flow_frames,
    )
    from evolutionary_illusion_generator_tpu.neat import Genome, preset
    from evolutionary_illusion_generator_tpu.ops.flow.api import (
        FlowConfig,
        batched_flow,
    )
    from evolutionary_illusion_generator_tpu.ops.grids import (
        GRID_SCALING,
        create_grid,
    )
    from evolutionary_illusion_generator_tpu.ops.render import (
        render_images,
        to_unit_float,
    )
    from evolutionary_illusion_generator_tpu.structure import StructureType

    pop, w, h = args.pop, args.width, args.height
    channels = (3, 48, 96, 192)
    neat_cfg = preset("free").replace(pop_size=pop)
    params = init_params(jax.random.PRNGKey(0), channels)
    rng = Random(0)
    genomes = [Genome.new(i, neat_cfg, rng) for i in range(pop)]
    for g in genomes:
        g.mutate(neat_cfg, rng)

    grid = create_grid(StructureType.Free, w, h, GRID_SCALING)
    import numpy as np

    x_mat = jnp.asarray(grid["x_mat"], jnp.float32)
    grid_flat = jnp.stack(
        [
            jnp.asarray(grid["x_mat"], jnp.float32).reshape(-1),
            jnp.asarray(grid["y_mat"], jnp.float32).reshape(-1),
        ]
    )
    packed = pack_population_levels(genomes, neat_cfg, 8, 16)
    packed = {k: jnp.asarray(v) for k, v in packed.items()}
    cppn_eval = jax.jit(make_population_eval())

    print(f"[phase] backend={jax.default_backend()} pop={pop} {w}x{h}",
          flush=True)

    # --- render: CPPN eval + raster ---
    def render(packed):
        outs = cppn_eval(
            packed["weights"], packed["bias"], packed["response"],
            packed["act_id"], packed["out_slot"], grid_flat,
        )
        return render_images(outs, x_mat, 3, bg=1, gradient=1)

    render_j = jax.jit(render)
    t_render = timeit(render_j, packed, reps=args.reps)
    print(f"[phase] render  {t_render:8.3f}s", flush=True)

    imgs_u8 = jax.block_until_ready(render_j(packed))
    imgs = to_unit_float(imgs_u8)

    # --- rollout: PredNet 20 open + 2 closed ---
    rollout_j = jax.jit(
        lambda p, im: rollout_flow_frames(
            p, im, repeat=20, extension=2, pair="population",
            compute_dtype=jnp.bfloat16,
        )
    )
    t_rollout = timeit(rollout_j, params, imgs, reps=args.reps)
    print(f"[phase] rollout {t_rollout:8.3f}s", flush=True)

    f0, f1 = jax.block_until_ready(rollout_j(params, imgs))

    # --- flow: corners + pyramidal LK ---
    flow_j = jax.jit(lambda a, b: batched_flow(a, b, FlowConfig()))
    t_flow = timeit(flow_j, f0, f1, reps=args.reps)
    print(f"[phase] flow    {t_flow:8.3f}s", flush=True)

    # --- full fused chunk program (the production path) ---
    cfg = EvalConfig(
        structure=StructureType.Free, w=w, h=h, c_dim=3, gradient=1,
        microbatch=pop, program_cache=False,
    )
    evaluator = GenerationEvaluator(cfg, params, neat_cfg)
    items = [(g.key, g) for g in genomes]
    evaluator(items)  # compile
    ts = []
    for _ in range(args.reps):
        t0 = time.time()
        evaluator(items)
        ts.append(time.time() - t0)
    ts.sort()
    t_full = ts[len(ts) // 2]
    print(f"[phase] full    {t_full:8.3f}s  (host score "
          f"{evaluator.last_timings['score']:.3f}s)", flush=True)

    total = t_render + t_rollout + t_flow
    print(
        f"[phase] isolated sum {total:.3f}s -> render "
        f"{100 * t_render / total:.0f}% rollout "
        f"{100 * t_rollout / total:.0f}% flow {100 * t_flow / total:.0f}%",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

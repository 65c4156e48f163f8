"""Multi-chip example: the pop256_v5e8 config point on a device mesh.

On a real v5e-8 slice this runs as-is; on a dev box it runs the same
program on a virtual mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip.py --tiny
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true",
                   help="shrink shapes for a CPU-mesh smoke run")
    p.add_argument("--generations", type=int, default=3)
    p.add_argument("--output_dir", default="multichip_results")
    args = p.parse_args()

    import jax

    # this environment's sitecustomize pins the TPU backend; honor an
    # explicit JAX_PLATFORMS override in-process (see tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from evolutionary_illusion_generator_tpu.configs import run_preset
    from evolutionary_illusion_generator_tpu.evolution.driver import neat_illusion
    from evolutionary_illusion_generator_tpu.parallel import initialize_distributed

    # multi-host pods: set JAX_COORDINATOR_ADDRESS etc.; single-host no-op
    initialize_distributed()

    rp = run_preset("pop256_v5e8")
    kwargs = rp.driver_kwargs()
    if args.tiny:
        kwargs.update(
            w=64, h=48, channels=(3, 4, 8), microbatch=8,
            config=rp.neat.replace(pop_size=16, num_hidden=4),
        )
    print(f"devices: {jax.devices()}")
    pop = neat_illusion(
        args.output_dir,
        None,
        n_devices=rp.n_devices,
        generations=args.generations,
        quiet=False,
        **kwargs,
    )
    print("best fitness:", pop.best_genome.fitness)


if __name__ == "__main__":
    main()

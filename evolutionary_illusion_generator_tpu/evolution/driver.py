"""Run driver: the ``neat_illusion`` entry point.

API parity with the reference driver (generate_illusion.py:676-711):
``neat_illusion(output_dir, model_name, config_path, structure, w, h,
channels, c_dim, checkpoint, gradient)`` — plus the knobs the reference
hardcodes (generations, seed, checkpoint cadence, device scoring).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Union

from ..models.prednet.loader import load_or_init
from ..neat import (
    Checkpointer,
    JsonlReporter,
    NeatConfig,
    Population,
    StatisticsReporter,
    StdOutReporter,
    load_config,
    preset,
    restore_checkpoint,
)
from ..ops.flow.api import FlowConfig
from ..structure import StructureType
from ..utils.compilation_cache import enable_compilation_cache
from .artifacts import save_best_artifacts
from .evaluator import EvalConfig, GenerationEvaluator

__all__ = ["neat_illusion", "resolve_neat_config"]


def resolve_neat_config(config: Union[str, NeatConfig, None], structure, c_dim,
                        gradient) -> NeatConfig:
    """Config resolution with the reference's auto-selection rules
    (generate_illusion.py:750-766): bands -> bands preset; circles ->
    circles (color gradient) or circles_bw; free -> free; else default."""
    if isinstance(config, NeatConfig):
        return config
    if isinstance(config, str) and config:
        if os.path.exists(config):
            return load_config(config)
        return preset(config)
    structure = StructureType(structure)
    if structure == StructureType.Bands:
        return preset("bands")
    if structure in (StructureType.Circles, StructureType.CirclesFree):
        if c_dim > 1 and gradient == 1:
            return preset("circles")
        return preset("circles_bw")
    if structure == StructureType.Free:
        return preset("free")
    return preset("default")


def neat_illusion(
    output_dir: str,
    model_name: Optional[str],
    config: Union[str, NeatConfig, None],
    structure: Union[int, StructureType],
    w: int = 160,
    h: int = 120,
    channels: Sequence[int] = (3, 48, 96, 192),
    c_dim: int = 3,
    checkpoint: Optional[str] = None,
    gradient: int = 1,
    *,
    generations: int = 100,
    seed: int = 0,
    checkpoint_every: int = 1,
    score_on_device: bool = False,
    use_pallas: Union[bool, str] = False,
    microbatch: int = 0,
    repeat: int = 20,
    extension: int = 2,
    flow: Optional[FlowConfig] = None,
    equilum: bool = False,
    pertype_count: int = 1,
    tensorboard: bool = False,
    save_artifacts: bool = True,
    quiet: bool = False,
    n_devices: Optional[int] = None,
    profile_dir: Optional[str] = None,
    chainer_half_order: str = "ahat-a",
    debug_nans: bool = False,
) -> Population:
    """Evolve illusions for up to ``generations`` generations.

    Returns the final :class:`Population` (``population.best_genome`` is the
    best-ever genome).  The reference runs ``p.run(eval_genomes, 100)`` with
    a 100-generation checkpoint cadence (generate_illusion.py:696, 711); the
    default cadence here is per-generation.
    """
    structure = StructureType(structure)
    os.makedirs(output_dir, exist_ok=True)
    # persistent XLA cache: remote TPU compiles of the chunk program cost
    # minutes; warm starts load in seconds (CLAUDE.md environment rules)
    enable_compilation_cache()
    neat_cfg = resolve_neat_config(config, structure, c_dim, gradient)

    params = load_or_init(model_name, list(channels), seed=seed,
                          half_order=chainer_half_order)

    eval_cfg = EvalConfig(
        structure=structure,
        w=w,
        h=h,
        c_dim=c_dim,
        gradient=gradient,
        repeat=repeat,
        extension=extension,
        flow=flow or FlowConfig(),
        equilum=equilum,
        pertype_count=pertype_count,
        score_on_device=score_on_device,
        use_pallas=use_pallas,
        microbatch=microbatch,
        debug_nans=debug_nans,
    )
    if n_devices is not None and n_devices > 1:
        from ..parallel import ShardedGenerationEvaluator, make_mesh

        mesh = make_mesh(n_devices)
        evaluator = ShardedGenerationEvaluator(eval_cfg, params, neat_cfg, mesh)
    else:
        evaluator = GenerationEvaluator(eval_cfg, params, neat_cfg)

    if checkpoint:
        pop = restore_checkpoint(checkpoint)
    else:
        pop = Population(neat_cfg, seed=seed)

    if not quiet:
        pop.add_reporter(StdOutReporter(True))
    stats = StatisticsReporter()
    pop.add_reporter(stats)
    pop.add_reporter(JsonlReporter(os.path.join(output_dir, "metrics.jsonl")))
    if tensorboard:
        from ..neat.reporters import TensorBoardReporter

        pop.add_reporter(
            TensorBoardReporter(os.path.join(output_dir, "tensorboard"))
        )
    ckpt = Checkpointer(checkpoint_every, directory=output_dir)
    ckpt.attach(pop)
    pop.add_reporter(ckpt)

    from ..utils.profiling import trace

    def eval_genomes(genome_items, cfg):
        # profile the steady-state program: generation 1 (gen 0 compiles)
        with trace(profile_dir if pop.generation == 1 else None):
            evaluator(genome_items, cfg)
        if save_artifacts:
            res = evaluator.last_results
            best_genome = genome_items[res["best_idx"]][1]
            # device rows are per render (pertype_count per genome); the
            # winner's best render drives the artifacts
            row = res["best_row"]
            vectors = res["vectors"][row][res["mask"][row]]
            # only the winner's image/flow frame leave the device
            save_best_artifacts(
                best_genome,
                res["outputs"].fetch("images_u8", row),
                vectors,
                res["outputs"].fetch("flow_frame0", row),
                neat_cfg,
                structure,
                c_dim,
                gradient,
                output_dir,
            )

    pop.run(eval_genomes, generations)
    return pop

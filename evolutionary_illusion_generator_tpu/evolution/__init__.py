"""Evolution loop: generation evaluator, run driver, artifacts, probes."""

from .artifacts import save_best_artifacts
from .driver import neat_illusion
from .evaluator import EvalConfig, GenerationEvaluator

__all__ = [
    "EvalConfig",
    "GenerationEvaluator",
    "neat_illusion",
    "save_best_artifacts",
]

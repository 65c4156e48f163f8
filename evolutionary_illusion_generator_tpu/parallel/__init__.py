"""Device mesh and population sharding."""

from .mesh import make_mesh, population_sharding, replicated_sharding
from .sharded_evaluator import ShardedGenerationEvaluator

__all__ = [
    "make_mesh",
    "population_sharding",
    "replicated_sharding",
    "ShardedGenerationEvaluator",
]

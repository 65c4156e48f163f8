"""Population-sharded generation evaluator (multi-chip).

Same device program as :class:`..evolution.evaluator.GenerationEvaluator`,
jitted with explicit shardings: packed genome tables sharded on the
population axis, frozen PredNet params replicated, outputs population-
sharded.  Fitness scalars are the only per-generation host traffic.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from ..evolution.evaluator import EvalConfig, GenerationEvaluator
from ..models.prednet.model import PredNetParams
from ..neat.config import NeatConfig
from .mesh import population_sharding, replicated_sharding

__all__ = ["ShardedGenerationEvaluator"]


class ShardedGenerationEvaluator(GenerationEvaluator):
    """GenerationEvaluator whose device program is sharded over a mesh."""

    def __init__(
        self,
        cfg: EvalConfig,
        params: PredNetParams,
        neat_cfg: NeatConfig,
        mesh: Mesh,
    ) -> None:
        super().__init__(cfg, params, neat_cfg)
        self.mesh = mesh
        self._pop_shard = population_sharding(mesh)
        self._rep = replicated_sharding(mesh)
        # population buckets must divide evenly over the mesh
        self._pop_min = max(8, int(self.mesh.devices.size))
        # replicate frozen weights once
        self.params = jax.device_put(params, self._rep)

    def _device_fn(self, pop_bucket: int, node_bucket: int, example_args=None):
        key = (
            "sharded",
            tuple(self.mesh.shape.items()),
            pop_bucket,
            node_bucket,
            self._act_set,
        )
        if key in self._jitted:
            return self._jitted[key]
        assert pop_bucket % self.mesh.devices.size == 0, (
            f"chunk {pop_bucket} must divide over {self.mesh.devices.size} "
            f"devices (set microbatch to a multiple of the mesh size)"
        )
        raw = self._build_run()

        packed_shard = {
            k: self._pop_shard
            for k in ("weights", "bias", "response", "act_id", "out_slot")
        }
        out_shard = {
            k: self._pop_shard
            for k in ("images_u8", "vectors", "mask", "flow_frame0", "scores")
        }
        if not self.cfg.score_on_device:
            out_shard.pop("scores")
        fn = jax.jit(
            raw,
            in_shardings=(packed_shard, self._rep),
            out_shardings=out_shard,
        )
        # exported-program cache (warm starts skip retracing); the mesh
        # layout is part of the key, shardings ride the exported module
        self._jitted[key] = self._finalize_fn(fn, key, example_args)
        return self._jitted[key]

"""Mesh construction and sharding specs.

The reference is strictly single-process (SURVEY.md §2.4: the scalar
``gpu=0`` flag is its whole device story).  The TPU build's primary scale
axis is the POPULATION: every stage of the generation program (CPPN eval,
PredNet rollout, corner/LK flow, scoring) is batched over candidates with no
cross-candidate dataflow, so sharding the population over an ICI mesh makes
the whole program embarrassingly SPMD — XLA inserts no collectives in the
fused path; only the final (pop,)-shaped scores are gathered (bytes, not
tensors).  Frozen PredNet weights are replicated once at t=0
(BASELINE.json config 5: "pop 256 ... population sharded across chips").
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "population_sharding", "replicated_sharding"]

POP_AXIS = "pop"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over up to ``n_devices`` devices, axis name "pop"."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (POP_AXIS,))


def population_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the population mesh axis."""
    return NamedSharding(mesh, P(POP_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

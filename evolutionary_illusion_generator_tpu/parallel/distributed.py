"""Multi-host initialization (the communication-backend row of SURVEY §5).

The reference is single-process (its whole device story is a ``gpu=0``
scalar).  Multi-chip scaling here rides XLA collectives: within a slice over
ICI, across slices/hosts over DCN — all inserted by the SPMD partitioner
from sharding annotations (see parallel/mesh.py, parallel/spatial.py); no
NCCL/MPI-style hand-written backend exists or is needed.  This wrapper is
the one piece of process plumbing multi-HOST runs require: call it before
any jax API on every process, then build meshes over ``jax.devices()`` as
usual.
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["initialize_distributed"]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """``jax.distributed.initialize`` with env fallbacks.

    Args default from JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID.  Returns False (no-op) when unset — single-process runs
    need nothing.  On TPU pods with standard metadata, calling with no args
    set still works via JAX's auto-detection when JAX_COORDINATOR_ADDRESS
    is exported.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return False
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0"))
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0"))
    )
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or None,
        process_id=process_id,
    )
    return True

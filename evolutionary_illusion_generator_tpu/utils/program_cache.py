"""Serialized-program cache: warm starts skip host retracing.

The XLA compile cache (``compilation_cache.py``) removes the *backend
compile* from warm starts, but the chunk generation program still pays
host-side trace + lower on every process start — ~10 minutes of
single-core Python at the north-star config (BENCH_NOTES.md "warm floor").
The reference has no analogue (its per-image Chainer graph is rebuilt per
call, generate_illusion.py:529-607); this is the cost of the one-big-XLA-
program design, so the framework must also own its amortization.

This cache serializes the **traced** program with :mod:`jax.export`:

- cold path: ``jax.jit`` traces/lowers once (unavoidable), the exported
  StableHLO is written beside the XLA cache, keyed by everything that
  shapes the program (jax version, platform, config repr, input
  shape/dtype tree);
- warm path: deserialize (milliseconds) and stage the exported call —
  tracing of the full CPPN/PredNet/flow pipeline never happens; the
  backend compile of the staged module is served by the persistent
  compile cache.

Best-effort by design: any export/deserialize failure falls back to the
plain jitted function.  Disable with ``EIGEN_PROGRAM_CACHE=0``.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from typing import Any, Callable

import jax

from .compilation_cache import DEFAULT_CACHE_DIR

__all__ = ["cached_program", "program_cache_dir", "program_cache_enabled"]


def program_cache_enabled() -> bool:
    return os.environ.get("EIGEN_PROGRAM_CACHE", "1") != "0"


def program_cache_dir() -> str:
    return os.environ.get("EIGEN_PROGRAM_CACHE_DIR", "") or os.path.join(
        DEFAULT_CACHE_DIR, "exported"
    )


def _digest(key_parts: tuple, specs) -> str:
    spec_repr = jax.tree_util.tree_map(
        lambda s: (tuple(s.shape), str(s.dtype)), specs
    )
    payload = repr(
        (
            jax.__version__,
            jax.default_backend(),
            key_parts,
            spec_repr,
            jax.tree_util.tree_structure(specs),
        )
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:32]


def cached_program(
    jitted: Callable,
    key_parts: tuple,
    example_args: tuple,
    label: str = "program",
) -> Callable:
    """Return a callable equivalent to ``jitted`` for inputs shaped like
    ``example_args``, backed by the on-disk exported-program cache.

    ``jitted`` must already be wrapped in :func:`jax.jit` (with whatever
    shardings it needs).  ``example_args`` are concrete arrays or
    :class:`jax.ShapeDtypeStruct` trees — only shapes/dtypes are read.
    """
    if not program_cache_enabled():
        return jitted
    try:
        specs = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), example_args
        )
        path = os.path.join(
            program_cache_dir(), f"{label}-{_digest(key_parts, specs)}.jaxexp"
        )
    except Exception:
        return jitted

    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                exported = jax.export.deserialize(bytearray(f.read()))
            return jax.jit(exported.call)
        except Exception:
            # stale/incompatible artifact: drop it and fall through to
            # re-export below
            try:
                os.unlink(path)
            except OSError:
                pass

    try:
        exported = jax.export.export(jitted)(*specs)
        blob = exported.serialize()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # atomic: concurrent runs see whole files
        # run through the exported artifact so the cold path executes the
        # byte-identical program the warm path will load
        return jax.jit(exported.call)
    except Exception:
        return jitted

"""ctypes binding for the C++ batch fitness scorer.

The shared library is built lazily from ``fitness_native.cpp`` on first use
(g++ -O3, cached next to the source); everything degrades gracefully to the
numpy scorer when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["is_available", "score_population_native"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fitness_native.cpp")
_LIB = os.path.join(_DIR, "libfitness_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-o",
        _LIB,
        _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.score_population.argtypes = [
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_double,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        lib.score_population.restype = None
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def score_population_native(structure, vectors, mask, w, h) -> np.ndarray:
    """Score a whole population.

    Args:
      structure: StructureType/int.
      vectors: (pop, K, 4) float array of [x, y, dx, dy].
      mask: (pop, K) bool validity.
    Returns:
      (pop,) float64 scores.  Raises RuntimeError if the library is
      unavailable (callers should check :func:`is_available`).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native fitness scorer unavailable")
    vectors = np.ascontiguousarray(vectors, dtype=np.float64)
    mask_u8 = np.ascontiguousarray(mask, dtype=np.uint8)
    pop, K = mask_u8.shape
    out = np.zeros(pop, dtype=np.float64)
    lib.score_population(
        int(structure), vectors, mask_u8, pop, K, float(w), float(h), out
    )
    return out

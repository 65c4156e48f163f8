"""PredNet weight IO.

Native format: NPZ with ``l{i}/{name}`` keys (HWIO conv layouts).  The
reference's pretrained predictors are Chainer ``.model`` NPZ snapshots
(fpsi_500000_20v.model color / 300000_wb.model grayscale, notebook cell 9);
:func:`load_chainer_model` makes a best-effort structural import of such
files when present — the published weights are external downloads and are
NOT shipped, so runs without a model file fall back to seeded random
parameters (``init_params``), which keeps the full pipeline exercisable and
deterministic (SURVEY.md §7 "hard parts": parity testing falls back to a
fixed-seed stand-in).
"""

from __future__ import annotations

import os
import re
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .model import PredNetParams, init_params

__all__ = ["save_params", "load_params", "load_chainer_model", "load_or_init"]


def save_params(params: PredNetParams, path: str, dtype=np.float32) -> None:
    """NPZ checkpoint; ``dtype=np.float16`` halves bundled-weight size (the
    inference dtype is bfloat16, so f16 storage loses nothing material)."""
    flat = {}
    for l, layer in enumerate(params):
        for name, arr in layer.items():
            flat[f"l{l}/{name}"] = np.asarray(arr, dtype=np.float32).astype(dtype)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_params(path: str, dtype=jnp.bfloat16) -> PredNetParams:
    data = np.load(path)
    layers: dict = {}
    for key in data.files:
        m = re.match(r"l(\d+)/(.+)", key)
        if not m:
            raise ValueError(f"not a native PredNet checkpoint (key {key!r})")
        layers.setdefault(int(m.group(1)), {})[m.group(2)] = data[key]
    return [
        {k: jnp.asarray(v, dtype) for k, v in layers[l].items()}
        for l in sorted(layers)
    ]


def load_chainer_model(
    path: str, channels: Sequence[int], dtype=jnp.bfloat16
) -> PredNetParams:
    """Best-effort import of a Chainer PredNet NPZ snapshot.

    Chainer convs are OIHW; ours are HWIO.  Gate weight blocks are
    re-stacked into our fused 4C layout where the per-gate convs can be
    identified.  Raises ``ValueError`` with the key listing when the naming
    scheme is unrecognized, so callers can fall back explicitly.
    """
    data = np.load(path, allow_pickle=True)
    keys = sorted(data.files)

    def to_hwio(w):
        return np.transpose(w, (2, 3, 1, 0))

    native = all(re.match(r"l\d+/", k) for k in keys)
    if native:
        return load_params(path, dtype)

    # Common chainer layouts name links like 'con0/W', 'ConvLSTM0/Wxi/W', ...
    lstm_gate_names = ("i", "f", "o", "c")
    params: PredNetParams = []
    try:
        L = len(channels)
        for l in range(L):
            layer = {}
            gates_w, gates_b = [], []
            for g in lstm_gate_names:
                wkeys = [k for k in keys if re.search(rf"(?i)lstm.?{l}.*x{g}/W$", k)]
                if not wkeys:
                    raise KeyError(f"layer {l} gate {g}")
                gates_w.append(to_hwio(data[wkeys[0]]))
                bkeys = [k for k in keys if re.search(rf"(?i)lstm.?{l}.*x{g}/b$", k)]
                gates_b.append(data[bkeys[0]] if bkeys else
                               np.zeros(gates_w[-1].shape[-1]))
            layer["lstm_w"] = jnp.asarray(np.concatenate(gates_w, axis=-1), dtype)
            layer["lstm_b"] = jnp.asarray(np.concatenate(gates_b, axis=-1), dtype)
            params.append(layer)
    except KeyError as e:
        raise ValueError(
            f"unrecognized Chainer PredNet naming in {path!r} (missing {e}); "
            f"keys: {keys[:20]}..."
        )
    return params


def bundled_weights_path(channels: Sequence[int]) -> Optional[str]:
    """Path of bundled pretrained stand-in weights for a channel stack
    (trained on synthetic motion, see pretrain.py), or None."""
    name = f"prednet_{'_'.join(str(c) for c in channels)}.npz"
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "weights", name)
    return path if os.path.exists(path) else None


def load_or_init(
    path: Optional[str],
    channels: Sequence[int],
    seed: int = 0,
    dtype=jnp.bfloat16,
) -> PredNetParams:
    """Load a model file if given; else bundled stand-in weights for this
    channel stack if shipped; else deterministic random init."""
    if path:
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        try:
            return load_params(path, dtype)
        except ValueError:
            return load_chainer_model(path, channels, dtype)
    bundled = bundled_weights_path(channels)
    if bundled:
        return load_params(bundled, dtype)
    return init_params(jax.random.PRNGKey(seed), channels, dtype=dtype)

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

__all__ = [
    "save_params",
    "load_params",
    "load_chainer_model",
    "detect_half_order",
    "load_or_init",
]


def save_params(params: PredNetParams, path: str, dtype=np.float32) -> None:
    """NPZ checkpoint; ``dtype=np.float16`` halves bundled-weight size (the
    inference dtype is bfloat16, so f16 storage loses nothing material).

    Written atomically (tmp + ``os.replace``) so a poller on the output
    path (e.g. the campaign scripts' stage gates) never observes a
    partially-written file (ADVICE r4)."""
    flat = {}
    for l, layer in enumerate(params):
        for name, arr in layer.items():
            flat[f"l{l}/{name}"] = np.asarray(arr, dtype=np.float32).astype(dtype)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


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
    path: str,
    channels: Sequence[int],
    dtype=jnp.bfloat16,
    half_order: str = "ahat-a",
) -> PredNetParams:
    """Import a Chainer PredNet NPZ snapshot into complete native params.

    The published predictors (fpsi_500000_20v.model / 300000_wb.model,
    notebook cell 9) are ``chainer.serializers.save_npz`` snapshots of the
    chainer_prednet ``PredNet`` chain (submodule empty in the reference —
    link layout inferred from the upstream Chainer PredNet implementation
    it forks):

      * ``ConvLSTM{l}/Wx{g}{n}/W|b`` — per-source input gate convs, gate
        g in {i, f, c, o}, source n = 0 (E_l, 2*C channels) and, below the
        top layer, n = 1 (upsampled R_{l+1});
      * ``ConvLSTM{l}/Wh{g}/W`` — recurrent convs on R_l (no bias);
      * ``ConvLSTM{l}/Wc{g}/W`` — EltFilter spatial peepholes, g in
        {i, f, o} (Hadamard weights on the cell state, shape
        (batch, C, H, W));
      * ``ConvP{l}/W|b`` — the Ahat prediction conv;
      * ``ConvA{l}/W|b`` — the A feed-forward conv (l < L-1).

    Everything is re-stacked into this package's fused layout
    (model.py ``init_params``): one (k, k, 2C + C + C_above, 4C) gate conv
    per layer, input slices ordered [E_l, R_l, up(R_{l+1})], gate order
    (i, f, o, c) per ``_lstm_gates_jnp``; peepholes land on the
    ``w_ci/w_cf/w_co`` slots as (H, W, C) Hadamard weights (they broadcast
    against (B, H, W, C) exactly like the per-channel vectors
    ``init_params`` creates).  Chainer convs are OIHW; ours are HWIO.
    E-unit half order is [ReLU(Ahat-A), ReLU(A-Ahat)] (model.py
    ``prednet_step``) — the Wx*0 input slice is imported positionally, so
    a snapshot trained with the opposite half order would need its first
    and second C-channel blocks swapped.

    Key prefixes from trainer snapshots (``predictor/...``,
    ``updater/model:main/...``) are stripped automatically.  Raises
    ``ValueError`` naming the first missing link when the file does not
    contain a recognizable PredNet for ``channels``.

    ``half_order`` selects the E-unit half convention of the SNAPSHOT:
      * ``"ahat-a"`` (default) — trained with E = [ReLU(Ahat-A),
        ReLU(A-Ahat)], this package's native order: import as-is;
      * ``"a-ahat"`` — trained with the opposite halves: the first and
        second C-channel input blocks of every E-consuming conv (the
        ``Wx*0`` gate slices and ``ConvA``) are swapped on import;
      * ``"auto"`` — import both ways and keep the order whose open-loop
        reconstruction of a static test frame is better
        (:func:`detect_half_order`) — a trained snapshot reconstructs far
        worse with scrambled E halves.
    """
    if half_order == "auto":
        half_order, _ = detect_half_order(path, channels)
    if half_order not in ("ahat-a", "a-ahat"):
        raise ValueError(
            f"half_order must be 'ahat-a', 'a-ahat' or 'auto', "
            f"got {half_order!r}"
        )
    swap_halves = half_order == "a-ahat"
    data = np.load(path, allow_pickle=True)
    keys = sorted(data.files)
    if keys and all(re.match(r"l\d+/", k) for k in keys):
        return load_params(path, dtype)

    # index: normalized (kind, layer, link, param) -> array.  Prefixes
    # before the PredNet link names are ignored.
    index = {}
    pat_lstm = re.compile(
        r"(?i)(?:^|/)conv_?lstm_?(\d+)/(w[xhc][ifco]\d*)/(W|b)$"
    )
    pat_p = re.compile(r"(?i)(?:^|/)conv_?p_?(\d+)/(W|b)$")
    pat_a = re.compile(r"(?i)(?:^|/)conv_?a_?(\d+)/(W|b)$")
    for k in keys:
        m = pat_lstm.search(k)
        if m:
            index[("lstm", int(m.group(1)), m.group(2).lower(), m.group(3))] = k
            continue
        m = pat_p.search(k)
        if m:
            index[("p", int(m.group(1)), "", m.group(2))] = k
            continue
        m = pat_a.search(k)
        if m:
            index[("a", int(m.group(1)), "", m.group(2))] = k

    if not index:
        raise ValueError(
            f"{path!r} is neither a native PredNet checkpoint nor a Chainer "
            f"PredNet snapshot (no ConvLSTM*/ConvP*/ConvA* links); "
            f"keys: {keys[:20]}..."
        )

    def to_hwio(w):
        return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))

    def get(kind, l, link="", param="W", required=True):
        key = index.get((kind, l, link, param))
        if key is None:
            if required:
                raise ValueError(
                    f"Chainer PredNet snapshot {path!r} is missing "
                    f"{kind}{l}/{link or ''}/{param} for channel stack "
                    f"{list(channels)}; found links: "
                    f"{sorted(set(i[:3] for i in index))[:30]}"
                )
            return None
        return np.asarray(data[key], np.float32)

    L = len(channels)
    params: PredNetParams = []
    for l in range(L):
        C = channels[l]
        c_above = channels[l + 1] if l + 1 < L else 0
        in_ch = 3 * C + c_above

        # probe kernel size from the first gate conv present
        wxi0 = get("lstm", l, "wxi0", "W", required=False)
        bare = wxi0 is None
        if bare:
            # single-source variant: un-numbered Wx* convs on concat input
            wxi0 = get("lstm", l, "wxi", "W")
        kh, kw = wxi0.shape[2], wxi0.shape[3]

        lstm_w = np.zeros((kh, kw, in_ch, 4 * C), np.float32)
        lstm_b = np.zeros((4 * C,), np.float32)
        # our fused gate order (model.py _lstm_gates_jnp jnp.split): i,f,o,g
        # with g = the Chainer "c" (tanh input) gate
        for gi, g in enumerate(("i", "f", "o", "c")):
            sl = slice(gi * C, (gi + 1) * C)
            if bare:
                wx = to_hwio(get("lstm", l, f"wx{g}", "W"))
                if wx.shape[2] not in (2 * C, 2 * C + c_above):
                    raise ValueError(
                        f"ConvLSTM{l}/Wx{g} input width {wx.shape[2]} does "
                        f"not match channels {list(channels)}"
                    )
                lstm_w[:, :, : 2 * C, sl] = wx[:, :, : 2 * C]
                if wx.shape[2] == 2 * C + c_above and c_above:
                    lstm_w[:, :, 3 * C :, sl] = wx[:, :, 2 * C :]
                b = get("lstm", l, f"wx{g}", "b", required=False)
            else:
                wx0 = to_hwio(get("lstm", l, f"wx{g}0", "W"))
                if wx0.shape != (kh, kw, 2 * C, C):
                    raise ValueError(
                        f"ConvLSTM{l}/Wx{g}0 shape {wx0.shape[::-1]} does "
                        f"not match channels {list(channels)} (expected "
                        f"in={2 * C}, out={C})"
                    )
                lstm_w[:, :, : 2 * C, sl] = wx0
                b = get("lstm", l, f"wx{g}0", "b", required=False)
                if c_above:
                    wx1 = get("lstm", l, f"wx{g}1", "W")
                    lstm_w[:, :, 3 * C :, sl] = to_hwio(wx1)
                    b1 = get("lstm", l, f"wx{g}1", "b", required=False)
                    if b1 is not None:
                        lstm_b[sl] += b1
            if b is not None:
                lstm_b[sl] += b
            wh = get("lstm", l, f"wh{g}", "W", required=False)
            if wh is not None:
                lstm_w[:, :, 2 * C : 3 * C, sl] = to_hwio(wh)

        if swap_halves:
            # snapshot trained with E = [ReLU(A-Ahat), ReLU(Ahat-A)]:
            # reorder the E input blocks of the gate conv to native order
            lstm_w[:, :, : 2 * C] = np.concatenate(
                [lstm_w[:, :, C : 2 * C], lstm_w[:, :, :C]], axis=2
            )

        layer = {
            "lstm_w": jnp.asarray(lstm_w, dtype),
            "lstm_b": jnp.asarray(lstm_b, dtype),
        }

        # spatial peepholes (EltFilter W: (batch, C, H, W) -> (H, W, C))
        peeps = {}
        for g, name in (("i", "w_ci"), ("f", "w_cf"), ("o", "w_co")):
            wc = get("lstm", l, f"wc{g}", "W", required=False)
            if wc is not None:
                wc = wc.reshape(wc.shape[-3:])  # drop batch dim if present
                peeps[name] = jnp.asarray(np.transpose(wc, (1, 2, 0)), dtype)
        if peeps:
            if len(peeps) != 3:
                raise ValueError(
                    f"ConvLSTM{l} has a partial peephole set "
                    f"{sorted(peeps)}; expected Wci/Wcf/Wco"
                )
            layer.update(peeps)

        ahat_w = get("p", l)
        if ahat_w.shape[:2] != (C, C):
            raise ValueError(
                f"ConvP{l} shape {ahat_w.shape} does not match channels "
                f"{list(channels)} (expected out=in={C})"
            )
        layer["ahat_w"] = jnp.asarray(to_hwio(ahat_w), dtype)
        ahat_b = get("p", l, "", "b", required=False)
        layer["ahat_b"] = jnp.asarray(
            ahat_b if ahat_b is not None else np.zeros((C,), np.float32), dtype
        )

        if l + 1 < L:
            a_w = get("a", l)
            if a_w.shape[:2] != (channels[l + 1], 2 * C):
                raise ValueError(
                    f"ConvA{l} shape {a_w.shape} does not match channels "
                    f"{list(channels)} (expected in={2 * C}, "
                    f"out={channels[l + 1]})"
                )
            a_w_hwio = to_hwio(a_w)
            if swap_halves:
                # ConvA consumes E too: swap its input halves likewise
                a_w_hwio = np.concatenate(
                    [a_w_hwio[:, :, C : 2 * C], a_w_hwio[:, :, :C]], axis=2
                )
            layer["a_w"] = jnp.asarray(a_w_hwio, dtype)
            a_b = get("a", l, "", "b", required=False)
            layer["a_b"] = jnp.asarray(
                a_b
                if a_b is not None
                else np.zeros((channels[l + 1],), np.float32),
                dtype,
            )
        params.append(layer)
    return params


def detect_half_order(path: str, channels: Sequence[int]):
    """Decide a Chainer snapshot's E-unit half order empirically.

    Imports the snapshot under both conventions and runs a short open-loop
    rollout on a static test frame (smooth gradient + rings — trackable
    structure in every channel).  A trained predictor reconstructs the
    frame; with its E halves scrambled the gate convs see positive/negative
    error swapped and reconstruction degrades sharply.  Returns
    ``(best_order, {order: mean_abs_error})``.

    Heuristic, so the errors are returned for inspection; ties within 2%
    keep the native default (``"ahat-a"``).
    """
    from .model import rollout

    c0 = channels[0]
    L = len(channels)
    side = 8 * (2 ** max(L - 1, 0))
    h = w = max(side, 32)
    yy, xx = np.meshgrid(
        np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij"
    )
    rr = np.hypot(yy - 0.5, xx - 0.5)
    img = 0.5 + 0.25 * np.sin(2 * np.pi * 5 * rr) + 0.25 * (xx - 0.5)
    frame = np.clip(img, 0.0, 1.0).astype(np.float32)
    frame = np.repeat(frame[..., None], c0, axis=-1)[None]

    errs = {}
    for order in ("ahat-a", "a-ahat"):
        params = load_chainer_model(
            path, channels, dtype=jnp.float32, half_order=order
        )
        out = rollout(
            params, jnp.asarray(frame), repeat=6, extension=0, collect=(5,)
        )
        pred = np.asarray(out["predictions"][5])
        errs[order] = float(np.mean(np.abs(pred - frame)))
    best = min(errs, key=errs.get)
    if errs[best] > 0.98 * errs["ahat-a"]:
        best = "ahat-a"
    return best, errs


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
    half_order: str = "ahat-a",
) -> PredNetParams:
    """Load a model file if given; else bundled stand-in weights for this
    channel stack if shipped; else deterministic random init.

    ``half_order`` (``ahat-a``/``a-ahat``/``auto``) only affects Chainer
    snapshot imports — see :func:`load_chainer_model`."""
    if path:
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        try:
            return load_params(path, dtype)
        except ValueError:
            return load_chainer_model(path, channels, dtype,
                                      half_order=half_order)
    bundled = bundled_weights_path(channels)
    if bundled:
        return load_params(bundled, dtype)
    return init_params(jax.random.PRNGKey(seed), channels, dtype=dtype)

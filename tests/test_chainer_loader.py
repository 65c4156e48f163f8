"""Chainer .model import: complete-params round trip vs a NumPy oracle.

The fixture is a synthetic ``chainer.serializers.save_npz``-layout snapshot
of the chainer_prednet PredNet chain (ConvLSTM{l}/Wx*{n}|Wh*|Wc*, ConvP{l},
ConvA{l} links in OIHW).  ``load_chainer_model`` must produce params that
(a) drive ``prednet_step``/``rollout`` without error and (b) match an
independent NumPy transcription of the Chainer ConvLSTM math step for step
— proving the gate order, source slicing, bias placement, peephole
transposes, and OIHW->HWIO conversion are all right.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evolutionary_illusion_generator_tpu.models.prednet.loader import (
    load_chainer_model,
    load_or_init,
)
from evolutionary_illusion_generator_tpu.models.prednet.model import (
    init_state,
    prednet_step,
    rollout,
)

CHANNELS = (1, 2)
H, W = 8, 8
K = 3


# ---------------------------------------------------------------------------
# fixture: synthetic Chainer-layout snapshot


def make_chainer_fixture(seed=0, channels=CHANNELS, peephole=True, prefix=""):
    """Arrays keyed like a Chainer PredNet NPZ snapshot (OIHW convs)."""
    rng = np.random.default_rng(seed)
    L = len(channels)

    def conv(out_ch, in_ch):
        return rng.normal(0, 0.3, (out_ch, in_ch, K, K)).astype(np.float32)

    arrays = {}
    for l in range(L):
        C = channels[l]
        c_above = channels[l + 1] if l + 1 < L else 0
        for g in "ifco":
            arrays[f"{prefix}ConvLSTM{l}/Wx{g}0/W"] = conv(C, 2 * C)
            arrays[f"{prefix}ConvLSTM{l}/Wx{g}0/b"] = rng.normal(
                0, 0.1, (C,)
            ).astype(np.float32)
            if c_above:
                arrays[f"{prefix}ConvLSTM{l}/Wx{g}1/W"] = conv(C, c_above)
            arrays[f"{prefix}ConvLSTM{l}/Wh{g}/W"] = conv(C, C)
        if peephole:
            hl, wl = H // (2**l), W // (2**l)
            for g in "ifo":
                arrays[f"{prefix}ConvLSTM{l}/Wc{g}/W"] = rng.normal(
                    0, 0.2, (1, C, hl, wl)
                ).astype(np.float32)
        arrays[f"{prefix}ConvP{l}/W"] = conv(C, C)
        arrays[f"{prefix}ConvP{l}/b"] = rng.normal(0, 0.1, (C,)).astype(
            np.float32
        )
        if c_above:
            arrays[f"{prefix}ConvA{l}/W"] = conv(c_above, 2 * C)
            arrays[f"{prefix}ConvA{l}/b"] = rng.normal(0, 0.1, (c_above,)).astype(
                np.float32
            )
    return arrays


def save_fixture(tmp_path, name="fpsi.model", **kwargs):
    arrays = make_chainer_fixture(**kwargs)
    path = str(tmp_path / name)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
    import os

    real = path if path.endswith(".npz") else path + ".npz"
    if real != path:
        os.rename(real, path)
    return path, arrays


# ---------------------------------------------------------------------------
# NumPy oracle: the Chainer PredNet step, straight from the OIHW arrays
# (independent loop transcription — intentionally NOT sharing code with the
# model, tests/oracles.py convention)


def _np_conv(x, w_oihw, b=None):
    """SAME cross-correlation: x (H, W, Cin), w (O, I, kh, kw) -> (H, W, O)."""
    O, I, kh, kw = w_oihw.shape
    h, w = x.shape[:2]
    ph, pw = kh // 2, kw // 2
    xp = np.pad(x, ((ph, ph), (pw, pw), (0, 0)))
    out = np.zeros((h, w, O), np.float32)
    for dy in range(kh):
        for dx in range(kw):
            out += xp[dy : dy + h, dx : dx + w, :] @ w_oihw[:, :, dy, dx].T
    if b is not None:
        out = out + b
    return out


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _upsample2(x):
    return np.repeat(np.repeat(x, 2, axis=0), 2, axis=1)


def _maxpool2(x):
    h, w, c = x.shape
    return x.reshape(h // 2, 2, w // 2, 2, c).max(axis=(1, 3))


def oracle_step(arrays, channels, state, frame, peephole=True):
    """One PredNet timestep computed with per-gate Chainer convs.

    state: list of dicts {"r", "c", "e"} (H/2^l, W/2^l, C) numpy.
    Returns (new_state, prediction).
    """
    L = len(channels)
    new_state = [dict(s) for s in state]
    # top-down recurrent pass
    r_above = None
    for l in reversed(range(L)):
        C = channels[l]
        sources = [state[l]["e"]]
        if r_above is not None:
            sources.append(_upsample2(r_above))
        pre = {}
        for g in "ifco":
            acc = _np_conv(
                sources[0],
                arrays[f"ConvLSTM{l}/Wx{g}0/W"],
                arrays[f"ConvLSTM{l}/Wx{g}0/b"],
            )
            if len(sources) > 1:
                acc += _np_conv(sources[1], arrays[f"ConvLSTM{l}/Wx{g}1/W"])
            acc += _np_conv(state[l]["r"], arrays[f"ConvLSTM{l}/Wh{g}/W"])
            pre[g] = acc
        c_prev = state[l]["c"]

        def peep(g):
            # EltFilter W is (1, C, H, W) -> (H, W, C) Hadamard weights
            wc = arrays[f"ConvLSTM{l}/Wc{g}/W"][0].transpose(1, 2, 0)
            return wc

        if peephole:
            i = _sigmoid(pre["i"] + peep("i") * c_prev)
            f = _sigmoid(pre["f"] + peep("f") * c_prev)
        else:
            i = _sigmoid(pre["i"])
            f = _sigmoid(pre["f"])
        g_ = np.tanh(pre["c"])
        c = f * c_prev + i * g_
        if peephole:
            o = _sigmoid(pre["o"] + peep("o") * c)
        else:
            o = _sigmoid(pre["o"])
        new_state[l]["r"] = o * np.tanh(c)
        new_state[l]["c"] = c
        r_above = new_state[l]["r"]

    # bottom-up error pass
    a = frame
    prediction = None
    for l in range(L):
        ahat = _np_conv(
            new_state[l]["r"], arrays[f"ConvP{l}/W"], arrays[f"ConvP{l}/b"]
        )
        if l == 0:
            ahat = np.clip(ahat, 0.0, 1.0)
            prediction = ahat
        else:
            ahat = np.maximum(ahat, 0.0)
        e = np.concatenate(
            [np.maximum(ahat - a, 0.0), np.maximum(a - ahat, 0.0)], axis=-1
        )
        new_state[l]["e"] = e
        if l + 1 < len(channels):
            a = _maxpool2(
                np.maximum(
                    _np_conv(e, arrays[f"ConvA{l}/W"], arrays[f"ConvA{l}/b"]),
                    0.0,
                )
            )
    return new_state, prediction


def oracle_rollout(arrays, channels, frame, steps, peephole=True):
    state = [
        {
            "r": np.zeros((H // 2**l, W // 2**l, C), np.float32),
            "c": np.zeros((H // 2**l, W // 2**l, C), np.float32),
            "e": np.zeros((H // 2**l, W // 2**l, 2 * C), np.float32),
        }
        for l, C in enumerate(channels)
    ]
    preds = []
    for _ in range(steps):
        state, pred = oracle_step(arrays, channels, state, frame, peephole)
        preds.append(pred)
    return preds


# ---------------------------------------------------------------------------


@pytest.mark.parametrize("peephole", [True, False])
def test_loaded_params_match_numpy_oracle(tmp_path, peephole):
    """load_chainer_model -> prednet_step == per-gate Chainer math."""
    path, arrays = save_fixture(tmp_path, peephole=peephole)
    params = load_chainer_model(path, CHANNELS, dtype=jnp.float32)

    # completeness: every slot prednet_step reads exists
    for l, layer in enumerate(params):
        assert {"lstm_w", "lstm_b", "ahat_w", "ahat_b"} <= set(layer), (
            l, sorted(layer),
        )
        if peephole:
            assert {"w_ci", "w_cf", "w_co"} <= set(layer)
    assert "a_w" in params[0] and "a_b" in params[0]

    rng = np.random.default_rng(42)
    frame = rng.uniform(0, 1, (H, W, CHANNELS[0])).astype(np.float32)

    state = init_state(1, H, W, CHANNELS, dtype=jnp.float32)
    preds = []
    for _ in range(3):
        state, pred = prednet_step(params, state, jnp.asarray(frame)[None])
        preds.append(np.asarray(pred[0]))

    want = oracle_rollout(arrays, CHANNELS, frame, 3, peephole=peephole)
    for t, (got, exp) in enumerate(zip(preds, want)):
        np.testing.assert_allclose(got, exp, atol=2e-5, err_msg=f"step {t}")


def test_loaded_params_run_through_rollout(tmp_path):
    path, _ = save_fixture(tmp_path)
    params = load_chainer_model(path, CHANNELS, dtype=jnp.float32)
    img = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (2, H, W, 1)), jnp.float32
    )
    out = rollout(params, img, repeat=4, extension=2, collect=(3, 4, 5))
    assert set(out["predictions"]) == {3, 4, 5}
    for p in out["predictions"].values():
        assert p.shape == (2, H, W, 1)
        assert bool(jnp.all(jnp.isfinite(p)))


def test_trainer_prefix_is_stripped(tmp_path):
    plain, _ = save_fixture(tmp_path, name="plain.model")
    prefixed, _ = save_fixture(
        tmp_path, name="snap.model", prefix="updater/model:main/predictor/"
    )
    a = load_chainer_model(plain, CHANNELS, dtype=jnp.float32)
    b = load_chainer_model(prefixed, CHANNELS, dtype=jnp.float32)
    for la, lb in zip(a, b):
        assert sorted(la) == sorted(lb)
        for k in la:
            np.testing.assert_array_equal(np.asarray(la[k]), np.asarray(lb[k]))


def test_missing_link_raises_named_error(tmp_path):
    arrays = make_chainer_fixture()
    del arrays["ConvP1/W"]
    path = str(tmp_path / "broken.npz")
    np.savez(path, **arrays)
    with pytest.raises(ValueError, match="ConvP|p1"):
        load_chainer_model(path, CHANNELS)


def test_wrong_channels_raise(tmp_path):
    path, _ = save_fixture(tmp_path)
    with pytest.raises(ValueError):
        load_chainer_model(path, (3, 48), dtype=jnp.float32)


def test_unrecognized_file_raises(tmp_path):
    path = str(tmp_path / "junk.npz")
    np.savez(path, foo=np.zeros(3))
    with pytest.raises(ValueError, match="neither"):
        load_chainer_model(path, CHANNELS)


def test_load_or_init_routes_model_files(tmp_path):
    """A .model path goes load_params -> ValueError -> chainer importer."""
    path, _ = save_fixture(tmp_path)
    params = load_or_init(path, list(CHANNELS))
    assert "ahat_w" in params[0] and "w_ci" in params[0]

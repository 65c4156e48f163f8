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


# ---------------------------------------------------------------------------
# E-unit half order: override + empirical detection


def export_chainer_arrays(params, channels, swap_e_halves=False):
    """Native fused params -> Chainer-layout OIHW arrays (test-local inverse
    of load_chainer_model).  ``swap_e_halves=True`` writes the snapshot as
    if it had been trained with E = [ReLU(A-Ahat), ReLU(Ahat-A)] — the
    opposite half convention."""
    arrays = {}
    L = len(channels)

    def to_oihw(w_hwio):
        return np.ascontiguousarray(
            np.transpose(np.asarray(w_hwio, np.float32), (3, 2, 0, 1))
        )

    def swap_in(w_hwio, C):
        return np.concatenate(
            [w_hwio[:, :, C : 2 * C], w_hwio[:, :, :C]], axis=2
        )

    for l in range(L):
        C = channels[l]
        c_above = channels[l + 1] if l + 1 < L else 0
        lw = np.asarray(params[l]["lstm_w"], np.float32)
        lb = np.asarray(params[l]["lstm_b"], np.float32)
        for gi, g in enumerate(("i", "f", "o", "c")):
            sl = slice(gi * C, (gi + 1) * C)
            we = lw[:, :, : 2 * C, sl]
            if swap_e_halves:
                we = swap_in(we, C)
            arrays[f"ConvLSTM{l}/Wx{g}0/W"] = to_oihw(we)
            arrays[f"ConvLSTM{l}/Wx{g}0/b"] = lb[sl].copy()
            arrays[f"ConvLSTM{l}/Wh{g}/W"] = to_oihw(lw[:, :, 2 * C : 3 * C, sl])
            if c_above:
                arrays[f"ConvLSTM{l}/Wx{g}1/W"] = to_oihw(lw[:, :, 3 * C :, sl])
        arrays[f"ConvP{l}/W"] = to_oihw(params[l]["ahat_w"])
        arrays[f"ConvP{l}/b"] = np.asarray(params[l]["ahat_b"], np.float32)
        if c_above:
            aw = np.asarray(params[l]["a_w"], np.float32)
            if swap_e_halves:
                aw = swap_in(aw, C)
            arrays[f"ConvA{l}/W"] = to_oihw(aw)
            arrays[f"ConvA{l}/b"] = np.asarray(params[l]["a_b"], np.float32)
    return arrays


@pytest.fixture(scope="module")
def bundled_bw_params():
    from evolutionary_illusion_generator_tpu.models.prednet.loader import (
        bundled_weights_path,
        load_params,
    )

    path = bundled_weights_path((1, 16, 32, 64))
    if path is None:
        pytest.skip("no bundled bw weights")
    return load_params(path, dtype=jnp.float32)


def _params_allclose(a, b, atol=1e-5):
    for la, lb in zip(a, b):
        assert sorted(la) == sorted(lb)
        for k in la:
            np.testing.assert_allclose(
                np.asarray(la[k]), np.asarray(lb[k]), atol=atol, err_msg=k
            )


def test_half_order_override_roundtrip(tmp_path, bundled_bw_params):
    """A snapshot written in the opposite E-half convention imports back to
    the original params under half_order='a-ahat'."""
    channels = (1, 16, 32, 64)
    native = export_chainer_arrays(bundled_bw_params, channels)
    flipped = export_chainer_arrays(bundled_bw_params, channels,
                                    swap_e_halves=True)
    p_native = str(tmp_path / "native.model")
    p_flipped = str(tmp_path / "flipped.model")
    np.savez(p_native + ".npz", **native)
    np.savez(p_flipped + ".npz", **flipped)
    import os

    os.rename(p_native + ".npz", p_native)
    os.rename(p_flipped + ".npz", p_flipped)

    a = load_chainer_model(p_native, channels, dtype=jnp.float32)
    _params_allclose(a, bundled_bw_params)
    b = load_chainer_model(p_flipped, channels, dtype=jnp.float32,
                           half_order="a-ahat")
    _params_allclose(b, bundled_bw_params)
    # loading the flipped snapshot in the native order must NOT match
    with pytest.raises(AssertionError):
        _params_allclose(
            load_chainer_model(p_flipped, channels, dtype=jnp.float32),
            bundled_bw_params,
        )

    from evolutionary_illusion_generator_tpu.models.prednet.loader import (
        detect_half_order,
    )

    best_n, errs_n = detect_half_order(p_native, channels)
    best_f, errs_f = detect_half_order(p_flipped, channels)
    assert best_n == "ahat-a", errs_n
    assert best_f == "a-ahat", errs_f
    # half_order='auto' routes through detection
    c = load_chainer_model(p_flipped, channels, dtype=jnp.float32,
                           half_order="auto")
    _params_allclose(c, bundled_bw_params)


def test_half_order_rejects_unknown(tmp_path):
    path, _ = save_fixture(tmp_path)
    with pytest.raises(ValueError, match="half_order"):
        load_chainer_model(path, CHANNELS, half_order="sideways")

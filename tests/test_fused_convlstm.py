"""Fused ConvLSTM layer kernel: parity vs the reference jnp math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evolutionary_illusion_generator_tpu.models.prednet.model import (
    _conv,
    _lstm_gates_jnp,
)
from evolutionary_illusion_generator_tpu.ops.convlstm_fused_pallas import (
    fused_convlstm_layer,
)


@pytest.mark.parametrize("shape", [(2, 16, 24, 10, 4), (1, 8, 16, 6, 8)])
def test_matches_conv_plus_gates(shape):
    B, H, W, Cin, C = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, Cin)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.2, (3, 3, Cin, 4 * C)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (4 * C,)), jnp.float32)
    c_prev = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.float32)

    # reference: XLA conv (bf16 inputs like the kernel) + gate math
    gates = _conv(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), b)
    h_ref, c_ref = _lstm_gates_jnp(gates, c_prev)

    h, c = fused_convlstm_layer(
        x, w, b, c_prev, rows_per_block=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=5e-2,
                               rtol=5e-2)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), atol=5e-2,
                               rtol=5e-2)


def test_fused_rollout_parity(monkeypatch):
    """use_pallas='fused' through the full rollout matches the default
    path (interpret mode on CPU; bf16 tolerance).

    The channel stack must cross the C >= 32 gate in prednet_step or the
    fused path silently falls back to XLA and the test compares the default
    path with itself; a call counter asserts the kernel actually ran."""
    import evolutionary_illusion_generator_tpu.ops.convlstm_fused_pallas as fp
    from evolutionary_illusion_generator_tpu.models.prednet.model import (
        init_params,
        rollout_flow_frames,
    )

    calls = {"n": 0}
    real = fp.fused_convlstm_layer

    def counted(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(fp, "fused_convlstm_layer", counted)

    params = init_params(jax.random.PRNGKey(0), (1, 32, 64))
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 48, 1))
    f0a, f1a = rollout_flow_frames(params, imgs, repeat=3, extension=2,
                                   pair="probe")
    assert calls["n"] == 0
    f0b, f1b = rollout_flow_frames(params, imgs, repeat=3, extension=2,
                                   pair="probe", use_pallas="fused")
    assert calls["n"] > 0, "fused kernel never invoked: gate regressed"
    np.testing.assert_allclose(np.asarray(f0a), np.asarray(f0b), atol=2e-3)
    np.testing.assert_allclose(np.asarray(f1a), np.asarray(f1b), atol=2e-3)


def test_fused_multi_matches_split_convs():
    """fused_convlstm_layer_multi (interpret mode) vs the split-conv XLA
    chain at a 128-lane-aligned stack — the only widths the DMA variant
    can compile for on hardware (BENCH_NOTES.md)."""
    from evolutionary_illusion_generator_tpu.ops.convlstm_fused_pallas import (
        fused_convlstm_layer_multi,
    )

    B, H, W, C = 1, 16, 24, 32
    cins = (256, 128, 128)
    rng = np.random.default_rng(3)
    srcs = [
        jnp.asarray(rng.normal(0, 1, (B, H, W, ci)), jnp.float32)
        for ci in cins
    ]
    ws = [
        jnp.asarray(rng.normal(0, 0.05, (3, 3, ci, 4 * C)), jnp.float32)
        for ci in cins
    ]
    b = jnp.asarray(rng.normal(0, 0.1, (4 * C,)), jnp.float32)
    c_prev = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.float32)

    # reference: sum of per-source bf16 convs (the split-conv chain) + gates
    gates = _conv(srcs[0].astype(jnp.bfloat16), ws[0].astype(jnp.bfloat16), b)
    for s, w in zip(srcs[1:], ws[1:]):
        gates = gates + _conv(
            s.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            jnp.zeros_like(b),
        )
    h_ref, c_ref = _lstm_gates_jnp(gates, c_prev)

    h, c = fused_convlstm_layer_multi(
        srcs, ws, b, c_prev, rows_per_block=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=5e-2,
                               rtol=5e-2)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), atol=5e-2,
                               rtol=5e-2)


def test_pick_rows():
    from evolutionary_illusion_generator_tpu.ops.convlstm_fused_pallas import (
        pick_rows,
    )

    assert pick_rows(240) == 48
    assert pick_rows(480) == 48
    assert pick_rows(120) == 40
    assert pick_rows(30) == 30
    assert 30 % pick_rows(30) == 0

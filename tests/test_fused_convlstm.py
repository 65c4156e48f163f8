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


def test_fused_rollout_parity():
    """use_pallas='fused' through the full rollout matches the default
    path (interpret mode on CPU; bf16 tolerance)."""
    from evolutionary_illusion_generator_tpu.models.prednet.model import (
        init_params,
        rollout_flow_frames,
    )

    params = init_params(jax.random.PRNGKey(0), (1, 8, 16))
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 48, 1))
    f0a, f1a = rollout_flow_frames(params, imgs, repeat=3, extension=2,
                                   pair="probe")
    f0b, f1b = rollout_flow_frames(params, imgs, repeat=3, extension=2,
                                   pair="probe", use_pallas="fused")
    np.testing.assert_allclose(np.asarray(f0a), np.asarray(f0b), atol=2e-3)
    np.testing.assert_allclose(np.asarray(f1a), np.asarray(f1b), atol=2e-3)


def test_pick_rows():
    from evolutionary_illusion_generator_tpu.ops.convlstm_fused_pallas import (
        pick_rows,
    )

    assert pick_rows(240) == 48
    assert pick_rows(480) == 48
    assert pick_rows(120) == 40
    assert pick_rows(30) == 30
    assert 30 % pick_rows(30) == 0

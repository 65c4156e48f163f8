"""PredNet tests: shapes, rollout schedule, gate-kernel parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evolutionary_illusion_generator_tpu.models.prednet import (
    init_params,
    init_state,
    prednet_step,
    rollout,
    rollout_flow_frames,
)
from evolutionary_illusion_generator_tpu.models.prednet.model import _lstm_gates_jnp
from evolutionary_illusion_generator_tpu.ops.convlstm_pallas import fused_lstm_gates

CHANNELS = (1, 4, 8)  # tiny stand-in stack (real: [3,48,96,192])
H, W, B = 16, 24, 3


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CHANNELS)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(0, 1, (B, H, W, CHANNELS[0])), jnp.float32)


class TestStep:
    def test_shapes_and_range(self, params, images):
        state = init_state(B, H, W, CHANNELS)
        state, pred = prednet_step(params, state, images)
        assert pred.shape == (B, H, W, CHANNELS[0])
        assert pred.dtype == jnp.float32
        # SatLU keeps the pixel prediction in [0, 1]
        assert float(jnp.min(pred)) >= 0.0 and float(jnp.max(pred)) <= 1.0
        for l, C in enumerate(CHANNELS):
            hl, wl = H // 2**l, W // 2**l
            assert state[l]["r"].shape == (B, hl, wl, C)
            assert state[l]["e"].shape == (B, hl, wl, 2 * C)

    def test_batch_independence(self, params, images):
        """Candidate b's prediction must not depend on other candidates —
        the property the reference needs reset_at for."""
        state = init_state(B, H, W, CHANNELS)
        _, pred_full = prednet_step(params, state, images)
        state1 = init_state(1, H, W, CHANNELS)
        _, pred_one = prednet_step(params, state1, images[1:2])
        np.testing.assert_allclose(
            np.asarray(pred_full)[1], np.asarray(pred_one)[0], rtol=2e-3, atol=2e-3
        )


class TestRollout:
    def test_collect_and_schedule(self, params, images):
        out = rollout(params, images, repeat=5, extension=2, collect=(4, 5, 6))
        preds = out["predictions"]
        assert set(preds) == {4, 5, 6}
        for p in preds.values():
            assert p.shape == (B, H, W, CHANNELS[0])
        # open-loop prediction at t=4 and closed-loop at t=5 must differ
        assert not np.allclose(np.asarray(preds[4]), np.asarray(preds[5]))

    def test_flow_frame_conventions(self, params, images):
        f0, f1 = rollout_flow_frames(params, images, repeat=5, extension=2,
                                     pair="population")
        assert f0.shape == f1.shape == images.shape
        g0, g1 = rollout_flow_frames(params, images, repeat=5, extension=2,
                                     pair="probe")
        np.testing.assert_allclose(np.asarray(g0), np.asarray(images))

    def test_deterministic(self, params, images):
        a = rollout(params, images, repeat=4, extension=2, collect=(3,))
        b = rollout(params, images, repeat=4, extension=2, collect=(3,))
        np.testing.assert_array_equal(
            np.asarray(a["predictions"][3]), np.asarray(b["predictions"][3])
        )

    def test_open_loop_converges_more_with_repeats(self, params, images):
        """More repeats of the same frame should not increase prediction
        error (the predictive coder settles)."""
        short = rollout(params, images, repeat=3, extension=1, collect=(2,))
        long = rollout(params, images, repeat=15, extension=1, collect=(14,))
        err_short = float(jnp.mean(jnp.abs(short["predictions"][2] - images)))
        err_long = float(jnp.mean(jnp.abs(long["predictions"][14] - images)))
        assert err_long <= err_short * 1.5  # loose: settling, not divergence


class TestFusedGates:
    def test_pallas_matches_jnp(self):
        rng = np.random.default_rng(1)
        gates = jnp.asarray(rng.normal(0, 2, (2, 8, 16, 4 * 8)), jnp.float32)
        c_prev = jnp.asarray(rng.normal(0, 1, (2, 8, 16, 8)), jnp.float32)
        h_ref, c_ref = _lstm_gates_jnp(gates, c_prev)
        h_pal, c_pal = fused_lstm_gates(gates, c_prev, interpret=True)
        np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref), rtol=1e-5, atol=1e-6)

    def test_rollout_with_pallas_gates(self, params, images):
        a = rollout(params, images, repeat=3, extension=1, collect=(3,))
        b = rollout(params, images, repeat=3, extension=1, collect=(3,),
                    use_pallas=True)
        np.testing.assert_allclose(
            np.asarray(a["predictions"][3]),
            np.asarray(b["predictions"][3]),
            rtol=2e-3,
            atol=2e-3,
        )


class TestPeephole:
    def test_zero_peephole_matches_plain(self, images):
        p_plain = init_params(jax.random.PRNGKey(5), CHANNELS)
        p_peep = init_params(jax.random.PRNGKey(5), CHANNELS, peephole=True)
        # zero-initialized peepholes are a no-op
        s0 = init_state(B, H, W, CHANNELS)
        _, a = prednet_step(p_plain, s0, images)
        _, b = prednet_step(p_peep, init_state(B, H, W, CHANNELS), images)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_nonzero_peephole_changes_output(self, images):
        p_peep = init_params(jax.random.PRNGKey(5), CHANNELS, peephole=True)
        _, a = prednet_step(p_peep, init_state(B, H, W, CHANNELS), images)
        # run two steps so c != 0 feeds the peepholes
        s, _ = prednet_step(p_peep, init_state(B, H, W, CHANNELS), images)
        for l in range(len(p_peep)):
            p_peep[l]["w_ci"] = p_peep[l]["w_ci"] + 1.0
            p_peep[l]["w_cf"] = p_peep[l]["w_cf"] - 0.5
            # w_co peeps at the NEW cell, which is nonzero from step 2 on
            p_peep[l]["w_co"] = p_peep[l]["w_co"] + 2.0
        s2, _ = prednet_step(p_peep, s, images)
        p_plain = init_params(jax.random.PRNGKey(5), CHANNELS)
        s3, _ = prednet_step(p_plain, s, images)
        # the recurrent state must differ once the cell feedback is nonzero
        diff = np.abs(
            np.asarray(s2[1]["r"], dtype=np.float32)
            - np.asarray(s3[1]["r"], dtype=np.float32)
        ).max()
        assert diff > 0


class TestSubpixelUpconv:
    def test_matches_naive_upsample_conv_f32(self):
        """_upconv_subpixel == conv3x3(NN-up2(x)) exactly (f32 weights)."""
        from evolutionary_illusion_generator_tpu.models.prednet.model import (
            _conv_nobias,
            _upconv_subpixel,
            _upsample2,
        )

        k1, k2 = jax.random.split(jax.random.PRNGKey(7))
        x = jax.random.normal(k1, (2, 6, 10, 5), jnp.float32)
        w = jax.random.normal(k2, (3, 3, 5, 12), jnp.float32)
        ref = _conv_nobias(_upsample2(x), w, jnp.float32)
        got = _upconv_subpixel(x, w, jnp.float32)
        assert got.shape == ref.shape == (2, 12, 20, 12)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_rollout_parity(self, params, images):
        """subpixel_up only changes tap-summation order: rollout outputs
        agree to bf16-rounding tolerance."""
        a = rollout_flow_frames(params, images, repeat=4, extension=2)
        b = rollout_flow_frames(
            params, images, repeat=4, extension=2, subpixel_up=True
        )
        for u, v in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(u), np.asarray(v), rtol=0.05, atol=0.02
            )


class TestS2dPixelLayer:
    def test_s2d_roundtrip(self):
        from evolutionary_illusion_generator_tpu.models.prednet.model import (
            _d2s,
            _s2d,
        )

        x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 12, 5))
        np.testing.assert_array_equal(np.asarray(_d2s(_s2d(x))), np.asarray(x))

    def test_lifted_kernel_matches_full_res_conv(self):
        """conv_same(_s2d(x), _s2d_kernel(w)) == _s2d(conv_same(x, w))."""
        from evolutionary_illusion_generator_tpu.models.prednet.model import (
            _conv_nobias,
            _s2d,
            _s2d_kernel,
        )

        k1, k2 = jax.random.split(jax.random.PRNGKey(11))
        x = jax.random.normal(k1, (2, 10, 14, 3), jnp.float32)
        w = jax.random.normal(k2, (3, 3, 3, 7), jnp.float32)
        ref = _s2d(_conv_nobias(x, w, jnp.float32))
        got = _conv_nobias(_s2d(x), _s2d_kernel(w), jnp.float32)
        assert got.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_lifted_tiled_kernel_matches_upsample_conv(self):
        """conv(x, _s2d_kernel_tiled(w)) == _s2d(conv3x3(NN-up2(x), w))."""
        from evolutionary_illusion_generator_tpu.models.prednet.model import (
            _conv_nobias,
            _s2d,
            _s2d_kernel_tiled,
            _upsample2,
        )

        k1, k2 = jax.random.split(jax.random.PRNGKey(13))
        x = jax.random.normal(k1, (2, 6, 9, 4), jnp.float32)
        w = jax.random.normal(k2, (3, 3, 4, 8), jnp.float32)
        ref = _s2d(_conv_nobias(_upsample2(x), w, jnp.float32))
        got = _conv_nobias(x, _s2d_kernel_tiled(w), jnp.float32)
        assert got.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_rollout_parity_f32(self, images):
        """s2d_l0 rollout == default rollout to f32 accumulation-order
        tolerance (f32 params isolate the layout change from bf16 noise),
        both flow-pair conventions."""
        p32 = init_params(jax.random.PRNGKey(0), CHANNELS, dtype=jnp.float32)
        for pair in ("population", "probe"):
            a = rollout_flow_frames(
                p32, images, repeat=4, extension=2, pair=pair,
                compute_dtype=jnp.float32,
            )
            b = rollout_flow_frames(
                p32, images, repeat=4, extension=2, pair=pair,
                compute_dtype=jnp.float32, s2d_l0=True,
            )
            for u, v in zip(a, b):
                assert u.shape == v.shape
                np.testing.assert_allclose(
                    np.asarray(u), np.asarray(v), rtol=1e-4, atol=1e-5
                )

    def test_rollout_parity_bf16(self, params, images):
        """At the production bf16 dtype the drift stays rounding-level."""
        a = rollout_flow_frames(params, images, repeat=4, extension=2)
        b = rollout_flow_frames(
            params, images, repeat=4, extension=2, s2d_l0=True
        )
        for u, v in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(u), np.asarray(v), rtol=0.05, atol=0.02
            )

    def test_falls_back_on_int8(self, params):
        """_s2d_ok gate: quantized params run the default int8 path under
        s2d_l0=True (identical result, no crash)."""
        from evolutionary_illusion_generator_tpu.models.prednet.model import (
            quantize_params_int8,
        )

        rng = np.random.default_rng(5)
        qp = quantize_params_int8(params)
        even = jnp.asarray(rng.random((2, 16, 24, CHANNELS[0]), np.float32))
        a = rollout_flow_frames(qp, even, repeat=3, extension=2)
        b = rollout_flow_frames(qp, even, repeat=3, extension=2, s2d_l0=True)
        for u, v in zip(a, b):
            np.testing.assert_array_equal(np.asarray(u), np.asarray(v))

"""Synthetic-data generator and pretraining smoke tests."""

import numpy as np

import jax

from evolutionary_illusion_generator_tpu.models.prednet.pretrain import pretrain
from evolutionary_illusion_generator_tpu.models.prednet.synthetic_data import (
    synthetic_motion_batch,
)


class TestSyntheticData:
    def test_shapes_and_range(self):
        frames = synthetic_motion_batch(jax.random.PRNGKey(0), 3, 5, 24, 32, 1)
        assert frames.shape == (3, 5, 24, 32, 1)
        f = np.asarray(frames)
        assert f.min() >= 0.0 and f.max() <= 1.0

    def test_frames_actually_move(self):
        frames = np.asarray(
            synthetic_motion_batch(jax.random.PRNGKey(1), 2, 6, 24, 32, 1)
        )
        # consecutive frames differ (motion), but are correlated (texture)
        d01 = np.abs(frames[:, 1] - frames[:, 0]).mean()
        assert d01 > 1e-4
        a = frames[0, 0].ravel() - frames[0, 0].mean()
        b = frames[0, 1].ravel() - frames[0, 1].mean()
        corr = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert corr > 0.5

    def test_deterministic(self):
        a = synthetic_motion_batch(jax.random.PRNGKey(2), 1, 3, 16, 16, 1)
        b = synthetic_motion_batch(jax.random.PRNGKey(2), 1, 3, 16, 16, 1)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pretrain_reduces_loss():
    params, loss = pretrain(
        (1, 4), steps=6, batch=2, T=4, h=24, w=32, lr=5e-3, verbose=False
    )
    assert np.isfinite(loss)
    # compare against the untrained loss on a fixed batch
    from evolutionary_illusion_generator_tpu.models.prednet import init_params
    from evolutionary_illusion_generator_tpu.models.prednet.train import (
        prednet_loss,
    )

    frames = synthetic_motion_batch(jax.random.PRNGKey(9), 2, 4, 24, 32, 1)
    before = float(prednet_loss(init_params(jax.random.PRNGKey(0), (1, 4)), frames))
    after = float(prednet_loss(params, frames))
    assert after < before

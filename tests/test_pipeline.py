"""Layer-pipelined PredNet rollout (parallel/pipeline.py) on the virtual
CPU mesh: bit-level parity with the unpipelined rollout, both flow-pair
conventions, and the wavefront's validity guards (SURVEY §2.4 optional
pipeline-parallel row)."""

import numpy as np
import pytest

import jax

from evolutionary_illusion_generator_tpu.models.prednet import (
    init_params,
    rollout_flow_frames,
)
from evolutionary_illusion_generator_tpu.parallel.pipeline import (
    make_pp_mesh,
    pipelined_rollout_flow_frames,
)

CHANNELS = (1, 4, 8)  # L=3 stages


def _setup(B=8, hw=(48, 40), seed=0):
    params = init_params(jax.random.PRNGKey(0), CHANNELS)
    imgs = jax.random.uniform(jax.random.PRNGKey(seed), (B, *hw, CHANNELS[0]))
    return params, imgs


@pytest.mark.parametrize("pair", ["population", "probe"])
def test_pipelined_matches_unpipelined(pair):
    params, imgs = _setup()
    mesh = make_pp_mesh(len(CHANNELS))
    f0p, f1p = pipelined_rollout_flow_frames(
        params, imgs, mesh, repeat=5, extension=2, pair=pair, n_micro=4
    )
    f0, f1 = rollout_flow_frames(params, imgs, repeat=5, extension=2, pair=pair)
    np.testing.assert_allclose(np.asarray(f0p), np.asarray(f0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(f1p), np.asarray(f1), atol=2e-5)


def test_minimum_microbatch_count_fills_wavefront():
    """n_micro == L is the minimum that satisfies the down(t)/up(t-1)
    dependency gap; the result must still be exact."""
    params, imgs = _setup(B=6)
    mesh = make_pp_mesh(len(CHANNELS))
    f0p, f1p = pipelined_rollout_flow_frames(
        params, imgs, mesh, repeat=4, extension=2, n_micro=3
    )
    f0, f1 = rollout_flow_frames(params, imgs, repeat=4, extension=2,
                                 pair="population")
    np.testing.assert_allclose(np.asarray(f0p), np.asarray(f0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(f1p), np.asarray(f1), atol=2e-5)


def test_four_stage_color_stack():
    params = init_params(jax.random.PRNGKey(2), (3, 4, 8, 8))
    imgs = jax.random.uniform(jax.random.PRNGKey(3), (4, 32, 32, 3))
    mesh = make_pp_mesh(4)
    f0p, f1p = pipelined_rollout_flow_frames(
        params, imgs, mesh, repeat=3, extension=2, n_micro=4
    )
    f0, f1 = rollout_flow_frames(params, imgs, repeat=3, extension=2,
                                 pair="population")
    np.testing.assert_allclose(np.asarray(f0p), np.asarray(f0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(f1p), np.asarray(f1), atol=2e-5)


@pytest.mark.parametrize("pair", ["population", "probe"])
def test_pipelined_matches_s2d_rollout(pair):
    """The pipelined path (which computes in the plain layout) must agree
    with the s2d-defaulted unpipelined rollout — the promoted TPU default —
    up to the s2d layout's accumulation-order rounding (VERDICT r4
    weak #7).  f32 params isolate the layout change from bf16 noise."""
    import jax.numpy as jnp

    params = init_params(jax.random.PRNGKey(0), CHANNELS, dtype=jnp.float32)
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (8, 48, 40, CHANNELS[0]))
    mesh = make_pp_mesh(len(CHANNELS))
    f0p, f1p = pipelined_rollout_flow_frames(
        params, imgs, mesh, repeat=5, extension=2, pair=pair, n_micro=4
    )
    f0, f1 = rollout_flow_frames(
        params, imgs, repeat=5, extension=2, pair=pair, s2d_l0=True,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(f0p), np.asarray(f0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f1p), np.asarray(f1), atol=1e-6)


def test_guards():
    params, imgs = _setup()
    mesh = make_pp_mesh(len(CHANNELS))
    with pytest.raises(ValueError, match="n_micro"):
        pipelined_rollout_flow_frames(params, imgs, mesh, n_micro=2)
    with pytest.raises(ValueError, match="not divisible"):
        pipelined_rollout_flow_frames(params, imgs, mesh, n_micro=5)
    bad_mesh = make_pp_mesh(2)
    with pytest.raises(ValueError, match="pp"):
        pipelined_rollout_flow_frames(params, imgs, bad_mesh, n_micro=4)

"""int8-quantized predictor path (models/prednet/model.py::quantize_params_int8).

The int8 path is a perf experiment (v5e MXU int8 throughput is 2x bf16);
these tests pin its *correctness* contract on the CPU mesh:

* weight quantization round-trips within the per-channel step size;
* the quantized rollout runs end to end and tracks the float rollout's
  predictions closely on the bundled BW weights (whether the drift signal
  survives is probed on hardware — BENCH_NOTES.md).
"""

from random import Random

import numpy as np
import jax
import jax.numpy as jnp

from evolutionary_illusion_generator_tpu.evolution.evaluator import (
    EvalConfig,
    GenerationEvaluator,
)
from evolutionary_illusion_generator_tpu.models.prednet.loader import (
    load_or_init,
)
from evolutionary_illusion_generator_tpu.models.prednet.model import (
    init_params,
    quantize_params_int8,
    rollout_flow_frames,
)
from evolutionary_illusion_generator_tpu.neat import Genome, preset
from evolutionary_illusion_generator_tpu.ops.flow import FlowConfig
from evolutionary_illusion_generator_tpu.structure import StructureType


def test_quantize_roundtrip_within_step():
    params = init_params(jax.random.PRNGKey(0), (1, 16, 32, 64))
    qp = quantize_params_int8(params)
    for layer, qlayer in zip(params, qp):
        for k, v in layer.items():
            if k.endswith("_w") and v.ndim == 4:
                assert qlayer[k].dtype == jnp.int8
                s = np.asarray(qlayer[k + "_s"])  # (Cout,)
                deq = np.asarray(qlayer[k], np.float32) * s
                err = np.abs(deq - np.asarray(v, np.float32))
                # round() error is at most half the per-channel step
                assert np.all(err <= 0.5 * s + 1e-7), (k, err.max())
            else:
                assert qlayer[k].dtype == layer[k].dtype


def test_int8_rollout_tracks_float():
    params = load_or_init(None, (1, 16, 32, 64))
    qp = quantize_params_int8(params)
    key = jax.random.PRNGKey(1)
    # smooth test images (band-limited noise) in [0, 1]
    imgs = jax.image.resize(
        jax.random.uniform(key, (2, 12, 16, 1)), (2, 48, 64, 1), "linear"
    )
    f0, f1 = rollout_flow_frames(
        params, imgs, repeat=6, extension=2, pair="population",
        compute_dtype=jnp.bfloat16,
    )
    q0, q1 = rollout_flow_frames(
        qp, imgs, repeat=6, extension=2, pair="population",
        compute_dtype=jnp.bfloat16,
    )
    for a, b in ((f0, q0), (f1, q1)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b))
        # quantization noise stays small relative to the prediction range
        assert np.mean(np.abs(a - b)) < 0.05, np.mean(np.abs(a - b))
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.95


def test_int8_batch_composition_independence():
    """A sample's quantized rollout must not depend on its batch peers.

    The activation scales in ``_conv_q`` are per batch row; a per-tensor
    scale would couple genomes through one outlier's activations and break
    the chunking/sharding parity invariants (evaluator chunks are batch
    rows).  Rolling a sample alone must bit-match rolling it next to a
    high-amplitude neighbour."""
    params = load_or_init(None, (1, 16, 32, 64))
    qp = quantize_params_int8(params)
    key = jax.random.PRNGKey(2)
    base = jax.image.resize(
        jax.random.uniform(key, (1, 12, 16, 1)), (1, 48, 64, 1), "linear"
    )
    loud = jnp.concatenate([base, jnp.ones_like(base)], axis=0)
    a0, a1 = rollout_flow_frames(
        qp, base, repeat=6, extension=2, pair="population",
        compute_dtype=jnp.bfloat16,
    )
    b0, b1 = rollout_flow_frames(
        qp, loud, repeat=6, extension=2, pair="population",
        compute_dtype=jnp.bfloat16,
    )
    np.testing.assert_array_equal(np.asarray(a0[0]), np.asarray(b0[0]))
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(b1[0]))


def test_int8_evaluator_smoke():
    """EvalConfig.prednet_int8 quantizes at construction and evaluates."""
    neat_cfg = preset("circles").replace(num_hidden=4)
    params = init_params(jax.random.PRNGKey(0), (3, 4, 8))
    cfg = EvalConfig(
        structure=StructureType.Circles,
        w=48,
        h=40,
        c_dim=3,
        flow=FlowConfig(max_corners=16, win=9, levels=2, iters=4),
        repeat=4,
        prednet_int8=True,
        program_cache=False,
    )
    ev = GenerationEvaluator(cfg, params, neat_cfg)
    assert ev.params[0]["lstm_w"].dtype == jnp.int8
    rng = Random(0)
    genomes = [Genome.new(i, neat_cfg, rng) for i in range(4)]
    scores = np.asarray(ev([(g.key, g) for g in genomes]))
    assert scores.shape == (4,)
    assert np.all(np.isfinite(scores))

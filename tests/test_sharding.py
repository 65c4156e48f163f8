"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
from random import Random

import jax
import jax.numpy as jnp
import optax

from evolutionary_illusion_generator_tpu.evolution.evaluator import (
    EvalConfig,
    GenerationEvaluator,
)
from evolutionary_illusion_generator_tpu.models.prednet import init_params
from evolutionary_illusion_generator_tpu.models.prednet.train import (
    init_opt_state,
    make_train_step,
    prednet_loss,
)
from evolutionary_illusion_generator_tpu.neat import Genome, preset
from evolutionary_illusion_generator_tpu.ops.flow import FlowConfig
from evolutionary_illusion_generator_tpu.parallel import (
    ShardedGenerationEvaluator,
    make_mesh,
)
from evolutionary_illusion_generator_tpu.structure import StructureType

W, H = 48, 40
CHANNELS = (1, 4, 8)
TINY_FLOW = FlowConfig(max_corners=32, win=9, levels=2, iters=6)


def make_genomes(n, cfg, seed=0):
    rng = Random(seed)
    gs = [Genome.new(i, cfg, rng) for i in range(n)]
    for g in gs:
        g.mutate(cfg, rng)
    return gs


@pytest.fixture(scope="module")
def neat_cfg():
    return preset("circles_bw").replace(num_hidden=4)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CHANNELS)


def eval_cfg():
    return EvalConfig(
        structure=StructureType.Circles,
        w=W,
        h=H,
        c_dim=1,
        gradient=0,
        flow=TINY_FLOW,
        use_pallas=False,
    )


class TestShardedEvaluator:
    def test_matches_unsharded(self, neat_cfg, params):
        assert len(jax.devices()) == 8
        mesh = make_mesh(8)
        genomes = make_genomes(16, neat_cfg)

        single = GenerationEvaluator(eval_cfg(), params, neat_cfg)
        sharded = ShardedGenerationEvaluator(eval_cfg(), params, neat_cfg, mesh)

        out_s = single.evaluate_images(genomes).to_numpy()
        out_m = sharded.evaluate_images(genomes).to_numpy()
        np.testing.assert_array_equal(out_s["images_u8"], out_m["images_u8"])
        np.testing.assert_array_equal(out_s["mask"], out_m["mask"])
        np.testing.assert_allclose(
            out_s["vectors"], out_m["vectors"], rtol=1e-4, atol=1e-4
        )

    def test_fitness_assignment(self, neat_cfg, params):
        mesh = make_mesh(4)
        genomes = make_genomes(8, neat_cfg, seed=3)
        ev = ShardedGenerationEvaluator(eval_cfg(), params, neat_cfg, mesh)
        ev([(g.key, g) for g in genomes])
        assert all(g.fitness is not None for g in genomes)


class TestShardedTraining:
    def test_data_parallel_step_runs(self, params):
        mesh = make_mesh(8)
        tx = optax.adam(1e-4)
        step = make_train_step(tx, mesh=mesh)
        opt_state = init_opt_state(tx, params)
        frames = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (8, 3, H, W, CHANNELS[0])),
            jnp.float32,
        )
        new_params, opt_state, loss = step(params, opt_state, frames)
        assert np.isfinite(float(loss))
        # params actually changed
        delta = float(
            jnp.abs(
                new_params[0]["lstm_w"].astype(jnp.float32)
                - params[0]["lstm_w"].astype(jnp.float32)
            ).max()
        )
        assert delta > 0

    def test_dp_matches_single_device_loss(self, params):
        frames = jnp.asarray(
            np.random.default_rng(1).uniform(0, 1, (8, 3, H, W, CHANNELS[0])),
            jnp.float32,
        )
        loss_single = float(prednet_loss(params, frames))
        mesh = make_mesh(8)
        tx = optax.sgd(0.0)
        step = make_train_step(tx, mesh=mesh)
        _, _, loss_dp = step(params, init_opt_state(tx, params), frames)
        assert abs(loss_single - float(loss_dp)) < 1e-4


def test_s2d_sharded_matches_unsharded(neat_cfg, params):
    """The s2d pixel layer (the TPU production default) shards over the
    pop axis identically to the dense layout — batch is untouched by the
    phase packing."""
    from dataclasses import replace

    mesh = make_mesh(8)
    genomes = make_genomes(16, neat_cfg)
    cfg = replace(eval_cfg(), s2d_l0=True)
    single = GenerationEvaluator(cfg, params, neat_cfg)
    sharded = ShardedGenerationEvaluator(cfg, params, neat_cfg, mesh)
    out_s = single.evaluate_images(genomes).to_numpy()
    out_m = sharded.evaluate_images(genomes).to_numpy()
    np.testing.assert_array_equal(out_s["images_u8"], out_m["images_u8"])
    np.testing.assert_allclose(
        out_s["vectors"], out_m["vectors"], rtol=1e-4, atol=1e-4
    )

"""CPPN compiler/evaluator tests: compiled device eval must match a direct
recursive host evaluation of the genome graph."""

import math

import numpy as np
import pytest
from random import Random

import jax.numpy as jnp

from evolutionary_illusion_generator_tpu.models.cppn import (
    compile_genome,
    evaluate_cppn,
    evaluate_population,
    pack_population,
    required_nodes,
)
from evolutionary_illusion_generator_tpu.neat import Genome, preset
from evolutionary_illusion_generator_tpu.ops.render import render_images


# -- host oracle: recursive evaluation with neat-python activation scalings --

def _act(name, z):
    if name == "sin":
        return np.sin(np.clip(5.0 * z, -60, 60))
    if name == "sigmoid":
        return 1.0 / (1.0 + np.exp(-np.clip(5.0 * z, -60, 60)))
    if name == "tanh":
        return np.tanh(np.clip(2.5 * z, -60, 60))
    if name == "gauss":
        return np.exp(-5.0 * np.clip(z, -3.4, 3.4) ** 2)
    if name == "relu":
        return np.maximum(z, 0.0)
    if name == "abs":
        return np.abs(z)
    raise ValueError(name)


def eval_genome_oracle(genome, cfg, inputs):
    """inputs: (num_inputs, P). Returns (num_outputs, P)."""
    memo = {}
    for idx, ik in enumerate(cfg.input_keys):
        memo[ik] = inputs[idx]

    req = required_nodes(genome, cfg)

    def value(n):
        if n in memo:
            return memo[n]
        total = np.zeros(inputs.shape[1])
        for (i, o), conn in genome.connections.items():
            if o == n and conn.enabled and (i < 0 or i in req):
                total = total + conn.weight * value(i)
        node = genome.nodes[n]
        memo[n] = _act(node.activation, node.response * total + node.bias)
        return memo[n]

    return np.stack([value(o) for o in cfg.output_keys])


@pytest.fixture
def rng():
    return Random(7)


class TestCompile:
    def test_required_nodes_includes_outputs(self, rng):
        cfg = preset("circles")
        g = Genome.new(1, cfg, rng)
        req = required_nodes(g, cfg)
        assert set(cfg.output_keys) <= req

    def test_compiled_matches_oracle(self, rng):
        cfg = preset("circles")
        P = 64
        inputs = np.random.default_rng(0).uniform(-10, 10, (2, P))
        for trial in range(5):
            g = Genome.new(trial, cfg, rng)
            for _ in range(20):
                g.mutate(cfg, rng)
            want = eval_genome_oracle(g, cfg, inputs)
            prog = compile_genome(g, cfg, max_nodes=128)
            got = np.asarray(
                evaluate_cppn(
                    jnp.asarray(prog.weights),
                    jnp.asarray(prog.bias),
                    jnp.asarray(prog.response),
                    jnp.asarray(prog.act_id),
                    jnp.asarray(prog.out_slot),
                    jnp.asarray(inputs, dtype=jnp.float32),
                )
            )
            np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)

    def test_pack_population_batches(self, rng):
        cfg = preset("circles_bw")
        genomes = [Genome.new(i, cfg, rng) for i in range(4)]
        for g in genomes:
            g.mutate(cfg, rng)
        packed = pack_population(genomes, cfg)
        P = 32
        inputs = jnp.asarray(
            np.random.default_rng(1).uniform(-1, 1, (2, P)), dtype=jnp.float32
        )
        out = evaluate_population(
            jnp.asarray(packed["weights"]),
            jnp.asarray(packed["bias"]),
            jnp.asarray(packed["response"]),
            jnp.asarray(packed["act_id"]),
            jnp.asarray(packed["out_slot"]),
            inputs,
        )
        assert out.shape == (4, 1, P)
        for i, g in enumerate(genomes):
            want = eval_genome_oracle(g, cfg, np.asarray(inputs))
            np.testing.assert_allclose(np.asarray(out[i]), want, rtol=2e-3, atol=1e-4)


class TestRender:
    def test_color_gradient_masking(self):
        pop, h, w = 2, 4, 6
        outputs = jnp.full((pop, 3, h * w), 0.5)
        x_mat = np.zeros((h, w))
        x_mat[0, 0] = -1.0
        img = render_images(outputs, jnp.asarray(x_mat), c_dim=3, bg=1, gradient=1)
        assert img.shape == (pop, h, w, 3)
        assert img.dtype == jnp.uint8
        assert np.all(np.asarray(img)[:, 0, 0] == 255)  # white background
        assert np.all(np.asarray(img)[:, 1, 1] == int(0.5 * 255))  # truncation

    def test_color_quantized_palette(self):
        pop, h, w = 1, 1, 5
        # v*4 -> 0,1,2,3,4 -> white, R, G, B, black
        vals = jnp.asarray([[[0.1, 0.3, 0.6, 0.8, 1.0]]])
        img = np.asarray(
            render_images(vals, jnp.zeros((h, w)), c_dim=3, bg=1, gradient=0)
        )[0, 0]
        np.testing.assert_array_equal(img[0], [255, 255, 255])
        np.testing.assert_array_equal(img[1], [255, 0, 0])
        np.testing.assert_array_equal(img[2], [0, 255, 0])
        np.testing.assert_array_equal(img[3], [0, 0, 255])
        np.testing.assert_array_equal(img[4], [0, 0, 0])

    def test_grayscale_rounding(self):
        vals = jnp.asarray([[[0.2, 0.6]]])
        img = np.asarray(
            render_images(vals, jnp.zeros((1, 2)), c_dim=1, bg=0, gradient=0)
        )
        assert img.shape == (1, 1, 2, 1)
        np.testing.assert_array_equal(img[0, 0, :, 0], [0, 255])
        img = np.asarray(
            render_images(vals, jnp.zeros((1, 2)), c_dim=1, bg=0, gradient=1)
        )
        np.testing.assert_array_equal(img[0, 0, :, 0], [51, 153])


class TestLevelBlocked:
    """Level-packed evaluation must equal the slot-serial path and oracle."""

    def test_matches_oracle_and_serial(self, rng):
        from evolutionary_illusion_generator_tpu.models.cppn import (
            evaluate_population_levels,
            pack_population,
            pack_population_levels,
        )

        cfg = preset("circles")
        P = 48
        inputs = np.random.default_rng(2).uniform(-10, 10, (2, P))
        genomes = []
        for t in range(4):
            g = Genome.new(t, cfg, rng)
            for _ in range(30):
                g.mutate(cfg, rng)
            genomes.append(g)

        lv = {k: jnp.asarray(v) for k, v in
              pack_population_levels(genomes, cfg).items()}
        out_lv = np.asarray(
            evaluate_population_levels(
                lv["weights"], lv["bias"], lv["response"], lv["act_id"],
                lv["out_slot"], jnp.asarray(inputs, jnp.float32),
            )
        )
        for i, g in enumerate(genomes):
            want = eval_genome_oracle(g, cfg, inputs)
            np.testing.assert_allclose(out_lv[i], want, rtol=2e-3, atol=1e-4)

    def test_pruned_act_set_is_bit_identical(self, rng):
        """Evaluation with the population's pruned activation set must equal
        the full-stack evaluation exactly (unchanged rankings guarantee,
        VERDICT round-1 item 5)."""
        from evolutionary_illusion_generator_tpu.models.cppn import (
            evaluate_population_levels,
            make_population_eval,
            pack_population_levels,
            population_act_set,
        )

        cfg = preset("circles")
        P = 48
        inputs = jnp.asarray(
            np.random.default_rng(3).uniform(-10, 10, (2, P)), jnp.float32
        )
        genomes = []
        for t in range(4):
            g = Genome.new(t, cfg, rng)
            for _ in range(20):
                g.mutate(cfg, rng)
            genomes.append(g)

        act_set = tuple(sorted(population_act_set(genomes, cfg)))
        assert 0 < len(act_set) <= 7

        full = {k: jnp.asarray(v) for k, v in
                pack_population_levels(genomes, cfg).items()}
        want = np.asarray(
            evaluate_population_levels(
                full["weights"], full["bias"], full["response"],
                full["act_id"], full["out_slot"], inputs,
            )
        )
        pruned = {k: jnp.asarray(v) for k, v in
                  pack_population_levels(genomes, cfg, act_set=act_set).items()}
        got = np.asarray(
            make_population_eval(act_set)(
                pruned["weights"], pruned["bias"], pruned["response"],
                pruned["act_id"], pruned["out_slot"], inputs,
            )
        )
        np.testing.assert_array_equal(got, want)

    def test_act_set_must_cover_population(self, rng):
        from evolutionary_illusion_generator_tpu.models.cppn import (
            pack_population_levels,
            population_act_set,
        )

        cfg = preset("circles")
        g = Genome.new(0, cfg, rng)
        used = sorted(population_act_set([g], cfg))
        missing = [i for i in range(7) if i not in used][:1]
        with pytest.raises(ValueError, match="does not cover"):
            pack_population_levels([g], cfg, act_set=tuple(missing))

    def test_evaluator_act_set_grows_only(self, rng):
        from evolutionary_illusion_generator_tpu.evolution.evaluator import (
            EvalConfig,
            GenerationEvaluator,
        )
        from evolutionary_illusion_generator_tpu.models.prednet import (
            init_params,
        )
        from evolutionary_illusion_generator_tpu.ops.flow import FlowConfig
        import jax

        cfg = preset("circles_bw")
        ev = GenerationEvaluator(
            EvalConfig(
                w=32, h=24, c_dim=1, repeat=2,
                flow=FlowConfig(max_corners=8, win=9, levels=1, iters=2),
            ),
            init_params(jax.random.PRNGKey(0), (1, 4)),
            cfg,
        )
        g1 = Genome.new(0, cfg, rng)
        ev.evaluate_images([g1])
        first = ev._act_set
        assert first  # population mode: non-empty after first call
        for _ in range(40):
            g1.mutate(cfg, rng)
        g2 = Genome.new(1, cfg, rng)
        for _ in range(40):
            g2.mutate(cfg, rng)
        ev.evaluate_images([g1, g2])
        assert set(first) <= set(ev._act_set)

    def test_bucket_growth_on_deep_genome(self, rng):
        from evolutionary_illusion_generator_tpu.models.cppn import (
            genome_depth,
            pack_population_levels,
        )

        cfg = preset("circles")
        g = Genome.new(0, cfg, rng)
        # force a deep chain with add_node splits
        for _ in range(80):
            g.mutate_add_node(cfg, rng)
        depth = genome_depth(g, cfg)
        packed = pack_population_levels([g], cfg, levels=2, width=4)
        L = packed["weights"].shape[1]
        assert L >= depth or packed["weights"].shape[2] * L >= depth

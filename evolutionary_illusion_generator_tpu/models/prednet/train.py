"""PredNet training (predictive-coding objective).

The reference consumes a FROZEN predictor trained elsewhere (Watanabe's
FPSI-video training, Readme.md:13; the .model files are external downloads).
This module closes that gap: the standard PredNet objective — time- and
layer-weighted mean absolute E-unit activity (Lotter et al. 2017) — with an
optax optimizer and a data-parallel (batch-sharded) train step, so stand-in
predictors can be trained on any frame-sequence corpus, multi-chip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from .model import PredNetParams, init_state, prednet_step

__all__ = ["prednet_loss", "make_train_step", "init_opt_state"]


def prednet_loss(
    params: PredNetParams,
    frames,  # (B, T, H, W, C0) in [0, 1]
    *,
    layer_weights: Optional[Sequence[float]] = None,
    skip_first: bool = True,
):
    """Mean weighted E-unit activity over a frame sequence.

    ``layer_weights`` defaults to Lotter's [1, 0.1, 0.1, ...]; the first
    timestep is excluded (zero-state prediction is uninformative).
    """
    B, T, H, W, C0 = frames.shape
    channels = [p["ahat_w"].shape[2] for p in params]
    L = len(channels)
    if layer_weights is None:
        layer_weights = [1.0] + [0.1] * (L - 1)
    lw = jnp.asarray(layer_weights, jnp.float32)

    state0 = init_state(B, H, W, channels, dtype=params[0]["lstm_w"].dtype)

    def step(state, frame):
        state, _ = prednet_step(params, state, frame)
        errs = jnp.stack(
            [jnp.mean(state[l]["e"].astype(jnp.float32)) for l in range(L)]
        )
        return state, jnp.sum(errs * lw)

    frames_t = jnp.moveaxis(frames, 0, 1)  # (T, B, H, W, C0)
    _, losses = jax.lax.scan(step, state0, frames_t)
    start = 1 if skip_first else 0
    return jnp.mean(losses[start:])


def init_opt_state(tx: optax.GradientTransformation, params: PredNetParams):
    """Optimizer state over the f32 master copy of ``params``."""
    params32 = jax.tree.map(lambda p: p.astype(jnp.float32), params)
    return tx.init(params32)


def make_train_step(
    tx: optax.GradientTransformation,
    *,
    mesh=None,
):
    """Build a jitted train step: (params, opt_state, frames) -> updated.

    With ``mesh`` given, the batch axis of ``frames`` is sharded over the
    mesh and params/opt state are replicated — the gradient all-reduce rides
    ICI via XLA's SPMD partitioner (no hand-written collectives).
    """

    def train_step(params, opt_state, frames):
        # master weights in f32 (bf16 is the inference dtype; JAX's conv
        # transpose rule requires uniform dtypes on the backward pass)
        params32 = jax.tree.map(lambda p: p.astype(jnp.float32), params)
        loss, grads = jax.value_and_grad(prednet_loss)(params32, frames)
        updates, opt_state = tx.update(grads, opt_state, params32)
        params32 = optax.apply_updates(params32, updates)
        params = jax.tree.map(
            lambda new, old: new.astype(old.dtype), params32, params
        )
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(train_step)

    from ...parallel.mesh import population_sharding, replicated_sharding

    rep = replicated_sharding(mesh)
    batch = population_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, rep, batch),
        out_shardings=(rep, rep, rep),
    )

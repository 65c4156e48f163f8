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

__all__ = [
    "prednet_loss",
    "prednet_seq_loss",
    "make_train_step",
    "init_opt_state",
]


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


def _spatial_grads(x):
    """Finite-difference spatial gradients of (B, H, W, C) images."""
    gy = x[:, 1:, :, :] - x[:, :-1, :, :]
    gx = x[:, :, 1:, :] - x[:, :, :-1, :]
    return gy, gx


def prednet_seq_loss(
    params: PredNetParams,
    frames,  # (B, T, H, W, C0) in [0, 1]
    *,
    t_open: int,
    closed_weight: float = 5.0,
    edge_weight: float = 0.0,
    layer_weights: Optional[Sequence[float]] = None,
    closed_mask=None,  # (B,) per-sequence closed-term weights (None = 1s)
    motion_weight: float = 0.0,
    motion_mask=None,  # (B,) weights for the closed motion-energy hinge
    open_mask=None,  # (B, t_open) per-frame open-loop loss weights
    cue_motion_weight: float = 0.0,
    cue_motion_mask=None,  # (B,) weights for the PIXELWISE cue hinge
):
    """Open-loop E-loss + CLOSED-LOOP pixel supervision on the tail frames.

    The fitness probe runs the predictor ``repeat`` open-loop steps then 2
    CLOSED-loop extension steps and reads flow off the extension frame
    (fitness_calculator.py:487-498) — a regime the plain Lotter E-objective
    never supervises.  This loss trains it directly: frames[:, :t_open] run
    open loop (weighted E-activity, as :func:`prednet_loss`), then the
    model's own prediction is fed back for the remaining T - t_open steps
    and each closed-loop prediction pays an L1 pixel loss against the true
    continuation frame (optionally plus an L1 loss on spatial finite
    differences, sharpening the ramp edges the LK tracker locks onto).

    The closed-loop term is what lets onset curricula work: with the plain
    E-objective an onset hedge is ~1e-4 of the loss and converges away
    (measured, round 2); here the "static sawtooth history -> slow coherent
    drift" continuation carries its own ``closed_weight``-scaled term.

    ``closed_mask`` weights the closed-loop term PER SEQUENCE (normalized
    by the mask sum).  Rationale (measured, round 3): closed-loop L1 on
    fast-moving symmetric rings is minimized by blur, which collapses the
    predicted drift on control-like inputs to ~0 px and breaks the
    published control-zero (v5a/v5b probes: control 0.237-0.239 with
    m|d| ~= 0.04).  Masking rings out keeps them open-loop only — always
    moving, so static ring history stays OOD and drifts fast — while cue
    regimes keep the coherence-building closed supervision.

    ``motion_weight``/``motion_mask`` add a closed-loop MOTION-ENERGY
    hinge on the masked sequences: per closed step, penalize the predicted
    temporal change falling below the target's
    (``relu(mean|Δtarget| - mean|Δpred|)``).  Rationale (measured v5c):
    even with rings excluded from the closed L1, closed supervision on
    cues alone makes the closed-loop dynamics globally contractive and
    ring drift still collapses (control 0.245).  Blur/static predictions
    CANNOT satisfy this hinge — it directly supervises "rings keep moving
    in closed loop" without requiring phase accuracy.

    ``cue_motion_weight``/``cue_motion_mask`` add a PIXELWISE closed-loop
    amplitude hinge on the masked (cue) sequences: per closed step and per
    pixel, penalize ``relu(|Δtarget| - |Δpred|)`` — the predicted temporal
    change may not fall below the target's anywhere in the frame.
    Rationale (measured, BENCH_NOTES round 4 "cached-vector anatomy"): the
    rated circles scores are capped by a spatially-LOCALIZED weak response
    (|d| 0.03-0.10 px in the fine-scale centre band) while the coarse
    regions respond at full trained magnitude; a per-sequence-mean hinge
    (``motion_weight``) is satisfied by the strong outer response, so the
    weak regions pay nothing.  The pixelwise form makes exactly the
    under-responding pixels carry loss.  Unlike the ring hinge this one
    coexists with the closed L1 on the same sequences — the L1 anchors the
    prediction to the coherent continuation, so the hinge cannot be
    satisfied by incoherent flicker (the v5d ring-hinge failure mode).

    ``open_mask`` (B, t_open) weights the OPEN-loop E-term per sequence
    and frame.  Rationale (measured v5e): an onset curriculum on ring
    sequences necessarily contains static-prefix frames whose E-loss
    supervises "static ring history -> stay static" — the exact copy
    gradient that collapses the control drift.  Masking the prefix out
    leaves rings graded only where the truth is fast motion, so the
    static-history prediction for ring appearance is trained toward
    drift, never toward copy.
    """
    B, T, H, W, C0 = frames.shape
    channels = [p["ahat_w"].shape[2] for p in params]
    L = len(channels)
    if layer_weights is None:
        layer_weights = [1.0] + [0.1] * (L - 1)
    lw = jnp.asarray(layer_weights, jnp.float32)

    state0 = init_state(B, H, W, channels, dtype=params[0]["lstm_w"].dtype)

    def step_open(carry, frame):
        state, _ = carry
        state, pred = prednet_step(params, state, frame)
        errs = jnp.stack(
            [jnp.mean(state[l]["e"].astype(jnp.float32), axis=(1, 2, 3))
             for l in range(L)]
        )  # (L, B)
        return (state, pred), jnp.sum(errs * lw[:, None], axis=0)

    frames_t = jnp.moveaxis(frames, 0, 1)  # (T, B, H, W, C0)
    (state, pred), open_losses = jax.lax.scan(
        step_open, (state0, jnp.zeros((B, H, W, C0), jnp.float32)),
        frames_t[:t_open],
    )  # open_losses: (t_open, B)
    if open_mask is None:
        open_loss = jnp.mean(open_losses[1:])  # skip the zero-state step
    else:
        om = jnp.moveaxis(open_mask.astype(jnp.float32), 0, 1)  # (t_open, B)
        om = om.at[0].set(0.0)  # zero-state step never graded
        open_loss = jnp.sum(open_losses * om) / jnp.maximum(om.sum(), 1e-6)

    if closed_mask is None:
        wseq = jnp.ones((B,), jnp.float32) / B
    else:
        m = closed_mask.astype(jnp.float32)
        wseq = m / jnp.maximum(m.sum(), 1e-6)

    def _wmean(x):  # (B, ...) -> masked scalar mean over sequences
        per_seq = jnp.mean(x, axis=tuple(range(1, x.ndim)))
        return jnp.sum(per_seq * wseq)

    if motion_weight > 0.0:
        mm = (jnp.ones((B,), jnp.float32) if motion_mask is None
              else motion_mask.astype(jnp.float32))
        wmot = mm / jnp.maximum(mm.sum(), 1e-6)
    if cue_motion_weight > 0.0:
        cm = (jnp.ones((B,), jnp.float32) if cue_motion_mask is None
              else cue_motion_mask.astype(jnp.float32))
        wcue = cm / jnp.maximum(cm.sum(), 1e-6)

    def _seq_mean(x):  # (B, ...) -> (B,)
        return jnp.mean(x, axis=tuple(range(1, x.ndim)))

    closed = 0.0
    motion = 0.0
    cue_motion = 0.0
    prev_pred = pred
    prev_target = frames_t[t_open - 1].astype(jnp.float32)
    for t in range(t_open, T):
        state, pred = prednet_step(params, state, pred)
        target = frames_t[t].astype(jnp.float32)
        closed = closed + _wmean(jnp.abs(pred - target))
        if edge_weight > 0.0:
            py, px = _spatial_grads(pred)
            ty, tx_ = _spatial_grads(target)
            closed = closed + edge_weight * (
                _wmean(jnp.abs(py - ty)) + _wmean(jnp.abs(px - tx_))
            )
        if motion_weight > 0.0:
            dt_target = _seq_mean(jnp.abs(target - prev_target))
            dt_pred = _seq_mean(jnp.abs(pred - prev_pred))
            motion = motion + jnp.sum(
                jax.nn.relu(dt_target - dt_pred) * wmot
            )
        if cue_motion_weight > 0.0:
            # pixelwise hinge: relu BEFORE any spatial averaging, so the
            # strong outer response cannot pay for the weak centre band
            gap = jax.nn.relu(
                jnp.abs(target - prev_target) - jnp.abs(pred - prev_pred)
            )
            cue_motion = cue_motion + jnp.sum(_seq_mean(gap) * wcue)
        prev_pred, prev_target = pred, target
    n_closed = max(T - t_open, 1)
    closed = closed / n_closed
    loss = open_loss + closed_weight * closed
    if motion_weight > 0.0:
        loss = loss + motion_weight * motion / n_closed
    if cue_motion_weight > 0.0:
        loss = loss + cue_motion_weight * cue_motion / n_closed
    return loss


def init_opt_state(tx: optax.GradientTransformation, params: PredNetParams):
    """Optimizer state over the f32 master copy of ``params``."""
    params32 = jax.tree.map(lambda p: p.astype(jnp.float32), params)
    return tx.init(params32)


def make_train_step(
    tx: optax.GradientTransformation,
    *,
    mesh=None,
    t_open: Optional[int] = None,
    closed_weight: float = 0.0,
    edge_weight: float = 0.0,
    masked_closed: bool = False,
    motion_weight: float = 0.0,
    masked_open: bool = False,
    cue_motion_weight: float = 0.0,
):
    """Build a jitted train step: (params, opt_state, frames) -> updated.

    With ``mesh`` given, the batch axis of ``frames`` is sharded over the
    mesh and params/opt state are replicated — the gradient all-reduce rides
    ICI via XLA's SPMD partitioner (no hand-written collectives).

    With ``closed_weight > 0``, frames beyond ``t_open`` are supervised
    closed-loop via :func:`prednet_seq_loss` (the probe-regime objective);
    otherwise the plain open-loop E-objective is used.  ``masked_closed``
    adds a fourth step argument — a (B,) per-sequence weight on the
    closed-loop term (see :func:`prednet_seq_loss`).  With
    ``motion_weight > 0`` the COMPLEMENT of that mask gets the closed
    motion-energy hinge (the masked-out sequences — rings — must keep
    moving in closed loop instead of being merely unsupervised).
    ``masked_open`` adds a further (B, t_open) step argument weighting
    the open-loop E-term per frame (static-prefix exclusion; see
    :func:`prednet_seq_loss`).  ``cue_motion_weight > 0`` adds a FINAL
    (B,) step argument — the cue-regime indicator carrying the pixelwise
    closed-loop amplitude hinge (see :func:`prednet_seq_loss`).
    """
    if closed_weight > 0.0:
        if t_open is None:
            raise ValueError("closed_weight > 0 requires t_open")
        if motion_weight > 0.0 and not masked_closed:
            raise ValueError("motion_weight requires masked_closed")
        if cue_motion_weight > 0.0 and not masked_closed:
            raise ValueError("cue_motion_weight requires masked_closed")
        loss_fn = lambda p, f, m=None, om=None, cm=None: prednet_seq_loss(  # noqa: E731
            p, f, t_open=t_open, closed_weight=closed_weight,
            edge_weight=edge_weight, closed_mask=m,
            motion_weight=motion_weight,
            motion_mask=(None if m is None or motion_weight <= 0.0
                         else 1.0 - m),
            open_mask=om,
            cue_motion_weight=cue_motion_weight,
            cue_motion_mask=cm,
        )
    else:
        if masked_closed:
            raise ValueError("masked_closed requires closed_weight > 0")
        if masked_open:
            raise ValueError("masked_open requires closed_weight > 0")
        if cue_motion_weight > 0.0:
            raise ValueError("cue_motion_weight requires closed_weight > 0")
        loss_fn = prednet_loss

    def _update(params, opt_state, frames, mask, open_mask, cue_mask):
        # master weights in f32 (bf16 is the inference dtype; JAX's conv
        # transpose rule requires uniform dtypes on the backward pass)
        params32 = jax.tree.map(lambda p: p.astype(jnp.float32), params)
        if mask is None and open_mask is None and cue_mask is None:
            loss, grads = jax.value_and_grad(loss_fn)(params32, frames)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(
                params32, frames, mask, open_mask, cue_mask
            )
        updates, opt_state = tx.update(grads, opt_state, params32)
        params32 = optax.apply_updates(params32, updates)
        params = jax.tree.map(
            lambda new, old: new.astype(old.dtype), params32, params
        )
        return params, opt_state, loss

    has_cue = cue_motion_weight > 0.0
    if masked_open:
        if not masked_closed:
            raise ValueError("masked_open requires masked_closed")
        if has_cue:
            train_step = lambda p, o, f, m, om, cm: _update(p, o, f, m, om, cm)  # noqa: E731
        else:
            train_step = lambda p, o, f, m, om: _update(p, o, f, m, om, None)  # noqa: E731
    elif masked_closed:
        if has_cue:
            train_step = lambda p, o, f, m, cm: _update(p, o, f, m, None, cm)  # noqa: E731
        else:
            train_step = lambda p, o, f, m: _update(p, o, f, m, None, None)  # noqa: E731
    else:
        train_step = lambda p, o, f: _update(p, o, f, None, None, None)  # noqa: E731

    if mesh is None:
        return jax.jit(train_step)

    from ...parallel.mesh import population_sharding, replicated_sharding

    rep = replicated_sharding(mesh)
    batch = population_sharding(mesh)
    in_sh = (rep, rep, batch)
    if masked_closed:
        in_sh = in_sh + (batch,)
    if masked_open:
        in_sh = in_sh + (batch,)
    if has_cue:
        in_sh = in_sh + (batch,)
    return jax.jit(
        train_step,
        in_shardings=in_sh,
        out_shardings=(rep, rep, rep),
    )

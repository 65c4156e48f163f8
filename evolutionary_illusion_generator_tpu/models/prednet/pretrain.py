"""Predictor pretraining on synthetic motion.

Produces the stand-in for the reference's externally-trained .model files:
a PredNet with a motion prior, trained with the Lotter E-activity objective
on translating-texture sequences (see synthetic_data.py).  Bundled weights
under ``weights/`` are picked up automatically by ``load_or_init`` when no
model path is given.

    python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
        --channels 1,16,32,64 --steps 300 --out weights/...npz
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .loader import save_params
from .model import init_params
from .train import init_opt_state, make_train_step
from .synthetic_data import synthetic_cue_batch, synthetic_motion_batch

__all__ = ["pretrain", "main"]


def _ckpt_save(path, params, opt_state, key, step) -> None:
    """Atomic training checkpoint: params (f32, lossless from bf16), the
    exact optimizer-state leaves, and the RNG key AT an iteration boundary
    — enough for a bitwise-identical resume (the train step rebuilds its
    f32 master from the bf16 params every step, so no hidden state)."""
    flat = {"step": np.asarray(step), "key": np.asarray(jax.device_get(key))}
    for l, layer in enumerate(params):
        for name, arr in layer.items():
            flat[f"p/l{l}/{name}"] = np.asarray(
                jax.device_get(arr), np.float32
            )
    for i, leaf in enumerate(jax.tree.leaves(opt_state)):
        flat[f"o/{i}"] = np.asarray(jax.device_get(leaf))
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def _ckpt_load(path, params, opt_state):
    """Restore (params, opt_state, key, step) saved by :func:`_ckpt_save`.

    Raises (KeyError/ValueError) on any mismatch with the current model —
    callers treat that as "stale checkpoint, start fresh".
    """
    data = np.load(path)
    new_params = [
        {
            name: jnp.asarray(data[f"p/l{l}/{name}"], arr.dtype)
            for name, arr in layer.items()
        }
        for l, layer in enumerate(params)
    ]
    leaves, treedef = jax.tree.flatten(opt_state)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        stored = data[f"o/{i}"]
        if tuple(stored.shape) != tuple(jnp.shape(leaf)):
            raise ValueError(
                f"opt-state leaf {i} shape {stored.shape} != "
                f"{jnp.shape(leaf)}"
            )
        new_leaves.append(jnp.asarray(stored, leaf.dtype))
    key = jnp.asarray(data["key"])
    return new_params, jax.tree.unflatten(treedef, new_leaves), key, int(
        data["step"]
    )


def pretrain(
    channels: Sequence[int],
    *,
    steps: int = 300,
    batch: int = 8,
    T: int = 10,
    h: int = 120,
    w: int = 160,
    lr: float = 2e-3,
    seed: int = 0,
    mesh=None,
    log_every: int = 25,
    verbose: bool = True,
    max_speed: float = 1.0,
    static_fraction: float = 0.5,
    data: str = "v3",
    regime_probs=None,
    cue_speed_range=(0.5, 2.5),
    max_onset: int = 0,
    move_prob: float = 1.0,
    cue_slow_range=None,
    cue_slow_frac: float = 0.0,
    onset_hazard: float = 0.0,
    ring_speed_range=None,
    band_prob: float = 0.0,
    onset_range=None,
    closed_frames: int = 0,
    closed_weight: float = 0.0,
    edge_weight: float = 0.0,
    ring_onset: bool = False,
    closed_exclude_rings: bool = False,
    ring_motion_weight: float = 0.0,
    ring_dir_cue: bool = False,
    ring_onset_range=None,
    ring_mask_prefix: bool = False,
    ring_closed_scale: float = 1.0,
    cue_period_range=None,
    tang_radial: bool = False,
    tang_uniform: bool = False,
    cue_fine_speed_range=None,
    cue_fine_max_period: float = 12.0,
    ring_speed_cue: bool = False,
    cue_motion_weight: float = 0.0,
    checkpoint: Optional[str] = None,
    save_every: int = 0,
    init_weights: Optional[str] = None,
):
    """Train a PredNet on synthetic motion; returns (params, final_loss).

    ``data="v3"`` (default) trains on :func:`synthetic_cue_batch` — the
    appearance->motion cue mixture whose static regimes (smooth textures,
    plain rings) give the settling pressure and whose always-moving sawtooth
    regimes give the illusion-triggering drift prior.  ``data="v2"`` is the
    round-1 translating-texture set (``static_fraction`` of it static).
    """
    key = jax.random.PRNGKey(seed)
    params = init_params(key, channels)
    if init_weights:
        # warm-start from a save_params npz (sequential fine-tune: train
        # lever A to convergence, then dose lever B *in time* from A's
        # endpoint instead of jointly from scratch — the round-5 rescue
        # axis after joint hinge+anchor doses measured destructive).
        # Cast onto the freshly-initialized templates so training dtype
        # is identical to a cold start; optimizer state starts fresh.
        from .loader import load_params as _load_weights

        loaded = _load_weights(init_weights, dtype=jnp.float32)
        if len(loaded) != len(params):
            raise ValueError(
                f"--init_weights {init_weights}: {len(loaded)} layers, "
                f"expected {len(params)} for channels {channels}"
            )
        params = jax.tree_util.tree_map(
            lambda tmpl, new: jnp.asarray(new, tmpl.dtype), params, loaded
        )
    tx = optax.adam(lr)
    opt_state = init_opt_state(tx, params)
    # closed_frames > 0 extends each sequence by that many frames and
    # supervises them CLOSED-loop (prednet_seq_loss) — the probe regime.
    # closed_exclude_rings masks the closed term off the plain-ring regime
    # (regime 2): closed L1 on fast symmetric rings is minimized by blur,
    # which kills the fast-drift-on-rings control-zero mechanism (v5a/v5b
    # probes, weights/README.md).
    T_total = T + closed_frames
    if ring_motion_weight > 0.0:
        closed_exclude_rings = True  # the hinge replaces the ring L1
    # regime metadata (ids + onsets) is needed whenever any loss term is
    # regime- or onset-masked.  closed_exclude_rings masks rings out of the
    # closed L1; WITHOUT it (v5f) rings are closed-L1-supervised toward
    # their true fast continuation — sound only under ring_dir_cue, where
    # the duty cycle determines the drift direction and the L1 optimum for
    # a static ring history is the moving continuation, not blur.
    masked = bool(closed_frames) and (
        closed_exclude_rings or ring_mask_prefix or cue_motion_weight > 0.0
    )
    if masked and data != "v3":
        raise ValueError("regime-masked losses need the v3 regime data")
    # ring_mask_prefix excludes ring sequences' static-prefix frames from
    # the open-loop E-loss (see train.prednet_seq_loss): the onset
    # curriculum must not teach "copy static rings" while it teaches
    # "static ring history -> fast drift" on the post-onset frames.
    if ring_mask_prefix and not (
        closed_frames and (ring_onset_range or ring_onset)
    ):
        raise ValueError(
            "ring_mask_prefix needs closed_frames and a ring onset window"
        )
    if tang_radial and tang_uniform:
        raise ValueError(
            "tang_radial and tang_uniform both rewrite the wedge-ring "
            "class's motion — pick one"
        )
    step_fn = make_train_step(
        tx, mesh=mesh, t_open=T if closed_frames else None,
        closed_weight=closed_weight if closed_frames else 0.0,
        edge_weight=edge_weight, masked_closed=masked,
        motion_weight=ring_motion_weight,
        masked_open=ring_mask_prefix,
        cue_motion_weight=cue_motion_weight,
    )
    if data == "v3":
        kwargs = {"cue_speed_range": tuple(cue_speed_range),
                  "max_onset": max_onset, "move_prob": move_prob,
                  "ring_onset": ring_onset,
                  "ring_dir_cue": ring_dir_cue,
                  "tang_radial": tang_radial,
                  "tang_uniform": tang_uniform,
                  "ring_speed_cue": ring_speed_cue}
        if cue_fine_speed_range is not None:
            kwargs["cue_fine_speed_range"] = tuple(cue_fine_speed_range)
            kwargs["cue_fine_max_period"] = cue_fine_max_period
        if ring_onset_range is not None:
            kwargs["ring_onset_range"] = tuple(ring_onset_range)
        if cue_period_range is not None:
            kwargs["cue_period_range"] = tuple(cue_period_range)
        if onset_range is not None:
            kwargs["onset_range"] = tuple(onset_range)
        if cue_slow_range is not None:
            kwargs["cue_slow_range"] = tuple(cue_slow_range)
            kwargs["cue_slow_frac"] = cue_slow_frac
        if onset_hazard > 0.0:
            kwargs["onset_hazard"] = onset_hazard
        if ring_speed_range is not None:
            kwargs["ring_speed_range"] = tuple(ring_speed_range)
        if band_prob > 0.0:
            kwargs["band_prob"] = band_prob
        if regime_probs is not None:
            kwargs["regime_probs"] = tuple(regime_probs)
        data_fn = jax.jit(
            lambda k: synthetic_cue_batch(
                k, batch, T_total, h, w, channels[0], max_speed=max_speed,
                return_regime=masked, **kwargs
            )
        )
    elif data == "v2":
        data_fn = jax.jit(
            lambda k: synthetic_motion_batch(
                k, batch, T_total, h, w, channels[0],
                max_speed=max_speed, static_fraction=static_fraction,
            )
        )
    else:
        raise ValueError(f"unknown data set {data!r}")

    start = 0
    if checkpoint and os.path.exists(checkpoint):
        try:
            params, opt_state, key, start = _ckpt_load(
                checkpoint, params, opt_state
            )
            if verbose:
                print(f"[pretrain] resumed {checkpoint} at step {start}",
                      flush=True)
        except Exception as e:  # stale/mismatched checkpoint: start fresh
            if verbose:
                print(f"[pretrain] ignoring stale checkpoint ({e})",
                      flush=True)
            start = 0
    loss = None
    t0 = time.time()
    for i in range(start, steps):
        # checkpoint at the iteration boundary (key not yet split, so a
        # resumed run replays the identical data stream)
        if checkpoint and save_every and i > start and i % save_every == 0:
            _ckpt_save(checkpoint, params, opt_state, key, i)
        key, k = jax.random.split(key)
        if masked:
            frames, regimes, onsets = data_fn(k)
            cue_mask = (
                ((regimes >= 3) & (regimes <= 5)).astype(jnp.float32)
                if cue_motion_weight > 0.0 else None
            )
            if closed_exclude_rings:
                # rings open-loop only (their closed term is the hinge)
                mask = (regimes != 2).astype(jnp.float32)
            else:
                # v5f: rings closed-L1-supervised like the cues.
                # ring_closed_scale < 1 decouples the two closed terms
                # (v5h): the ring anti-contraction only needs the control
                # drift over the 0.3 px gate (v5f overshoots 4x at equal
                # weight, while its bleed into the cue dynamics quadruples
                # the in-gate drift noise and costs rotation symmetry).
                mask = jnp.where(
                    regimes == 2, ring_closed_scale, 1.0
                ).astype(jnp.float32)
            if ring_mask_prefix:
                t_idx = jnp.arange(T, dtype=jnp.float32)[None, :]
                prefix = (
                    (t_idx < onsets[:, None])
                    & (regimes == 2)[:, None]
                )
                open_mask = 1.0 - prefix.astype(jnp.float32)
                step_args = (params, opt_state, frames, mask, open_mask)
            else:
                step_args = (params, opt_state, frames, mask)
            if cue_mask is not None:
                step_args = step_args + (cue_mask,)
            params, opt_state, loss = step_fn(*step_args)
        else:
            frames = data_fn(k)
            params, opt_state, loss = step_fn(params, opt_state, frames)
        if verbose and (i % log_every == 0 or i == steps - 1):
            print(
                f"[pretrain] step {i:4d} loss {float(loss):.5f} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
    return params, (float(loss) if loss is not None else float("nan"))


def main(argv: Optional[list] = None) -> int:
    p = argparse.ArgumentParser(description="pretrain a stand-in predictor")
    p.add_argument("--channels", default="1,16,32,64")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--height", type=int, default=120)
    p.add_argument("--width", type=int, default=160)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data", default="v3", choices=("v2", "v3"))
    p.add_argument("--cue_speed", default="0.5,2.5",
                   help="min,max cue drift speed in px/frame (v3 data)")
    p.add_argument("--max_onset", type=int, default=0,
                   help="cue patterns hold static up to this many frames "
                        "before motion starts (v3 data)")
    p.add_argument("--move_prob", type=float, default=1.0,
                   help="fraction of sawtooth sequences that move; the "
                        "rest stay static — dials the predicted illusory "
                        "drift to p*speed (v3 data)")
    p.add_argument("--cue_slow", default="",
                   help="min,max of the slow cue-speed mode; with "
                        "--slow_frac makes the speed distribution bimodal "
                        "(v3 data)")
    p.add_argument("--slow_frac", type=float, default=0.0,
                   help="fraction of sawtooth sequences drawn from the "
                        "slow speed mode")
    p.add_argument("--onset_hazard", type=float, default=0.0,
                   help="per-frame geometric probability that a static "
                        "sawtooth starts moving; memoryless, so the "
                        "static-history drift prediction is p*E[speed] "
                        "at any history length (v3 data)")
    p.add_argument("--ring_speed", default="",
                   help="min,max radial speed for plain rings; makes the "
                        "control-like regime move fast in a random "
                        "direction instead of staying static (v4 data)")
    p.add_argument("--band_prob", type=float, default=0.0,
                   help="fraction of sawtooth sequences rendered as "
                        "banded wedge rings / spoke segments (the rated-"
                        "stimulus look) instead of dense ramps (v4 data)")
    p.add_argument("--onset_range", default="",
                   help="lo,hi integer window: sawtooth patterns hold "
                        "static for a uniform prefix in [lo,hi] frames, "
                        "then drift — pair with --closed_frames so the "
                        "window straddles the open/closed boundary (v5)")
    p.add_argument("--closed_frames", type=int, default=0,
                   help="supervise this many extra CLOSED-loop frames per "
                        "sequence (the probe regime; prednet_seq_loss)")
    p.add_argument("--closed_weight", type=float, default=5.0,
                   help="weight of the closed-loop L1 pixel term")
    p.add_argument("--edge_weight", type=float, default=0.0,
                   help="extra L1 on spatial finite differences of the "
                        "closed-loop predictions (ramp-edge sharpening)")
    p.add_argument("--ring_onset", action="store_true",
                   help="onset-gate the plain-ring regime's clock too "
                        "(v5b experiment; default: rings always move)")
    p.add_argument("--closed_exclude_rings", action="store_true",
                   help="mask the closed-loop loss off the plain-ring "
                        "regime (keeps the fast-drift control-zero "
                        "mechanism; see prednet_seq_loss)")
    p.add_argument("--ring_motion_weight", type=float, default=0.0,
                   help="closed-loop motion-energy hinge on ring "
                        "sequences: predicted temporal change must not "
                        "fall below the target's (anti-blur; implies "
                        "--closed_exclude_rings)")
    p.add_argument("--ring_dir_cue", action="store_true",
                   help="tie the ring drift direction to the ring duty "
                        "cycle (duty > 0.5 expands, < 0.5 contracts): "
                        "removes the direction ambiguity that makes blur "
                        "the optimal static-ring-history prediction (v5e)")
    p.add_argument("--ring_onset_range", default="",
                   help="lo,hi integer window: RING sequences hold static "
                        "for a uniform prefix then drift fast — their own "
                        "window, shorter than --onset_range, so the "
                        "post-onset frames are graded open-loop (v5e)")
    p.add_argument("--ring_mask_prefix", action="store_true",
                   help="exclude ring static-prefix frames from the "
                        "open-loop E-loss so the onset curriculum never "
                        "teaches 'copy static rings' (v5e; needs "
                        "--ring_onset_range and --closed_frames)")
    p.add_argument("--ring_closed_scale", type=float, default=1.0,
                   help="relative weight of ring sequences in the closed "
                        "L1 (v5h: decouple ring anti-contraction from cue "
                        "coherence; needs --ring_dir_cue and no "
                        "--closed_exclude_rings)")
    p.add_argument("--regime_probs", default="",
                   help="7 comma-separated regime probabilities "
                        "(texture-static, texture-moving, plain-rings, "
                        "linear-sawtooth, tangential, radial, disc-static)")
    p.add_argument("--cue_period", default="",
                   help="min,max sawtooth spatial period in px (default "
                        "12,40).  The rated stimuli's wedge structure is "
                        "radius-proportional down to ~4-8 px near the "
                        "centre; lowering the minimum puts those fine "
                        "scales in distribution (v6 fidelity series)")
    p.add_argument("--tang_radial", action="store_true",
                   help="wedge-ring (tangential) class keeps its angular-"
                        "asymmetric look but contracts radially instead of "
                        "rotating (v6d series).  Measured rationale: the "
                        "rated rotate stimuli alternate wedge chirality "
                        "per ring, so a faithful tangential response caps "
                        "rotation_symmetry_score at 0.5, while a uniform "
                        "radial response scores ~1.0 — the looming bias a "
                        "natural-video predictor actually has")
    p.add_argument("--tang_uniform", action="store_true",
                   help="wedge-ring (tangential) class rotates "
                        "differentially at a uniform px/frame across "
                        "radius instead of rigidly at constant omega "
                        "(whose inner rings move at omega*r — the "
                        "measured sub-noise inner-band tail capping the "
                        "rotate scores, BENCH_NOTES v6e).  Mutually "
                        "exclusive with --tang_radial")
    p.add_argument("--cue_speed_fine", default="",
                   help="min,max drift speed for FINE-period sawtooths "
                        "(period < --cue_fine_max_period): a separate, "
                        "faster band lifting the fine-scale response above "
                        "the ~0.1 px LK noise cap — the measured weak-tail "
                        "magnitude lever (v7 series; BENCH_NOTES round-4 "
                        "cached-vector anatomy)")
    p.add_argument("--cue_fine_max_period", type=float, default=12.0,
                   help="period threshold (px) below which --cue_speed_fine "
                        "applies")
    p.add_argument("--ring_speed_cue", action="store_true",
                   help="ring speed determined by the duty-cue magnitude "
                        "(|duty-0.5| maps linearly onto --ring_speed): the "
                        "whole ring continuation becomes a deterministic "
                        "function of appearance, so the L1-optimal static-"
                        "history prediction stays the fast-moving "
                        "continuation at ANY training budget — control-zero "
                        "as a trained property, not a stopping-time "
                        "artifact (v7 series; needs --ring_dir_cue)")
    p.add_argument("--cue_motion_weight", type=float, default=0.0,
                   help="pixelwise closed-loop amplitude hinge on cue "
                        "sequences: predicted temporal change may not fall "
                        "below the target's at ANY pixel — makes the "
                        "spatially-localized weak response (the rated "
                        "stimuli's sub-noise centre band) carry loss "
                        "(v7 series; needs --closed_frames)")
    p.add_argument("--save_every", type=int, default=2000,
                   help="write a resumable training checkpoint "
                        "(<out>.part.npz) every N steps; a restarted run "
                        "picks it up and replays bitwise-identically "
                        "(stall-watchdog restarts lose <=N steps). "
                        "0 disables")
    p.add_argument("--init_weights", default="",
                   help="warm-start params from a save_params npz "
                        "(sequential fine-tune; optimizer state fresh). "
                        "The data stream still follows --seed")
    p.add_argument("--out", default="")
    args = p.parse_args(argv)

    from ...utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    channels = [int(x) for x in args.channels.split(",")]
    out = args.out or f"prednet_{'_'.join(map(str, channels))}.npz"
    # recipe-keyed part file: a rerun with DIFFERENT flags but the same
    # --out must not resume the old recipe's checkpoint (shapes can match)
    import hashlib

    recipe = {k: v for k, v in sorted(vars(args).items())
              if k not in ("out", "save_every")}
    tag = hashlib.sha256(repr(recipe).encode()).hexdigest()[:10]
    ckpt = f"{out}.part-{tag}.npz" if args.save_every else None
    params, loss = pretrain(
        channels,
        steps=args.steps,
        batch=args.batch,
        T=args.frames,
        h=args.height,
        w=args.width,
        lr=args.lr,
        seed=args.seed,
        data=args.data,
        cue_speed_range=tuple(float(x) for x in args.cue_speed.split(",")),
        max_onset=args.max_onset,
        move_prob=args.move_prob,
        cue_slow_range=(tuple(float(x) for x in args.cue_slow.split(","))
                        if args.cue_slow else None),
        cue_slow_frac=args.slow_frac,
        onset_hazard=args.onset_hazard,
        ring_speed_range=(tuple(float(x) for x in args.ring_speed.split(","))
                          if args.ring_speed else None),
        regime_probs=(tuple(float(x) for x in args.regime_probs.split(","))
                      if args.regime_probs else None),
        band_prob=args.band_prob,
        onset_range=(tuple(int(x) for x in args.onset_range.split(","))
                     if args.onset_range else None),
        closed_frames=args.closed_frames,
        closed_weight=args.closed_weight,
        edge_weight=args.edge_weight,
        ring_onset=args.ring_onset,
        closed_exclude_rings=args.closed_exclude_rings,
        ring_motion_weight=args.ring_motion_weight,
        ring_dir_cue=args.ring_dir_cue,
        ring_onset_range=(
            tuple(int(x) for x in args.ring_onset_range.split(","))
            if args.ring_onset_range else None
        ),
        ring_mask_prefix=args.ring_mask_prefix,
        ring_closed_scale=args.ring_closed_scale,
        cue_period_range=(tuple(float(x) for x in args.cue_period.split(","))
                          if args.cue_period else None),
        tang_radial=args.tang_radial,
        tang_uniform=args.tang_uniform,
        cue_fine_speed_range=(
            tuple(float(x) for x in args.cue_speed_fine.split(","))
            if args.cue_speed_fine else None
        ),
        cue_fine_max_period=args.cue_fine_max_period,
        ring_speed_cue=args.ring_speed_cue,
        cue_motion_weight=args.cue_motion_weight,
        checkpoint=ckpt,
        save_every=args.save_every,
        init_weights=args.init_weights or None,
    )
    save_params(params, out)
    if ckpt and os.path.exists(ckpt):
        os.remove(ckpt)
    print(f"[pretrain] saved {out} (final loss {loss:.5f})")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

"""Pipeline-parallel PredNet rollout: one ConvLSTM layer per chip.

SURVEY §2.4's optional row.  The primary scale axis of this framework is
the population (mesh.py — embarrassingly SPMD, zero collectives), and the
spatial axis covers the big-frame configs (spatial.py); pipeline
parallelism is therefore NOT a production path here — it ships as the
minimal, correct implementation of the strategy so the capability exists
and its economics can be measured instead of asserted (see PARITY.md).

Design (tpu-first, not a port: the reference is strictly single-device,
generate_illusion.py:733 ``gpu=0``):

* mesh axis ``pp`` of size L: stage ``s`` holds layer ``s``'s weights and
  recurrent state (R, c, E) only — per-chip memory scales with ONE
  layer's state, the point of pipelining.
* PredNet's timestep is a top-down sweep (R updates, L-1..0) followed by
  a bottom-up sweep (Ahat/E errors, 0..L-1) — a "V" across stages per
  frame, so classic GPipe schedules don't apply.  Instead the population
  is split into M microbatches streamed through a SKEWED WAVEFRONT: at
  global tick k, stage s runs
      down(s, m, t)  at  k = 2*(t*M + m) + (L-1-s)
      up(s, m, t)    at  k = 2*(t*M + m) + L + s
  Adjacent ticks differ by one stage hop, so each boundary tensor moves
  exactly one ``ppermute`` step per tick: R one stage DOWN after a down
  half-step, pooled-A one stage UP after an up half-step.  Down and up
  ticks have opposite parity per stage, so every stage does exactly one
  half-step per tick in steady state; fill/drain bubbles are O(L) ticks
  of the 2*T*M total.  Correctness needs M >= L (the down(t) after up(t-1)
  gap), enforced.
* the whole schedule is ONE jitted program: ``lax.scan`` over ticks of a
  ``shard_map`` body — schedule arithmetic on ``axis_index``, layer
  dispatch via ``lax.switch`` (L static-shape branches), boundary hops
  via ``lax.ppermute``.  No host round-trips mid-rollout.
* SPMD needs one local shape across stages, but layer state shapes
  differ (H/2^l, C_l): states and messages are stored FLAT, padded to
  the largest layer's flat size; each switch branch slices/reshapes its
  layer's true extent.  Worst-case pad overhead at the color stack
  (3,48,96,192) is ~4x on the smallest stage — accepted for a minimal
  implementation (production memory scaling uses the population axis).

Measured conclusion (PARITY.md / ROADMAP.md): per-layer costs are
dominated by layer 0 at full resolution, the V-shaped dependency halves
steady-state concurrency vs data parallel, and the population axis is
embarrassingly parallel with zero collectives — population sharding
dominates at every BASELINE.json config, so this stays a flagged
capability, not a default.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.prednet.model import (
    PredNetParams,
    _conv,
    _conv_nobias,
    _lstm_gates_jnp,
    _maxpool2,
    _upsample2,
)

__all__ = ["make_pp_mesh", "pipelined_rollout_flow_frames"]

PP_AXIS = "pp"


def make_pp_mesh(n_stages: int, devices=None) -> Mesh:
    """1-D pipeline mesh: stage s = device s (adjacent stages on adjacent
    devices so boundary hops ride single ICI links)."""
    devs = list(devices if devices is not None else jax.devices())
    if len(devs) < n_stages:
        raise ValueError(f"need {n_stages} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_stages]), (PP_AXIS,))


def _stack_padded(params: PredNetParams, channels: Sequence[int]):
    """Stack per-layer weights into uniform (L, ...) arrays, zero-padded to
    the widest layer so shard_map can shard them P('pp') on the stage axis
    (each stage slices its true extents statically inside its branch)."""
    L = len(channels)
    maxC = max(channels)
    in_chs = [
        3 * channels[l] + (channels[l + 1] if l + 1 < L else 0)
        for l in range(L)
    ]
    max_in = max(in_chs)
    k = params[0]["lstm_w"].shape[0]
    dt = params[0]["lstm_w"].dtype

    lstm_w = np.zeros((L, k, k, max_in, 4 * maxC), dt)
    lstm_b = np.zeros((L, 4 * maxC), dt)
    ahat_w = np.zeros((L, k, k, maxC, maxC), dt)
    ahat_b = np.zeros((L, maxC), dt)
    a_w = np.zeros((L, k, k, 2 * maxC, maxC), dt)
    a_b = np.zeros((L, maxC), dt)
    for l, p in enumerate(params):
        C = channels[l]
        lstm_w[l, :, :, : in_chs[l], : 4 * C] = np.asarray(p["lstm_w"])
        lstm_b[l, : 4 * C] = np.asarray(p["lstm_b"])
        ahat_w[l, :, :, :C, :C] = np.asarray(p["ahat_w"])
        ahat_b[l, :C] = np.asarray(p["ahat_b"])
        if l + 1 < L:
            a_w[l, :, :, : 2 * C, : channels[l + 1]] = np.asarray(p["a_w"])
            a_b[l, : channels[l + 1]] = np.asarray(p["a_b"])
    return {
        "lstm_w": jnp.asarray(lstm_w),
        "lstm_b": jnp.asarray(lstm_b),
        "ahat_w": jnp.asarray(ahat_w),
        "ahat_b": jnp.asarray(ahat_b),
        "a_w": jnp.asarray(a_w),
        "a_b": jnp.asarray(a_b),
    }


def pipelined_rollout_flow_frames(
    params: PredNetParams,
    images,
    mesh: Mesh,
    *,
    repeat: int = 20,
    extension: int = 2,
    pair: str = "population",
    n_micro: Optional[int] = None,
    compute_dtype=jnp.float32,
):
    """Layer-pipelined equivalent of
    :func:`..models.prednet.model.rollout_flow_frames`.

    ``images``: (B, H, W, C0); ``mesh`` must have a ``pp`` axis of size
    L = len(params); ``n_micro`` microbatches (default = L, the minimum
    that fills the wavefront) must divide B.  Peephole/Pallas variants are
    out of scope for the minimal implementation.
    """
    if pair == "population":
        collect = (repeat - 1, repeat)
    elif pair == "probe":
        collect = (repeat + 1,)
    else:
        raise ValueError(f"unknown pair convention: {pair!r}")

    channels = [p["ahat_w"].shape[2] for p in params]
    L = len(channels)
    if any("w_ci" in p for p in params):
        raise NotImplementedError("peephole params: use the unpipelined rollout")
    S = mesh.shape[PP_AXIS]
    if S != L:
        raise ValueError(f"mesh 'pp' axis size {S} != {L} layers")
    B, H, W, C0 = images.shape
    assert channels[0] == C0, (channels, C0)
    M = n_micro or max(L, 2)
    if M < L:
        raise ValueError(f"n_micro {M} < {L} stages (wavefront dependency)")
    if B % M:
        raise ValueError(f"population {B} not divisible into {M} microbatches")
    mb = B // M
    if H % (2 ** (L - 1)) or W % (2 ** (L - 1)):
        raise ValueError(f"{H}x{W} does not halve {L - 1} times")

    dtype = params[0]["lstm_w"].dtype
    cd = compute_dtype
    T = repeat + extension
    shapes = [(H // 2**l, W // 2**l, channels[l]) for l in range(L)]
    frc = [h * w * c for (h, w, c) in shapes]
    F = max(frc)
    n_in = [
        3 * channels[l] + (channels[l + 1] if l + 1 < L else 0)
        for l in range(L)
    ]
    stacked = _stack_padded(params, channels)
    frames = images.astype(jnp.float32).reshape(M, mb, H, W, C0)
    K = 2 * T * M + 2 * L - 2  # last up tick: 2(TM-1)+2L-1

    def body(weights, frames):
        s = jax.lax.axis_index(PP_AXIS)
        w_local = {k: v[0] for k, v in weights.items()}  # (1, ...) -> (...)

        def pad_flat(x, width, dt):
            flat = x.astype(dt).reshape(mb, -1)
            return jnp.pad(flat, ((0, 0), (0, width - flat.shape[1])))

        # ---------------- down half-step: R/c update of layer l ----------
        def down_branch(l):
            h_l, w_l, C = shapes[l]

            def go(carry, m):
                e = (
                    jax.lax.dynamic_index_in_dim(carry["e"], m, 0, False)[
                        :, : 2 * frc[l]
                    ].reshape(mb, h_l, w_l, 2 * C)
                )
                r = (
                    jax.lax.dynamic_index_in_dim(carry["r"], m, 0, False)[
                        :, : frc[l]
                    ].reshape(mb, h_l, w_l, C)
                )
                c_prev = (
                    jax.lax.dynamic_index_in_dim(carry["c"], m, 0, False)[
                        :, : frc[l]
                    ].reshape(mb, h_l, w_l, C)
                )
                w = w_local["lstm_w"][:, :, : n_in[l], : 4 * C]
                b = w_local["lstm_b"][: 4 * C]
                gates = _conv(e, w[:, :, : 2 * C], b, cd)
                gates = gates + _conv_nobias(r, w[:, :, 2 * C : 3 * C], cd)
                if l + 1 < L:
                    ha, wa, Ca = shapes[l + 1]
                    r_above = carry["r_in"][:, : frc[l + 1]].reshape(
                        mb, ha, wa, Ca
                    )
                    gates = gates + _conv_nobias(
                        _upsample2(r_above), w[:, :, 3 * C :], cd
                    )
                h_new, c_new = _lstm_gates_jnp(gates, c_prev)
                r_flat = pad_flat(h_new, F, dtype)
                carry = dict(carry)
                carry["r"] = jax.lax.dynamic_update_index_in_dim(
                    carry["r"], r_flat, m, 0
                )
                carry["c"] = jax.lax.dynamic_update_index_in_dim(
                    carry["c"], pad_flat(c_new, F, dtype), m, 0
                )
                carry["r_out"] = r_flat  # -> stage below, next tick
                return carry

            return go

        # ---------------- up half-step: Ahat/E of layer l ----------------
        def up_branch(l):
            h_l, w_l, C = shapes[l]

            def go(carry, m, t):
                r = (
                    jax.lax.dynamic_index_in_dim(carry["r"], m, 0, False)[
                        :, : frc[l]
                    ].reshape(mb, h_l, w_l, C)
                )
                ahat = _conv(
                    r, w_local["ahat_w"][:, :, :C, :C],
                    w_local["ahat_b"][:C], cd,
                )
                carry = dict(carry)
                if l == 0:
                    ahat = jnp.clip(ahat, 0.0, 1.0)  # SatLU
                    pred_flat = ahat.astype(jnp.float32).reshape(mb, -1)
                    frame = jnp.where(
                        t < repeat,
                        jax.lax.dynamic_index_in_dim(frames, m, 0, False)
                        .reshape(mb, -1),
                        jax.lax.dynamic_index_in_dim(
                            carry["prev_pred"], m, 0, False
                        ),
                    )
                    a = frame.reshape(mb, h_l, w_l, C).astype(cd)
                    carry["prev_pred"] = jax.lax.dynamic_update_index_in_dim(
                        carry["prev_pred"], pred_flat, m, 0
                    )
                    for ci, tc in enumerate(collect):
                        cur = jax.lax.dynamic_index_in_dim(
                            carry["preds"][ci], m, 0, False
                        )
                        carry["preds"] = carry["preds"].at[ci].set(
                            jax.lax.dynamic_update_index_in_dim(
                                carry["preds"][ci],
                                jnp.where(t == tc, pred_flat, cur),
                                m,
                                0,
                            )
                        )
                else:
                    ahat = jax.nn.relu(ahat)
                    a = carry["a_in"][:, : frc[l]].reshape(
                        mb, h_l, w_l, C
                    ).astype(cd)
                e = jnp.concatenate(
                    [jax.nn.relu(ahat - a), jax.nn.relu(a - ahat)], axis=-1
                )
                carry["e"] = jax.lax.dynamic_update_index_in_dim(
                    carry["e"], pad_flat(e, 2 * F, dtype), m, 0
                )
                if l + 1 < L:
                    Cn = channels[l + 1]
                    a_next = jax.nn.relu(
                        _conv(
                            e.astype(dtype),
                            w_local["a_w"][:, :, : 2 * C, :Cn],
                            w_local["a_b"][:Cn],
                            cd,
                        )
                    )
                    carry["a_out"] = pad_flat(_maxpool2(a_next), F, cd)
                return carry

            return go

        def tick(carry, k):
            # boundary hops: R one stage down, pooled-A one stage up
            carry = dict(carry)
            carry["r_in"] = jax.lax.ppermute(
                carry["r_out"], PP_AXIS, [(i, i - 1) for i in range(1, S)]
            )
            carry["a_in"] = jax.lax.ppermute(
                carry["a_out"], PP_AXIS, [(i, i + 1) for i in range(S - 1)]
            )
            # zero the outboxes: a stage only fills its own half-step's
            carry["r_out"] = jnp.zeros_like(carry["r_out"])
            carry["a_out"] = jnp.zeros_like(carry["a_out"])

            dphase = k - (L - 1 - s)
            is_down = (dphase >= 0) & (dphase % 2 == 0) & (
                dphase // 2 < T * M
            )
            didx = jnp.clip(dphase // 2, 0, T * M - 1)
            uphase = k - (L + s)
            is_up = (uphase >= 0) & (uphase % 2 == 0) & (uphase // 2 < T * M)
            uidx = jnp.clip(uphase // 2, 0, T * M - 1)

            carry = jax.lax.cond(
                is_down,
                lambda c: jax.lax.switch(
                    s, [down_branch(l) for l in range(L)], c, didx % M
                ),
                lambda c: c,
                carry,
            )
            carry = jax.lax.cond(
                is_up,
                lambda c: jax.lax.switch(
                    s,
                    [up_branch(l) for l in range(L)],
                    c,
                    uidx % M,
                    uidx // M,
                ),
                lambda c: c,
                carry,
            )
            return carry, None

        carry0 = {
            "r": jnp.zeros((M, mb, F), dtype),
            "c": jnp.zeros((M, mb, F), dtype),
            "e": jnp.zeros((M, mb, 2 * F), dtype),
            "prev_pred": frames.reshape(M, mb, -1),
            "preds": jnp.zeros((len(collect), M, mb, H * W * C0), jnp.float32),
            "r_in": jnp.zeros((mb, F), dtype),
            "r_out": jnp.zeros((mb, F), dtype),
            "a_in": jnp.zeros((mb, F), cd),
            "a_out": jnp.zeros((mb, F), cd),
        }
        carry, _ = jax.lax.scan(tick, carry0, jnp.arange(K))
        return carry["preds"]

    # check_vma off: the schedule deliberately mixes axis_index-varying
    # branches with invariant identity branches in lax.cond, which the
    # varying-axis type system cannot unify
    shmapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=({k: P(PP_AXIS) for k in stacked}, P()),
        out_specs=P(PP_AXIS),
        check_vma=False,
    )
    preds = jax.jit(shmapped)(stacked, frames)
    # stage 0's block of the stage-stacked output carries the predictions
    preds = preds[: len(collect)].reshape(len(collect), B, H, W, C0)
    if pair == "population":
        return preds[0], preds[1]
    return images.astype(jnp.float32), preds[0]

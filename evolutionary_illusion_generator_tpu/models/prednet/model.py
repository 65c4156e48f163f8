"""PredNet: the predictive-coding ConvLSTM stack, TPU-native.

Re-implements the frozen predictor the reference drives through the (empty)
``chainer_prednet`` submodule (call contract: ``test_prednet(initmodel,
sequence_list, size, channels, gpu, output_dir, skip_save_frames,
extension_start, extension_duration, reset_at, verbose, c_dim)``,
generate_illusion.py:533-537; architecture per Lotter et al. 2017 /
Watanabe et al. 2018, Readme.md:13).

Architecture (channels per layer ``[c, 48, 96, 192]`` color or
``[1, 16, 32, 64]`` grayscale, generate_illusion.py:734):

  top-down, l = L-1..0:
    R_l, c_l <- ConvLSTM_l(concat[E_l(t-1), R_l(t-1), upsample2(R_{l+1}(t))])
  bottom-up, l = 0..L-1 with A_0 = input frame:
    Ahat_l = ReLU(conv(R_l))        (SatLU clip to [0,1] at l=0)
    E_l    = concat[ReLU(Ahat_l - A_l), ReLU(A_l - Ahat_l)]
    A_{l+1}= maxpool2(conv(E_l))
  prediction = Ahat_0

TPU-first design decisions (NOT a translation of the Chainer code):
  * population is the batch axis: one rollout call evaluates every candidate
    as a big NHWC batched conv program on the MXU — the reference instead
    concatenates candidates into one long frame sequence and resets
    recurrent state every ``reset_at`` frames (generate_illusion.py:536);
    independent-batch rollouts make the reset machinery unnecessary.
  * time is a ``lax.scan`` (recurrence is inherently sequential); the
    open-loop -> closed-loop switch ("extension", feeding back its own
    prediction) is a per-step select, not Python control flow.
  * params/states are bfloat16, gate math accumulates in float32.
  * all four LSTM gates come from ONE conv (4*C output channels); the gate
    nonlinearities + cell update are fused (Pallas kernel in
    ops/convlstm_pallas.py, jnp fallback here).
  * only the frames the fitness oracle needs are kept (predictions at
    t = repeat-1, repeat, repeat+1) — no (T, pop, H, W, C) buffer.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "PredNetParams",
    "init_params",
    "init_state",
    "prednet_step",
    "quantize_params_int8",
    "rollout",
    "rollout_flow_frames",
]


# Params are plain pytrees (lists of per-layer dicts) — functional style,
# trivially shardable/replicable under pjit.
PredNetParams = List[dict]


def _conv_init(key, shape, dtype, scale=None):
    fan_in = shape[0] * shape[1] * shape[2]
    if scale is None:
        scale = 1.0 / np.sqrt(fan_in)
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def init_params(
    key,
    channels: Sequence[int] = (3, 48, 96, 192),
    kernel: int = 3,
    dtype=jnp.bfloat16,
    peephole: bool = False,
) -> PredNetParams:
    """Random PredNet parameters for the given per-layer channel stack.

    ``peephole=True`` adds per-channel Hadamard cell-feedback weights
    (w_ci/w_cf/w_co), matching the Chainer implementation's ConvLSTM
    formulation (its spatial EltFilter peepholes import onto these)."""
    L = len(channels)
    params: PredNetParams = []
    keys = jax.random.split(key, L * 3)
    for l in range(L):
        C = channels[l]
        in_ch = 2 * C + C  # E_l + R_l
        if l + 1 < L:
            in_ch += channels[l + 1]  # upsampled R_{l+1}
        layer = {
            "lstm_w": _conv_init(keys[3 * l], (kernel, kernel, in_ch, 4 * C), dtype),
            "lstm_b": jnp.zeros((4 * C,), dtype),
            "ahat_w": _conv_init(keys[3 * l + 1], (kernel, kernel, C, C), dtype),
            "ahat_b": jnp.zeros((C,), dtype),
        }
        if peephole:
            layer["w_ci"] = jnp.zeros((C,), dtype)
            layer["w_cf"] = jnp.zeros((C,), dtype)
            layer["w_co"] = jnp.zeros((C,), dtype)
        if l + 1 < L:
            layer["a_w"] = _conv_init(
                keys[3 * l + 2], (kernel, kernel, 2 * C, channels[l + 1]), dtype
            )
            layer["a_b"] = jnp.zeros((channels[l + 1],), dtype)
        params.append(layer)
    return params


def init_state(
    batch: int,
    h: int,
    w: int,
    channels: Sequence[int] = (3, 48, 96, 192),
    dtype=jnp.bfloat16,
    s2d_l0: bool = False,
):
    """Zero recurrent state: per layer (R, c, E) at 1/2^l resolution.

    With ``s2d_l0`` the pixel layer's tensors live in phase-major
    space-to-depth layout (B, h/2, w/2, 4C) for the whole rollout (see
    :func:`_s2d_kernel`); zeros are zeros in either layout."""
    state = []
    for l, C in enumerate(channels):
        hl, wl = h // (2**l), w // (2**l)
        if l == 0 and s2d_l0:
            hl, wl, C = hl // 2, wl // 2, 4 * C
        state.append(
            {
                "r": jnp.zeros((batch, hl, wl, C), dtype),
                "c": jnp.zeros((batch, hl, wl, C), dtype),
                "e": jnp.zeros((batch, hl, wl, 2 * C), dtype),
            }
        )
    return state


def quantize_params_int8(params: PredNetParams) -> PredNetParams:
    """Symmetric int8 quantization of every conv weight (frozen predictor).

    Per-OUTPUT-channel scales (max-abs / 127), so slicing the fused LSTM
    kernel along its INPUT axis — how :func:`prednet_step` splits the
    per-source convs — leaves the scales valid.  Biases and peephole
    vectors stay in their float dtype.

    v5e MXU throughput doubles for int8 vs bf16 (394 vs 197 T-ops/s), so
    this halves the speed-of-light of the rollout's conv FLOPs; the cost
    is quantization noise on the *activations* (dynamic per-tensor scale
    in :func:`_conv_q`), which perturbs the sub-pixel drift signals the
    fitness oracle reads.  Opt-in (``EvalConfig.prednet_int8``); promote
    only with a measured rated-probe ordering check, like the Pallas and
    subpixel experiments (BENCH_NOTES.md).
    """
    qp: PredNetParams = []
    for layer in params:
        q = {}
        for k, v in layer.items():
            if k.endswith("_w") and getattr(v, "ndim", 0) == 4:
                w32 = jnp.asarray(v, jnp.float32)
                s = jnp.maximum(
                    jnp.max(jnp.abs(w32), axis=(0, 1, 2)) / 127.0, 1e-12
                )  # (Cout,)
                q[k] = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
                q[k + "_s"] = s
            else:
                q[k] = v
        qp.append(q)
    return qp


def _is_quantized(params: PredNetParams) -> bool:
    return params[0]["lstm_w"].dtype == jnp.int8


def _state_dtype(params: PredNetParams):
    """Recurrent-state dtype: the weight dtype, or the bias dtype for
    int8-quantized params (states must stay floating point)."""
    w = params[0]["lstm_w"]
    return params[0]["lstm_b"].dtype if w.dtype == jnp.int8 else w.dtype


def _conv_q(x, wq, ws, b, out_dtype=jnp.float32):
    """int8 NHWC conv: dynamic PER-SAMPLE activation scale, int32 MXU
    accumulation, dequantize with the per-output-channel weight scales.

    The activation scale is per batch row (max over H, W, C), not per
    tensor: the evaluator batches many genomes per chunk, and a shared
    scale would let one genome's outlier activations perturb every other
    genome's quantization — scores would depend on chunk composition,
    breaking the chunking/sharding parity invariants.

    ``b`` may be ``None`` (the no-bias gate-source convs)."""
    ascale = jnp.maximum(
        jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True) / 127.0, 1e-12
    )  # (N, 1, 1, 1)
    xq = jnp.clip(jnp.round(x / ascale), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (ascale.astype(jnp.float32) * ws)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype)


def _conv(x, w, b, out_dtype=jnp.float32):
    """NHWC same-padding conv in the weight dtype; output in ``out_dtype``
    (bf16 halves the bandwidth of every post-conv elementwise fusion)."""
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype),
        w,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype,
    )
    return y + b.astype(out_dtype)


def _conv_nobias(x, w, out_dtype=jnp.float32):
    return jax.lax.conv_general_dilated(
        x.astype(w.dtype),
        w,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype,
    )


def _upsample2(x):
    """Nearest-neighbour 2x upsample (NHWC)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def _upconv_subpixel(x, w, out_dtype=jnp.float32):
    """conv3x3(NN-upsample2(x)) computed WITHOUT materializing the upsample.

    Each fine-resolution output parity (dy, dx) sees a 2x2 coarse window
    whose taps are parity-sums of the 3x3 kernel (a fine tap at row
    2i+dy+u reads coarse row i + floor((dy+u)/2)):

      dy=0: coarse rows (i-1, i) with weights (w0, w1+w2)
      dy=1: coarse rows (i, i+1) with weights (w0+w1, w2)

    and identically along x.  So the whole op is four 2x2 convs at the
    COARSE resolution interleaved — 4/9 of the fine-resolution FLOPs and
    no (B, 2h, 2w, Cin) intermediate in HBM.  Zero 'SAME' padding
    commutes (out-of-range coarse pixels are exactly the upsample's
    out-of-range zeros).

    Numerics: identical up to the pre-summing of paired taps (w1+w2 in
    the weight dtype before the MAC), i.e. bf16-rounding-level drift.
    """
    # per-axis 2-tap weight pairs, indexed by parity
    row = [  # dy -> (tap at i-1+dy, tap at i+dy)
        (w[0], w[1] + w[2]),  # dy=0
        (w[0] + w[1], w[2]),  # dy=1
    ]
    outs = []
    for dy in range(2):
        r0, r1 = row[dy]
        for dx in range(2):
            # combine along x the same way, on the already-row-reduced taps
            if dx == 0:
                k00, k01 = r0[0], r0[1] + r0[2]
                k10, k11 = r1[0], r1[1] + r1[2]
            else:
                k00, k01 = r0[0] + r0[1], r0[2]
                k10, k11 = r1[0] + r1[1], r1[2]
            k = jnp.stack(
                [jnp.stack([k00, k01], axis=0), jnp.stack([k10, k11], axis=0)],
                axis=0,
            )  # (2, 2, Cin, Cout)
            pad = ((1 - dy, dy), (1 - dx, dx))
            outs.append(
                jax.lax.conv_general_dilated(
                    x.astype(w.dtype),
                    k,
                    window_strides=(1, 1),
                    padding=pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=out_dtype,
                )
            )
    b, h, wd, c = outs[0].shape
    z = jnp.stack(outs, axis=0).reshape(2, 2, b, h, wd, c)
    z = z.transpose(2, 3, 0, 4, 1, 5)  # (B, h, dy, w, dx, C)
    return z.reshape(b, 2 * h, 2 * wd, c)


def _s2d(x):
    """Space-to-depth(2), phase-major: (B, H, W, C) -> (B, H/2, W/2, 4C)
    with output channel ``(2*dy + dx) * C + c`` holding full-res pixel
    ``(2i+dy, 2j+dx, c)``."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _d2s(x):
    """Inverse of :func:`_s2d`."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h2, 2 * w2, c)


def _s2d_kernel(w):
    """Lift a full-res 3x3 SAME conv kernel to s2d space:
    ``conv_same(_s2d(x), K) == _s2d(conv_same(x, w))`` exactly.

    Derivation: full-res output row ``2i+dy`` tap ``u`` reads row
    ``2i+dy+u = 2(i+qy)+py`` — i.e. s2d row offset ``qy`` phase ``py``
    with ``u = 2*qy + py - dy``; only ``u in {-1,0,1}`` entries are
    nonzero (9 of the 36 tap-phase combinations per output phase), the
    rest of the lifted 3x3x(4Cin)x(4Cout) kernel is zeros.  The point is
    MXU lane packing: PredNet's pixel layer has 1-57 channels, which pad
    to 128 lanes (~4-10% utilization at 640x480 — the measured rollout
    is ~5x off its FLOP roofline, phase_bench r4); 4x channels at 1/4
    the spatial size does the same nominal FLOPs at 2-4x the packed
    density, and the zeros ride along for free inside the padding that
    would have been there anyway.
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3), (kh, kw)
    K = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for dy in range(2):
        for dx in range(2):
            for py in range(2):
                for px in range(2):
                    for qy in (-1, 0, 1):
                        u = 2 * qy + py - dy
                        if not -1 <= u <= 1:
                            continue
                        for qx in (-1, 0, 1):
                            v = 2 * qx + px - dx
                            if not -1 <= v <= 1:
                                continue
                            pi = (2 * py + px) * cin
                            po = (2 * dy + dx) * cout
                            K = K.at[
                                qy + 1, qx + 1,
                                pi : pi + cin, po : po + cout,
                            ].set(w[u + 1, v + 1])
    return K


def _s2d_kernel_tiled(w):
    """s2d kernel for an input that is CONSTANT across phases (the
    top-down nearest-upsampled R_above: all four full-res phases equal
    the coarse pixel).  Summing the lifted kernel's input-phase blocks
    folds the 4x tile away: conv(r_above, K_tiled) ==
    conv(tile(r_above, 4), _s2d_kernel(w)) — and no upsampled
    intermediate exists at all."""
    kh, kw, cin, cout = w.shape
    K = _s2d_kernel(w)
    return K.reshape(kh, kw, 4, cin, 4 * cout).sum(axis=2)


def _tile4(b):
    """Bias for a phase-major s2d conv output: the same per-channel bias
    in each of the four phase blocks."""
    return jnp.tile(b, 4)


def _gate_major(K):
    """Permute a lifted s2d LSTM kernel's output channels from phase-major
    ``[phase][gate][c]`` to gate-major ``[gate][phase][c]``.

    With gate-major packing the step's gate math is pure rank-4 NHWC
    slicing: ``split(gates, 4, -1)`` yields i/f/o/g each with phase-major
    ``4C`` channels, elementwise-aligned with the phase-major cell carry —
    no rank-5 reshapes.  The round-5 per-op profile attributed ~16% of
    the rollout to in-scan layout copies, and the HLO dump pins them to
    exactly those reshapes (each splits the minor channel dim of a tensor
    whose conv-preferred layout is non-default, forcing a physical copy
    every scan step).  Reordering the kernel at lift time is free: XLA
    hoists the loop-invariant lift out of the scan."""
    kh, kw, cin4, cout4 = K.shape
    C = cout4 // 16  # cout4 = 4 phases x 4 gates x C
    K = K.reshape(kh, kw, cin4, 4, 4, C)  # (phase, gate, c)
    K = K.transpose(0, 1, 2, 4, 3, 5)  # (gate, phase, c)
    return K.reshape(kh, kw, cin4, cout4)


def _tile4_gate_major(b):
    """Bias for a gate-major s2d LSTM conv output: full-res bias blocks
    ``[gate][c]`` each repeated across the four phases."""
    C = b.shape[0] // 4
    return jnp.tile(b.reshape(4, 1, C), (1, 4, 1)).reshape(-1)


def _posneg_major_in(K):
    """Permute a lifted s2d kernel's INPUT channels from the phase-major
    error packing ``[phase][pos|neg][c]`` (what :func:`_s2d` of the
    full-res ``[pos; neg]`` concat produces) to the pos/neg-major packing
    ``[pos|neg][phase][c]`` the rank-4 step emits (plain
    ``concat([relu(ahat-a), relu(a-ahat)])`` of phase-major tensors,
    no rank-5 interleave)."""
    kh, kw, cin4, cout = K.shape
    c0 = cin4 // 8  # cin4 = 4 phases x 2 signs x c0
    K = K.reshape(kh, kw, 4, 2, c0, cout)  # (phase, sign, c)
    K = K.transpose(0, 1, 3, 2, 4, 5)  # (sign, phase, c)
    return K.reshape(kh, kw, cin4, cout)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x,
        -jnp.inf if x.dtype == jnp.float32 else jnp.finfo(x.dtype).min,
        jax.lax.max,
        (1, 2, 2, 1),
        (1, 2, 2, 1),
        "VALID",
    )


def _lstm_gates_jnp(gates, c_prev, peephole=None):
    """Gate math in the gates' dtype: i,f,o sigmoid; g tanh; c = f*c + i*g.

    ``peephole``, when given, is a dict of Hadamard cell-feedback weights
    (w_ci, w_cf, w_co) — the Chainer implementation's peephole connections
    (its ``EltFilter`` weights are per-element (H, W, C); per-channel (C,)
    vectors broadcast equally well here).  i/f peep at c_{t-1}, o peeps at
    the new c (standard Gers-Schmidhuber formulation).
    """
    i, f, o, g = jnp.split(gates, 4, axis=-1)
    cp = c_prev.astype(gates.dtype)

    def peep(name):
        w = peephole[name].astype(gates.dtype)
        # Imported Chainer EltFilter peepholes are spatial (H, W, C) at the
        # TRAINING resolution; when the run resolution differs they cannot
        # broadcast — fall back to their per-channel spatial mean (shape
        # checks happen at trace time, so this costs nothing inside jit).
        if w.ndim == 3 and w.shape[:2] != cp.shape[1:3]:
            w = w.mean(axis=(0, 1))
        return w

    if peephole is not None:
        i = i + peep("w_ci") * cp
        f = f + peep("w_cf") * cp
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    c = f * cp + i * g
    if peephole is not None:
        o = o + peep("w_co") * c
    o = jax.nn.sigmoid(o)
    h = o * jnp.tanh(c)
    return h, c


def _apply_gates(gates, c_prev, use_pallas, peephole=None):
    # only the explicit True selects the standalone gate kernel; "fused"
    # layers that fall back here (narrow C, see prednet_step) use the XLA
    # chain, which is faster at those shapes
    if use_pallas is True and peephole is None:
        from ...ops.convlstm_pallas import fused_lstm_gates

        # off-TPU (CPU test mesh) the kernel runs in interpreter mode
        interpret = jax.default_backend() != "tpu"
        return fused_lstm_gates(
            gates.astype(jnp.float32), c_prev, interpret=interpret
        )
    return _lstm_gates_jnp(gates, c_prev, peephole)


def _s2d_ok(params: PredNetParams, h: int, w: int) -> bool:
    """Whether the s2d pixel-layer path applies: float 3x3 weights, even
    spatial dims, and no SPATIAL peephole at layer 0 (per-channel (C,)
    peepholes broadcast fine across the phase axis; imported (H, W, C)
    EltFilter peepholes would need their own lifting)."""
    if _is_quantized(params):
        return False
    if params[0]["lstm_w"].shape[:2] != (3, 3):
        return False
    if h % 2 or w % 2:
        return False
    w_ci = params[0].get("w_ci")
    if w_ci is not None and getattr(w_ci, "ndim", 1) == 3:
        return False
    return True


def prednet_step(
    params: PredNetParams,
    state,
    frame,
    *,
    use_pallas: bool = False,
    compute_dtype=jnp.float32,
    subpixel_up: bool = False,
    s2d_l0: bool = False,
):
    """One PredNet timestep.

    Args:
      params: from :func:`init_params`.
      state: per-layer dicts (r, c, e) from :func:`init_state`.
      frame: (B, H, W, C0) input in [0, 1].
      compute_dtype: dtype of conv outputs / gate math / error units.
        ``jnp.bfloat16`` roughly halves post-conv bandwidth (the rollout's
        dominant cost) at ~1e-2 prediction precision — fine for fitness
        evaluation; keep f32 when exact predictor numerics matter.
      subpixel_up: compute the top-down conv(upsample2(R_above)) as four
        parity 2x2 convs at the coarse resolution (:func:`_upconv_subpixel`)
        — 4/9 the FLOPs, no upsampled intermediate in HBM, bf16-rounding
        numeric drift only.
      s2d_l0: the pixel layer's convs, states, frame and prediction live in
        phase-major space-to-depth layout (see :func:`_s2d_kernel` for the
        MXU-packing rationale).  CALLER CONTRACT: ``state[0]`` from
        ``init_state(..., s2d_l0=True)``, ``frame`` is ``_s2d(image)``, and
        the returned prediction is s2d-packed (callers :func:`rollout` /
        :func:`rollout_flow_frames` handle both sides).  Same math as the
        default path up to f32/bf16 accumulation-order rounding.
    Returns:
      (new_state, prediction) with prediction (B, H, W, C0) f32 in [0, 1]
      ((B, H/2, W/2, 4*C0) s2d-packed under ``s2d_l0``).
    """
    L = len(params)
    dtype = state[0]["r"].dtype
    cd = compute_dtype
    quantized = _is_quantized(params)
    if quantized:
        # int8 params carry their own conv path; the Pallas kernels, the
        # subpixel decomposition and the s2d pixel layer assume float
        # weights
        use_pallas = False
        subpixel_up = False
        s2d_l0 = False

    # ---- top-down recurrent pass -------------------------------------
    # The gate conv is computed as a SUM of per-source convs (weight slices
    # of the fused kernel) instead of conv(concat(...)): identical math, but
    # avoids materializing the concatenated input (hundreds of MB of pure
    # copy traffic per step at scale).
    new_state = [dict(s) for s in state]
    r_above: Optional[jnp.ndarray] = None
    for l in reversed(range(L)):
        s = state[l]
        w = params[l]["lstm_w"]
        s2d_here = s2d_l0 and l == 0
        # under s2d the layer-0 state carries 4*C packed channels; the
        # weight slicing below needs the TRUE per-layer channel count
        C = params[l]["ahat_w"].shape[2] if s2d_here else s["r"].shape[-1]
        peephole = None
        if "w_ci" in params[l]:
            peephole = {k: params[l][k] for k in ("w_ci", "w_cf", "w_co")}
        H_l = s["r"].shape[1]
        rows_l = 0
        if use_pallas == "fused" and peephole is None and C >= 32:
            from ...ops.convlstm_fused_pallas import pick_rows

            rows_l = pick_rows(H_l)
        # NOTE: the top-down source keeps r_above's own channel count
        # (channels[l+1], not C) — the gate must test the real width or it
        # mis-selects the multi kernel on non-doubling stacks (e.g. 128->192,
        # where Mosaic then fails the 128-lane DMA tiling rule).
        srcs_cin = [2 * C, C] + (
            [r_above.shape[-1]] if r_above is not None else []
        )
        use_multi = (
            rows_l
            and rows_l % 8 == 0
            and all(ci % 128 == 0 for ci in srcs_cin)
        )
        if use_multi:
            # multi-source fused kernel: every program DMAs its own
            # aligned source windows — no concat, no halo window stack,
            # no gates round-trip.  Mosaic requires DMA slices to cover
            # whole 128-lane tiles, so this path needs every source's
            # channel count to be a multiple of 128 (measured failure
            # otherwise: "Slice shape along dimension 3 must be aligned
            # to tiling (128), but is 192") — rarely true at PredNet
            # widths, hence the single-input fallback below.
            from ...ops.convlstm_fused_pallas import (
                fused_convlstm_layer_multi,
            )

            srcs = [s["e"].astype(jnp.bfloat16), s["r"].astype(jnp.bfloat16)]
            wsrc = [w[:, :, : 2 * C], w[:, :, 2 * C : 3 * C]]
            if r_above is not None:
                srcs.append(_upsample2(r_above).astype(jnp.bfloat16))
                wsrc.append(w[:, :, 3 * C :])
            h, c = fused_convlstm_layer_multi(
                srcs, wsrc, params[l]["lstm_b"], s["c"],
                rows_per_block=rows_l,
                interpret=jax.default_backend() != "tpu",
            )
        elif rows_l:
            # single-input fused conv+gates+update kernel: concat the
            # sources, materialize aligned halo windows, one pass for
            # conv+gates+state.  -19% vs XLA at the isolated layer-1
            # shape but a net pipeline loss from the materializations
            # (BENCH_NOTES.md) — which is why use_pallas='fused' is
            # opt-in and the XLA split-conv chain is the default.
            from ...ops.convlstm_fused_pallas import fused_convlstm_layer

            srcs = [s["e"], s["r"]]
            w_l = w[:, :, : 3 * C]
            if r_above is not None:
                srcs.append(_upsample2(r_above))
                w_l = w
            x = jnp.concatenate(
                [t.astype(jnp.bfloat16) for t in srcs], axis=-1
            )
            h, c = fused_convlstm_layer(
                x, w_l, params[l]["lstm_b"], s["c"],
                interpret=jax.default_backend() != "tpu",
            )
        elif quantized:
            ws = params[l]["lstm_w_s"]
            gates = _conv_q(
                s["e"].astype(cd), w[:, :, : 2 * C], ws,
                params[l]["lstm_b"], cd,
            )
            gates = gates + _conv_q(
                s["r"].astype(cd), w[:, :, 2 * C : 3 * C], ws, None, cd
            )
            if r_above is not None:
                gates = gates + _conv_q(
                    _upsample2(r_above).astype(cd), w[:, :, 3 * C :], ws,
                    None, cd,
                )
            h, c = _apply_gates(gates, s["c"], use_pallas, peephole)
        elif s2d_here:
            # pixel layer in s2d layout: lifted 3x3 convs over 4x-packed
            # channels, top-down tile folded into the kernel (no upsample
            # intermediate).  Kernel output channels are reordered GATE-
            # major at lift time (and the e-input channels to the rank-4
            # pos/neg-major error packing) so the gate math below is pure
            # rank-4 slicing — no per-step rank-5 reshape, hence no
            # in-scan layout copies (see _gate_major).
            gates = _conv(
                s["e"],
                _gate_major(_posneg_major_in(_s2d_kernel(w[:, :, : 2 * C]))),
                _tile4_gate_major(params[l]["lstm_b"]), cd,
            )
            gates = gates + _conv_nobias(
                s["r"], _gate_major(_s2d_kernel(w[:, :, 2 * C : 3 * C])), cd
            )
            if r_above is not None:
                gates = gates + _conv_nobias(
                    r_above,
                    _gate_major(_s2d_kernel_tiled(w[:, :, 3 * C :])), cd,
                )
            pe = peephole
            if pe is not None:
                # per-channel (C,) peepholes tile phase-major to match the
                # (4C,) carry; spatial peepholes are excluded by _s2d_ok
                pe = {
                    k: (_tile4(v) if getattr(v, "ndim", 1) == 1 else v)
                    for k, v in pe.items()
                }
            h, c = _lstm_gates_jnp(gates, s["c"], pe)
        else:
            w_e = w[:, :, : 2 * C]
            w_r = w[:, :, 2 * C : 3 * C]
            gates = _conv(s["e"], w_e, params[l]["lstm_b"], cd)
            gates = gates + _conv_nobias(s["r"], w_r, cd)
            if r_above is not None:
                if subpixel_up:
                    gates = gates + _upconv_subpixel(
                        r_above, w[:, :, 3 * C :], cd
                    )
                else:
                    gates = gates + _conv_nobias(
                        _upsample2(r_above), w[:, :, 3 * C :], cd
                    )
            h, c = _apply_gates(gates, s["c"], use_pallas, peephole)
        new_state[l]["r"] = h.astype(dtype)
        new_state[l]["c"] = c.astype(dtype)
        r_above = new_state[l]["r"]

    # ---- bottom-up error pass ----------------------------------------
    a = frame.astype(cd)
    prediction = None
    for l in range(L):
        r = new_state[l]["r"]
        if l == 0 and s2d_l0:
            C0 = params[0]["ahat_w"].shape[2]
            ahat = _conv(
                r, _s2d_kernel(params[0]["ahat_w"]),
                _tile4(params[0]["ahat_b"]), cd,
            )
            ahat = jnp.clip(ahat, 0.0, 1.0)  # SatLU at the pixel layer
            prediction = ahat.astype(jnp.float32)  # s2d-packed
            # rank-4 pos/neg-major error: [pos(4C0 phase-major);
            # neg(4C0 phase-major)] — a channel permutation of _s2d of
            # the full-res [pos; neg] concat, compensated in the e-input
            # channel order of both lifted consumers (_posneg_major_in)
            e = jnp.concatenate(
                [jax.nn.relu(ahat - a), jax.nn.relu(a - ahat)], axis=-1
            )
            new_state[0]["e"] = e.astype(dtype)
            if L > 1:
                # maxpool2(relu(conv3x3(E0))) == per-cell max over the four
                # phase blocks of the lifted conv — A_1 comes out directly
                # in layer 1's own (H/2, W/2) layout, no relayout; the
                # phase max is four rank-4 channel slices, not a rank-5
                # reduce
                c1 = params[0]["a_w"].shape[3]
                a1 = _conv(
                    e.astype(dtype),
                    _posneg_major_in(_s2d_kernel(params[0]["a_w"])),
                    _tile4(params[0]["a_b"]), cd,
                )
                r1 = jax.nn.relu(a1)
                a = jnp.maximum(
                    jnp.maximum(r1[..., :c1], r1[..., c1 : 2 * c1]),
                    jnp.maximum(r1[..., 2 * c1 : 3 * c1], r1[..., 3 * c1 :]),
                )
            continue
        if quantized:
            ahat = _conv_q(
                r.astype(cd), params[l]["ahat_w"], params[l]["ahat_w_s"],
                params[l]["ahat_b"], cd,
            )
        else:
            ahat = _conv(r, params[l]["ahat_w"], params[l]["ahat_b"], cd)
        if l == 0:
            ahat = jnp.clip(ahat, 0.0, 1.0)  # SatLU at the pixel layer
            prediction = ahat.astype(jnp.float32)
        else:
            ahat = jax.nn.relu(ahat)
        e = jnp.concatenate(
            [jax.nn.relu(ahat - a), jax.nn.relu(a - ahat)], axis=-1
        )
        new_state[l]["e"] = e.astype(dtype)
        if l + 1 < L:
            if quantized:
                a_next = jax.nn.relu(
                    _conv_q(
                        e, params[l]["a_w"], params[l]["a_w_s"],
                        params[l]["a_b"], cd,
                    )
                )
            else:
                a_next = jax.nn.relu(
                    _conv(
                        e.astype(dtype), params[l]["a_w"], params[l]["a_b"],
                        cd,
                    )
                )
            a = _maxpool2(a_next)

    return new_state, prediction


def rollout(
    params: PredNetParams,
    images,
    *,
    repeat: int = 20,
    extension: int = 2,
    collect: Tuple[int, ...] = (),
    use_pallas: bool = False,
    compute_dtype=jnp.float32,
    subpixel_up: bool = False,
    s2d_l0: bool = False,
):
    """Run the reference's repeated-frame + closed-loop-extension schedule.

    The input image is presented ``repeat`` times (open loop), then the
    model's own prediction is fed back for ``extension`` steps ("extension",
    generate_illusion.py:531-536: extension_start=repeat,
    extension_duration=2).  Per-candidate state starts at zero, which is what
    the reference's ``reset_at=repeat+extension`` achieves between
    candidates.

    Args:
      images: (B, H, W, C0) float in [0, 1] — one frame per candidate.
      collect: timesteps whose predictions to return (e.g. ``(19, 20)`` for
        the population flow pair, ``(21,)`` for the probe pair).
    Returns:
      dict: {"predictions": {t: (B, H, W, C0) f32}, "final_state": state}
    """
    B, H, W, C0 = images.shape
    channels = [p["ahat_w"].shape[2] for p in params]
    assert channels[0] == C0, (channels, C0)
    T = repeat + extension
    s2d_l0 = s2d_l0 and _s2d_ok(params, H, W)
    state0 = init_state(
        B, H, W, channels, dtype=_state_dtype(params), s2d_l0=s2d_l0
    )
    collect = tuple(sorted(collect))
    frames32 = images.astype(jnp.float32)
    if s2d_l0:
        # the whole rollout runs s2d-packed at the pixel layer; pack the
        # input once here and unpack only the collected predictions
        frames32 = _s2d(frames32)
    unpack = _d2s if s2d_l0 else (lambda x: x)

    if not collect or min(collect) >= repeat - 1:
        # Fast path (covers both flow-pair conventions, which only need the
        # last open-loop prediction and the extension frames): scan the
        # constant-input open-loop phase with NO per-step selects, then
        # unroll the few closed-loop steps.  The naive formulation's
        # where(t==k) saved-frame selects and where(t<repeat) frame select
        # cost ~20% of the rollout (full-image ops every step).
        def step_open(carry, _):
            state, _ = carry
            state, pred = prednet_step(
                params, state, frames32, use_pallas=use_pallas,
                compute_dtype=compute_dtype, subpixel_up=subpixel_up,
                s2d_l0=s2d_l0,
            )
            return (state, pred), None

        (state, pred), _ = jax.lax.scan(
            step_open,
            (state0, jnp.zeros(frames32.shape, jnp.float32)),
            None,
            length=repeat,
        )
        saved = {}
        if repeat - 1 in collect:
            saved[repeat - 1] = unpack(pred)
        for t in range(repeat, T):
            state, pred = prednet_step(
                params, state, pred, use_pallas=use_pallas,
                compute_dtype=compute_dtype, subpixel_up=subpixel_up,
                s2d_l0=s2d_l0,
            )
            if t in collect:
                saved[t] = unpack(pred)
        return {"predictions": saved, "final_state": state}

    # general path: arbitrary collect times via masked per-step saves
    saved0 = {t: jnp.zeros(frames32.shape, jnp.float32) for t in collect}

    def step(carry, t):
        state, prev_pred, saved = carry
        frame = jnp.where(t < repeat, frames32, prev_pred)
        state, pred = prednet_step(
            params, state, frame, use_pallas=use_pallas,
            compute_dtype=compute_dtype, subpixel_up=subpixel_up,
            s2d_l0=s2d_l0,
        )
        saved = {k: jnp.where(t == k, pred, v) for k, v in saved.items()}
        return (state, pred, saved), None

    init = (state0, frames32, saved0)
    (state, _, saved), _ = jax.lax.scan(step, init, jnp.arange(T))
    return {
        "predictions": {k: unpack(v) for k, v in saved.items()},
        "final_state": state,
    }


def rollout_flow_frames(
    params: PredNetParams,
    images,
    *,
    repeat: int = 20,
    extension: int = 2,
    pair: str = "population",
    use_pallas: bool = False,
    compute_dtype=jnp.float32,
    subpixel_up: bool = False,
    s2d_l0: bool = False,
):
    """Return the two frames the flow stage compares.

    Two conventions coexist in the reference (SURVEY.md Appendix C #9):
      * "population": prediction at t=repeat-1 vs first extension frame
        (generate_illusion.py:543-546);
      * "probe": the input image itself vs the second extension frame
        (fitness_calculator.py:493-498).
    """
    if pair == "population":
        out = rollout(
            params,
            images,
            repeat=repeat,
            extension=extension,
            collect=(repeat - 1, repeat),
            use_pallas=use_pallas,
            compute_dtype=compute_dtype, subpixel_up=subpixel_up,
            s2d_l0=s2d_l0,
        )
        return out["predictions"][repeat - 1], out["predictions"][repeat]
    if pair == "probe":
        out = rollout(
            params,
            images,
            repeat=repeat,
            extension=extension,
            collect=(repeat + 1,),
            use_pallas=use_pallas,
            compute_dtype=compute_dtype, subpixel_up=subpixel_up,
            s2d_l0=s2d_l0,
        )
        return images.astype(jnp.float32), out["predictions"][repeat + 1]
    raise ValueError(f"unknown pair convention: {pair!r}")

"""Synthetic motion sequences for predictor pretraining.

The reference's predictor was trained on first-person motion video (FPSI,
Readme.md:13) — unavailable here.  Two generations of stand-in data:

``synthetic_motion_batch`` (v2): band-limited random textures translating at
constant subpixel velocity (+ a static fraction).  Gives a generic motion
prior; enough for the swarm/Free metric but not for the circles families.

``synthetic_cue_batch`` (v3): adds the APPEARANCE->MOTION association the
published predictor exploits.  The rated circles stimuli
(illusions_rating/EIGEN-images) are rings of repeated asymmetric
luminance-ramp wedges — Fraser-Wilcox-style sawtooths — while the control
is plain concentric rings with no tangential gradient.  v3 therefore mixes:

  * asymmetric sawtooth patterns (linear / tangential-ring / radial) that
    ALWAYS drift toward their luminance-ramp direction, teaching
    "sawtooth implies motion along the ramp";
  * symmetric plain-ring patterns that are ALWAYS static, teaching the
    model to settle on control-like input;
  * the v2 smooth textures (static + translating) for the generic prior.

A predictor trained on this mixture predicts structure-consistent drift for
ramp-patterned static input (rotation for tangential rings, expansion for
radial ones) and near-zero drift for the control — the property the fitness
oracle needs (eigen_own_ratings.csv ordering).

The shipped recipe (v4, weights/README.md) uses the NO-STATIC subset of
these regimes: static regimes teach settling on any long static history
(history beats appearance once converged — measured round 2), while the
published FPSI-trained predictor never saw a static world.  v4 therefore
moves everything: plain symmetric rings fast (``ring_speed_range``) so
control-like input predicts implausibly fast drift (score 0 via the
plausibility gate), sawtooths slowly toward their ramp (coherent in-gate
drift).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["synthetic_motion_batch", "synthetic_cue_batch"]


def _smooth_texture(key, h, w, scale: int = 8):
    """Band-limited random texture in [0, 1] via low-res bilinear upsample."""
    lh, lw = h // scale + 2, w // scale + 2
    low = jax.random.uniform(key, (lh, lw))
    yy = jnp.linspace(0, lh - 1.001, h)
    xx = jnp.linspace(0, lw - 1.001, w)
    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    fy = (yy - y0)[:, None]
    fx = (xx - x0)[None, :]
    v00 = low[y0][:, x0]
    v01 = low[y0][:, x0 + 1]
    v10 = low[y0 + 1][:, x0]
    v11 = low[y0 + 1][:, x0 + 1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def _sample_shifted(tex, dx, dy, h, w, margin):
    """Bilinear crop of (h, w) at offset (margin + dx, margin + dy)."""
    yy = jnp.arange(h, dtype=jnp.float32) + margin + dy
    xx = jnp.arange(w, dtype=jnp.float32) + margin + dx
    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    fy = (yy - y0)[:, None]
    fx = (xx - x0)[None, :]
    v00 = tex[y0][:, x0]
    v01 = tex[y0][:, x0 + 1]
    v10 = tex[y0 + 1][:, x0]
    v11 = tex[y0 + 1][:, x0 + 1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def synthetic_motion_batch(
    key, batch, T, h, w, c, max_speed: float = 2.0, static_fraction: float = 0.0
):
    """(batch, T, h, w, c) float32 sequences of translating textures.

    ``static_fraction`` of the batch gets zero velocity — repeated static
    frames, the regime the fitness oracle probes (the predictor must settle
    to ~zero drift on truly static input so that only structure-driven
    drift survives the plausibility gates)."""

    def one(key):
        k_tex, k_vel, k_chan, k_static = jax.random.split(key, 4)
        margin = int(max_speed * T) + 2
        vel = jax.random.uniform(k_vel, (2,), minval=-max_speed, maxval=max_speed)
        static = jax.random.uniform(k_static, ()) < static_fraction
        vel = jnp.where(static, 0.0, vel)

        def chan(kc):
            tex = _smooth_texture(kc, h + 2 * margin, w + 2 * margin)

            def frame(t):
                return _sample_shifted(
                    tex, vel[0] * t, vel[1] * t, h, w, margin
                )

            return jax.vmap(frame)(jnp.arange(T, dtype=jnp.float32))

        chans = jax.vmap(chan)(jax.random.split(k_chan, c))  # (c, T, h, w)
        return jnp.moveaxis(chans, 0, -1)  # (T, h, w, c)

    return jax.vmap(one)(jax.random.split(key, batch))


# ---------------------------------------------------------------------------
# v3: appearance->motion cue sequences


def _asym_ramp(ph, rise: float = 0.8):
    """Asymmetric sawtooth profile on phase in [0,1): slow rise over
    ``rise`` of the period, sharp fall over the rest — the local luminance
    structure of the Fraser-Wilcox / rotating-snakes wedge."""
    ph = ph - jnp.floor(ph)
    return jnp.where(ph < rise, ph / rise, (1.0 - ph) / (1.0 - rise))


def _sym_rings(ph, duty=0.5):
    """Symmetric square-ish ring profile (control-like): no ramp asymmetry.

    ``duty`` is the bright fraction of each ring period; with
    ``ring_dir_cue`` it doubles as the appearance cue that determines the
    drift direction (see :func:`_phase_fields`).
    """
    ph = ph - jnp.floor(ph)
    return (ph < duty).astype(jnp.float32)


def _phase_fields(key, T, h, w, speed_range=(0.5, 2.5), max_onset=0,
                  move_prob=1.0, slow_range=None, slow_frac=0.0,
                  onset_hazard=0.0, ring_speed_range=None,
                  onset_range=None, ring_onset=False, ring_dir_cue=False,
                  ring_onset_range=None, cue_period_range=(12.0, 40.0),
                  tang_radial=False, tang_uniform=False,
                  cue_fine_speed_range=None, cue_fine_max_period=12.0,
                  ring_speed_cue=False):
    """Per-regime phase fields u(t, y, x); value = ramp(u).

    Motion is toward the ramp direction for the asymmetric regimes (the
    phase decreases over time, so the pattern drifts toward +u).
    ``speed_range`` bounds the drift in px/frame.

    ``move_prob < 1`` makes only that fraction of sawtooth sequences move;
    the rest stay static forever.  Measured round 2: this KILLS the
    static-history drift — a static prefix longer than ``max_onset``
    identifies the sequence as a never-mover, and the probe's 20 static
    presentations are far past any onset, so the model settles.

    ``slow_range``/``slow_frac`` instead make the SPEED distribution
    bimodal while every sawtooth still moves: a ``1 - slow_frac`` fast
    fraction (``speed_range``) imprints the appearance->motion
    association, and the slow bulk (``slow_range``) drags the
    conditional-mean drift prediction down.  This is the magnitude dial
    that works: sub-pixel uniform speeds (0.2-0.8) fail to imprint the
    association at all, while uniform 0.5-2.5 transfers ~0.5 px drift to
    the rated stimuli — over the 0.3 px plausibility gate of
    ops/fitness/calculate.py.

    ``max_onset > 0`` delays motion: the pattern holds STATIC for a random
    prefix of up to ``max_onset`` frames, then starts drifting.  This is the
    cue mechanism that makes the probe work: the fitness oracle presents a
    static image repeatedly, i.e. a history that says "static" on a pattern
    whose training continuation is "starts moving" — a predictor trained on
    onset sequences hedges toward coherent motion exactly there, while
    patterns that are NEVER moved (plain rings = control) settle.  Without
    onsets the model learns pure history extrapolation and settles on every
    static input regardless of appearance (measured: drift_diag round 2).

    ``onset_hazard > 0`` replaces the bounded-uniform onset with a
    GEOMETRIC one: each frame, a still-static sawtooth starts moving with
    constant probability ``p``.  Memorylessness is the point — with a
    bounded onset, a static history longer than ``max_onset`` identifies
    the sequence as a never-mover and a converged model settles on the
    probe's 20 static presentations (measured: every bounded-onset recipe
    at 2500 steps transfers ZERO drift, while the same recipe at 1200
    steps transfers via unconverged inductive bias only).  Under constant
    hazard the L2-optimal prediction for static sawtooth history of ANY
    length is drift ``p * E[speed]`` — a training-length-robust dial that
    puts the probe drift at ``~2 * p * E[speed]`` px (two closed-loop
    extension frames), to be placed inside the 0.3 px plausibility gate.
    Sequences whose onset falls past the window stay fully static (that is
    what keeps the hazard honest), so the association is imprinted by the
    ``1-(1-p)^T`` fraction that does move.
    """
    ks = jax.random.split(key, 9)
    onset = jnp.asarray(0.0, jnp.float32)
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    # jittered center
    cy = h / 2 + jax.random.uniform(ks[0], (), minval=-h / 8, maxval=h / 8)
    cx = w / 2 + jax.random.uniform(ks[1], (), minval=-w / 8, maxval=w / 8)
    yc, xc = yy - cy, xx - cx
    r = jnp.sqrt(xc**2 + yc**2) + 1e-6
    phi = jnp.arctan2(yc, xc)
    t = jnp.arange(T, dtype=jnp.float32)[:, None, None]
    if onset_range is not None:
        # v5 closed-boundary onset: the sawtooth holds STATIC for a prefix
        # drawn uniformly from the integer window [lo, hi], then drifts.
        # Paired with the closed-loop loss term (train.prednet_seq_loss,
        # whose open/closed boundary the window straddles) this supervises
        # the probe scenario itself: a static sawtooth history whose true
        # continuation is slow coherent drift toward the ramp.  Plain rings
        # are untouched (raw clock below) — the control stays always-fast.
        lo, hi = onset_range
        onset = jnp.floor(
            jax.random.uniform(
                ks[8], (), minval=float(lo), maxval=float(hi) + 1.0
            )
        )
        t = jnp.maximum(t - onset, 0.0)
    elif onset_hazard > 0.0:
        # geometric onset: floor(log(1-U)/log(1-p)), support {0, 1, ...};
        # onsets >= T leave the whole window static
        u = jax.random.uniform(ks[8], (), minval=1e-7, maxval=1.0 - 1e-7)
        onset = jnp.floor(jnp.log1p(-u) / jnp.log1p(-onset_hazard))
        t = jnp.maximum(t - onset, 0.0)
    elif max_onset:
        onset = jnp.floor(
            jax.random.uniform(ks[8], (), maxval=float(max_onset) + 1.0)
        )
        t = jnp.maximum(t - onset, 0.0)

    # sawtooth spatial period.  The default 12-40 px matches the rated
    # stimuli's OUTER rings only: their wedge structure is radius-
    # proportional and reaches ~4-8 px near the centre, where a predictor
    # trained on >=12 px patterns gives no drift response — measured
    # (scripts/field_anatomy.py) as the noise vectors that cap the
    # rotation-symmetry term.  Lower the minimum to put fine scales in
    # distribution (v6 series).
    period = jax.random.uniform(
        ks[2], (),
        minval=float(cue_period_range[0]), maxval=float(cue_period_range[1]),
    )
    speed = jax.random.uniform(
        ks[3], (), minval=speed_range[0], maxval=speed_range[1]
    )
    if slow_range is not None:
        slow = jax.random.uniform(
            jax.random.fold_in(ks[3], 2), (),
            minval=slow_range[0], maxval=slow_range[1],
        )
        is_slow = (
            jax.random.uniform(jax.random.fold_in(ks[3], 3), ()) < slow_frac
        )
        speed = jnp.where(is_slow, slow, speed)
    if cue_fine_speed_range is not None:
        # v7 weak-tail lever (measured motivation: BENCH_NOTES "cached-
        # vector anatomy" — the rated stimuli's fine-scale regions respond
        # at 0.03-0.10 px, under the ~0.1 px LK-noise cap that gates the
        # rotation-symmetry term, while the response magnitude tracks the
        # TRAINED drift speed of the matching spatial scale).  Fine-period
        # sawtooths (period < cue_fine_max_period) draw their speed from
        # this separate, faster band so the fine-scale static-history
        # response lands above the noise floor without re-dosing the
        # coarse scales that already sit in the scoring window.
        fine = jax.random.uniform(
            jax.random.fold_in(ks[3], 4), (),
            minval=cue_fine_speed_range[0], maxval=cue_fine_speed_range[1],
        )
        speed = jnp.where(period < cue_fine_max_period, fine, speed)
    if move_prob < 1.0:
        mover = (
            jax.random.uniform(jax.random.fold_in(ks[3], 1), ()) < move_prob
        )
        speed = speed * mover.astype(jnp.float32)
    theta = jax.random.uniform(ks[4], (), minval=0.0, maxval=2 * jnp.pi)
    n_seg = jnp.floor(
        jax.random.uniform(ks[5], (), minval=6.0, maxval=20.0)
    )
    ring_period = jax.random.uniform(ks[6], (), minval=14.0, maxval=34.0)
    # alternate wedge chirality (and thus rotation sense) per ring, like the
    # rated stimuli (fill_circle direction flip) — half the samples uniform
    alternate = (jax.random.uniform(ks[7], ()) < 0.5).astype(jnp.float32)
    ring_idx = jnp.floor(r / ring_period)
    ring_sign = jnp.where(alternate > 0, 1.0 - 2.0 * (ring_idx % 2.0), 1.0)

    u_linear = (xc * jnp.cos(theta) + yc * jnp.sin(theta) - speed * t) / period
    if tang_radial:
        # v6d: the wedge-ring class keeps its ANGULAR-asymmetric look (the
        # class discriminator the oracle probes on the rated rotate
        # stimuli) but its training continuation is radial CONTRACTION of
        # the ring structure, not rotation.  Rationale (measured,
        # BENCH_NOTES "v6ab"): rotation_symmetry_score is maximized by any
        # uniform-sign field in the rotated frame; the rated stimuli
        # alternate wedge chirality per ring, so a faithful tangential
        # response alternates sign and caps the term at 0.5, while a
        # uniform radial response scores ~1.0 — which is also the response
        # a natural-video predictor (the published FPSI weights) can
        # actually express: looming, not coherent rotation.  The wedge
        # field is static in phi; the chirality boundaries (and the ring
        # gap mask built from the same clock, see synthetic_cue_batch)
        # carry the inward motion.
        r_t = r[None] + speed * t  # onset-gated inward drift of rings
        ring_idx_t = jnp.floor(r_t / ring_period)
        ring_sign_t = jnp.where(
            alternate > 0, 1.0 - 2.0 * (ring_idx_t % 2.0), 1.0
        )
        u_tang = ring_sign_t * phi[None] * n_seg / (2 * jnp.pi)
    elif tang_uniform:
        # uniform LINEAR tangential speed across radius.  The default
        # constant-omega rotation moves a ring at omega*r px/frame — a
        # fraction of the sampled speed near the centre, which is measured
        # (scripts/field_anatomy.py; BENCH_NOTES "v6ab"/"v6e") as the
        # sub-noise inner-band tail that caps the rotate family's
        # rotation-symmetry term under every v6 variant.  Dividing the
        # angular rate by radius (differential rotation — the shear
        # between rings is invisible to the per-window LK tracker, and
        # chirality already alternates per ring) makes every ring drift at
        # ~``speed`` px/frame, like the radial cue always has.
        omega_r = speed / jnp.maximum(r, 4.0)  # (h, w) rad/frame
        u_tang = ring_sign * (
            phi[None] - omega_r[None] * ring_sign * t
        ) * n_seg / (2 * jnp.pi)
    else:
        # tangential speed ~= speed px/frame at the mid radius
        omega = speed / (0.3 * jnp.minimum(h, w))
        u_tang = ring_sign * (phi[None] - omega * ring_sign * t) * n_seg / (
            2 * jnp.pi
        )
    u_radial = (r[None] - speed * t) / period
    # ring duty cycle (bright fraction of each ring period).  With
    # ring_dir_cue the duty is sampled AWAY from 0.5 and determines the
    # radial drift direction (duty > 0.5 -> expand, < 0.5 -> contract):
    # measured v5d, a RANDOM ring direction makes blur the L1/E-optimal
    # response to a static ring history (the median of {expand, contract}
    # is no motion), which collapses the probe drift on control-like
    # inputs to ~0.1 px and breaks the published control-zero.  Tying the
    # direction to a visible appearance parameter removes the ambiguity:
    # fast coherent drift becomes the optimal static-history prediction
    # for ANY ring-like input (the rated control maps to some duty and
    # drifts fast in that duty's direction — over the plausibility gate
    # either way).
    if ring_speed_cue and not ring_dir_cue:
        raise ValueError("ring_speed_cue needs ring_dir_cue (the duty "
                         "margin is the speed cue)")
    if ring_dir_cue:
        cue_side = jnp.sign(
            jax.random.uniform(jax.random.fold_in(ks[7], 1), ()) - 0.5
        )
        # moderate margin from the ambiguous 0.5 point.  Measured (v5g,
        # v5h): widening this to 0.15-0.35 makes the ring class's thin-
        # ring look converge on the rated wedge-ring stimuli themselves —
        # the rated CIRCLES images then read as rings and drift 2-4 px,
        # gating the whole circles family to 0.
        cue_mag = jax.random.uniform(
            jax.random.fold_in(ks[7], 2), (), minval=0.08, maxval=0.30
        )
        ring_duty = 0.5 + cue_side * cue_mag
    else:
        cue_side = None
        ring_duty = jnp.asarray(0.5, jnp.float32)
    if ring_speed_range is None:
        # control-like plain rings, STATIC (the v3 settling pressure)
        u_rings = jnp.broadcast_to(r[None] / ring_period, (T, h, w))
        ring_onset_val = jnp.asarray(0.0, jnp.float32)
    else:
        # plain rings in FAST unpredictable radial motion (v4, FPSI-like):
        # symmetric appearance carries no direction cue, so the converged
        # static-history prediction for control-like input is fast radial
        # drift — far over the 0.3 px plausibility gate, which is how the
        # published predictor zeroes the control (eigen_own_ratings.csv)
        ring_speed = jax.random.uniform(
            jax.random.fold_in(ks[6], 1), (),
            minval=ring_speed_range[0], maxval=ring_speed_range[1],
        )
        if ring_speed_cue:
            # v7 control anchor (VERDICT r4 weak #3): with a RANDOM ring
            # speed the closed-loop L1 optimum for a static ring history
            # drifts toward blur as training converges — the 20k-step
            # v6ab retrain's control drift fell back inside the 0.3 px
            # plausibility gate and the published control-zero died
            # (gallery/probe_v6ab20k.json).  Tying the speed to the SAME
            # visible duty cue that already determines the direction
            # (|duty - 0.5| in [0.08, 0.30] maps linearly onto
            # ring_speed_range) makes the whole ring continuation a
            # deterministic function of appearance: the L1-optimal
            # static-history prediction is the exact fast-moving
            # continuation at ANY training budget, so control-zero
            # becomes a trained property instead of a stopping-time
            # artifact.  Requires ring_dir_cue (the duty margin).
            cue_frac = jnp.clip((cue_mag - 0.08) / 0.22, 0.0, 1.0)
            ring_speed = (
                ring_speed_range[0]
                + (ring_speed_range[1] - ring_speed_range[0]) * cue_frac
            )
        if ring_dir_cue:
            ring_dir = cue_side  # appearance-determined (see ring_duty)
        else:
            ring_dir = jnp.sign(
                jax.random.uniform(jax.random.fold_in(ks[6], 2), ()) - 0.5
            )
        # Default (ring_onset=False): raw clock — ring motion is never
        # onset-delayed (v4 semantics: rings ALWAYS move, so a long static
        # ring history is out-of-distribution and the converged prediction
        # drifts fast — the control-zeroing mechanism).  ring_onset=True
        # (v5b experiment) shares the onset-gated clock so "static ring
        # history -> fast drift NOW" is itself in the training
        # distribution; measured on the rated gallery it does NOT restore
        # the control zero when the closed-loop loss also covers rings
        # (control 0.237 with tiny drifts everywhere) — the closed L1
        # pushes ring predictions toward blur/static.  Kept as a knob.
        t_raw = jnp.arange(T, dtype=jnp.float32)[:, None, None]
        if ring_onset_range is not None:
            # v5e: rings hold static for their OWN uniform onset window
            # (shorter than the cue window, so the post-onset fast frames
            # land in the OPEN region where they are graded), then drift
            # fast in the duty-cued direction.  Paired with prefix loss
            # masking (pretrain ring_mask_prefix) this supervises the
            # probe's control scenario directly: static ring history ->
            # fast drift NOW, with no competing "copy static rings"
            # gradient from the prefix frames.
            rlo, rhi = ring_onset_range
            ring_onset_val = jnp.floor(
                jax.random.uniform(
                    jax.random.fold_in(ks[8], 3), (),
                    minval=float(rlo), maxval=float(rhi) + 1.0,
                )
            )
            t_ring = jnp.maximum(t_raw - ring_onset_val, 0.0)
        elif ring_onset and onset_range is not None:
            t_ring = t
            ring_onset_val = onset
        else:
            t_ring = t_raw
            ring_onset_val = jnp.asarray(0.0, jnp.float32)
        u_rings = (r[None] - ring_dir * ring_speed * t_ring) / ring_period
    # static band masks for the rated-stimulus look (wedge rings separated
    # by white gaps / spoke segments): ring mask varies with r only, so it
    # is invariant under rotation; spoke mask varies with phi only, so it
    # is invariant under expansion — banding never fights the cue motion.
    # Under tang_radial the ring mask shares the wedge class's contracting
    # clock instead ((T, h, w)): the inward-moving ring gaps ARE that
    # class's visible motion.
    if tang_radial:
        u_ring_mask = (r[None] + speed * t) / ring_period
    else:
        u_ring_mask = r / ring_period
    mask_ring = u_ring_mask - jnp.floor(u_ring_mask)  # in [0,1)
    mask_spoke = phi * n_seg / (2 * jnp.pi)
    mask_spoke = mask_spoke - jnp.floor(mask_spoke)
    return (u_linear, u_tang, u_radial, u_rings, r, mask_ring, mask_spoke,
            ring_duty, onset, ring_onset_val)


def synthetic_cue_batch(
    key,
    batch,
    T,
    h,
    w,
    c,
    max_speed: float = 2.0,
    regime_probs=(0.15, 0.15, 0.15, 0.14, 0.14, 0.14, 0.13),
    cue_speed_range=(0.5, 2.5),
    max_onset: int = 0,
    move_prob: float = 1.0,
    cue_slow_range=None,
    cue_slow_frac: float = 0.0,
    onset_hazard: float = 0.0,
    ring_speed_range=None,
    band_prob: float = 0.0,
    onset_range=None,
    ring_onset: bool = False,
    ring_dir_cue: bool = False,
    ring_onset_range=None,
    cue_period_range=(12.0, 40.0),
    tang_radial: bool = False,
    tang_uniform: bool = False,
    cue_fine_speed_range=None,
    cue_fine_max_period: float = 12.0,
    ring_speed_cue: bool = False,
    return_regime: bool = False,
):
    """(batch, T, h, w, c) float32 cue sequences (v3).

    ``return_regime=True`` additionally returns the per-sequence regime
    ids (batch,) int32 and motion-onset frames (batch,) float32 — used to
    mask training-loss terms by regime and by pre-onset frame
    (e.g. closed-loop supervision on cue regimes only, or excluding the
    static ring prefix from the open-loop loss so "static rings" is never
    itself a supervised target).

    Regimes (sampled per-element with ``regime_probs``):
      0 smooth texture, static
      1 smooth texture, translating (v2 behaviour)
      2 plain symmetric rings, STATIC (control-like)
      3 linear asymmetric sawtooth, translating toward the ramp
      4 tangential sawtooth rings, rotating toward the ramp (with
        ``tang_radial``: same angular-asymmetric wedge look, but the ring
        structure contracts radially instead of rotating; with
        ``tang_uniform``: differential rotation at uniform px/frame across
        radius instead of rigid constant-omega rotation — see
        _phase_fields)
      5 radial sawtooth rings, expanding toward the ramp
      6 smooth texture x radial/tangential mask, static (settling pressure
        on circular smooth content)
    """

    def one(key):
        k_reg, k_tex, k_phase, k_col, k_con = jax.random.split(key, 5)
        regime = jax.random.choice(
            k_reg, 7, p=jnp.asarray(regime_probs, jnp.float32)
        )

        # -- smooth-texture branches (reuse v2 machinery) ---------------
        margin = int(max_speed * T) + 2
        vel = jax.random.uniform(
            jax.random.fold_in(k_tex, 1), (2,), minval=-max_speed,
            maxval=max_speed,
        )
        moving = (regime == 1).astype(jnp.float32)
        vel = vel * moving

        def smooth_chan(kc):
            tex = _smooth_texture(kc, h + 2 * margin, w + 2 * margin)

            def frame(t):
                return _sample_shifted(tex, vel[0] * t, vel[1] * t, h, w,
                                       margin)

            return jax.vmap(frame)(jnp.arange(T, dtype=jnp.float32))

        smooth = jnp.moveaxis(
            jax.vmap(smooth_chan)(jax.random.split(k_tex, c)), 0, -1
        )  # (T, h, w, c)

        # -- analytic phase-field branches -------------------------------
        (u_lin, u_tang, u_rad, u_rings, r, m_ring, m_spoke, ring_duty,
         onset, ring_onset_val) = _phase_fields(
            k_phase, T, h, w, cue_speed_range, max_onset, move_prob,
            cue_slow_range, cue_slow_frac, onset_hazard, ring_speed_range,
            onset_range, ring_onset, ring_dir_cue, ring_onset_range,
            cue_period_range, tang_radial, tang_uniform,
            cue_fine_speed_range, cue_fine_max_period, ring_speed_cue,
        )
        rise = jax.random.uniform(
            jax.random.fold_in(k_phase, 9), (), minval=0.7, maxval=0.9
        )
        f_tang = _asym_ramp(u_tang, rise)
        f_rad = _asym_ramp(u_rad, rise)
        if tang_radial:
            # the contracting ring gaps are the wedge class's visible
            # motion (the wedge field itself is static in phi), so the
            # ring mask is applied ALWAYS in this mode, with a thin white
            # gap like the rated stimuli; m_ring carries the onset-gated
            # inward clock ((T, h, w) — see _phase_fields)
            duty_t = jax.random.uniform(
                jax.random.fold_in(k_phase, 15), (), minval=0.6,
                maxval=0.85,
            )
            ring_keep_t = (m_ring < duty_t).astype(jnp.float32)
            if ring_keep_t.ndim == 2:
                ring_keep_t = ring_keep_t[None]
            f_tang = f_tang * ring_keep_t + (1.0 - ring_keep_t)
        if band_prob > 0.0:
            # rated-stimulus look: wedge rings separated by white gaps
            # (tangential regime, motion-invariant ring mask) / spoke
            # segments (radial regime, motion-invariant angular mask) —
            # gives the flow tracker strong 2-D corners ON the moving
            # elements, like the evolved EIGEN-images stimuli
            kb = jax.random.fold_in(k_phase, 11)
            banded = (
                jax.random.uniform(kb, ()) < band_prob
            ).astype(jnp.float32)
            duty = jax.random.uniform(
                jax.random.fold_in(kb, 1), (), minval=0.55, maxval=0.85
            )
            spoke_keep = (m_spoke < duty).astype(jnp.float32)[None]
            if not tang_radial:
                # (under tang_radial the ring mask was already applied
                # unconditionally above, on the moving clock)
                ring_keep = (m_ring < duty).astype(jnp.float32)[None]
                f_tang = jnp.where(
                    banded > 0, f_tang * ring_keep + (1 - ring_keep), f_tang
                )
            f_rad = jnp.where(
                banded > 0, f_rad * spoke_keep + (1 - spoke_keep), f_rad
            )
        if ring_speed_range is not None and band_prob > 0.0:
            # fast-moving rings share the banded wedge-ring LOOK of the
            # slow sawtooth regimes but with a SYMMETRIC triangle fill —
            # the only class discriminator left is the ramp asymmetry,
            # which is precisely the illusion cue the fitness oracle
            # probes (control-like symmetric fills -> fast, implausible;
            # asymmetric ramps -> slow, coherent)
            tri_spoke = 1.0 - jnp.abs(2.0 * m_spoke - 1.0)  # (h, w)
            ring_phase = u_rings - jnp.floor(u_rings)  # moving bands
            if ring_dir_cue:
                duty_r = ring_duty  # the duty IS the direction cue
            else:
                duty_r = jax.random.uniform(
                    jax.random.fold_in(k_phase, 13), (), minval=0.55,
                    maxval=0.85,
                )
            keep = (ring_phase < duty_r).astype(jnp.float32)
            f_rings = tri_spoke[None] * keep + (1.0 - keep)
        else:
            f_rings = _sym_rings(u_rings, ring_duty)
        fields = jnp.stack(
            [
                _asym_ramp(u_lin, rise),
                f_tang,
                f_rad,
                f_rings,
            ]
        )  # (4, T, h, w)
        # mask the aliased centre of polar patterns + bound the disc like
        # the stimuli (white surround)
        rmax = 0.48 * jnp.minimum(h, w)
        disc = ((r > 8.0) & (r < rmax)).astype(jnp.float32)[None]
        fields = jnp.stack(
            [
                fields[0],
                fields[1] * disc + (1 - disc),
                fields[2] * disc + (1 - disc),
                fields[3] * disc + (1 - disc),
            ]
        )
        value = jnp.where(
            regime == 3,
            fields[0],
            jnp.where(
                regime == 4,
                fields[1],
                jnp.where(regime == 5, fields[2], fields[3]),
            ),
        )  # (T, h, w)

        # color mapping: random per-channel affine ramps keep the sawtooth
        # structure in every channel (and in luminance)
        lo = jax.random.uniform(k_col, (c,), minval=0.0, maxval=0.35)
        hi = jax.random.uniform(
            jax.random.fold_in(k_col, 1), (c,), minval=0.65, maxval=1.0
        )
        patterned = lo + (hi - lo) * value[..., None]  # (T, h, w, c)

        # regime 6: smooth texture masked to the disc, static
        static_disc = smooth[:1] * disc[..., None] + (1 - disc[..., None])
        static_disc = jnp.broadcast_to(static_disc, smooth.shape)

        use_smooth = (regime <= 1).astype(jnp.float32)
        use_disc = (regime == 6).astype(jnp.float32)
        out = (
            use_smooth * smooth
            + use_disc * static_disc
            + (1 - use_smooth - use_disc) * patterned
        )
        # global contrast jitter
        gain = jax.random.uniform(k_con, (), minval=0.7, maxval=1.0)
        off = jax.random.uniform(
            jax.random.fold_in(k_con, 1), (), minval=0.0, maxval=0.3
        )
        # per-sequence motion onset for loss masking: the ring regime
        # follows its own (possibly zero) onset clock, the sawtooth
        # regimes the shared onset-gated clock
        eff_onset = jnp.where(regime == 2, ring_onset_val, onset)
        return (jnp.clip(out * gain + off * (1 - gain), 0.0, 1.0), regime,
                eff_onset)

    frames, regimes, onsets = jax.vmap(one)(jax.random.split(key, batch))
    if return_regime:
        return frames, regimes, onsets
    return frames

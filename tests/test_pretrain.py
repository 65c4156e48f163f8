"""Synthetic-data generator and pretraining smoke tests."""

import numpy as np

import jax

from evolutionary_illusion_generator_tpu.models.prednet.pretrain import pretrain
from evolutionary_illusion_generator_tpu.models.prednet.synthetic_data import (
    synthetic_cue_batch,
    synthetic_motion_batch,
)


class TestSyntheticData:
    def test_shapes_and_range(self):
        frames = synthetic_motion_batch(jax.random.PRNGKey(0), 3, 5, 24, 32, 1)
        assert frames.shape == (3, 5, 24, 32, 1)
        f = np.asarray(frames)
        assert f.min() >= 0.0 and f.max() <= 1.0

    def test_frames_actually_move(self):
        frames = np.asarray(
            synthetic_motion_batch(jax.random.PRNGKey(1), 2, 6, 24, 32, 1)
        )
        # consecutive frames differ (motion), but are correlated (texture)
        d01 = np.abs(frames[:, 1] - frames[:, 0]).mean()
        assert d01 > 1e-4
        a = frames[0, 0].ravel() - frames[0, 0].mean()
        b = frames[0, 1].ravel() - frames[0, 1].mean()
        corr = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert corr > 0.5

    def test_deterministic(self):
        a = synthetic_motion_batch(jax.random.PRNGKey(2), 1, 3, 16, 16, 1)
        b = synthetic_motion_batch(jax.random.PRNGKey(2), 1, 3, 16, 16, 1)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCueData:
    def test_shapes_and_range(self):
        frames = synthetic_cue_batch(jax.random.PRNGKey(0), 4, 5, 48, 64, 3)
        assert frames.shape == (4, 5, 48, 64, 3)
        f = np.asarray(frames)
        assert f.min() >= 0.0 and f.max() <= 1.0
        assert np.isfinite(f).all()

    def test_static_regimes_are_static(self):
        # regimes 0 (smooth static), 2 (plain rings), 6 (disc texture) must
        # not move — the settling pressure for control-like input
        for reg in (0, 2, 6):
            p = [0.0] * 7
            p[reg] = 1.0
            f = np.asarray(
                synthetic_cue_batch(
                    jax.random.PRNGKey(reg), 2, 4, 48, 64, 1,
                    regime_probs=tuple(p),
                )
            )
            assert np.abs(np.diff(f, axis=1)).max() < 1e-6, reg

    def test_cue_regimes_move_with_ramp_structure(self):
        # regimes 3/4/5: the asymmetric sawtooths must move every frame
        for reg in (3, 4, 5):
            p = [0.0] * 7
            p[reg] = 1.0
            f = np.asarray(
                synthetic_cue_batch(
                    jax.random.PRNGKey(reg), 2, 5, 64, 80, 1,
                    regime_probs=tuple(p),
                )
            )
            d = np.abs(np.diff(f, axis=1)).mean(axis=(2, 3, 4))
            assert (d > 1e-3).all(), (reg, d)

    def test_deterministic(self):
        a = synthetic_cue_batch(jax.random.PRNGKey(2), 2, 3, 32, 32, 1)
        b = synthetic_cue_batch(jax.random.PRNGKey(2), 2, 3, 32, 32, 1)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ring_speed_makes_rings_move(self):
        # v4: plain rings move every frame when ring_speed_range is given
        p = (0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0)
        f = np.asarray(
            synthetic_cue_batch(
                jax.random.PRNGKey(5), 3, 5, 64, 80, 1, regime_probs=p,
                ring_speed_range=(1.0, 2.5),
            )
        )
        d = np.abs(np.diff(f, axis=1)).mean(axis=(2, 3, 4))
        assert (d > 1e-3).all(), d

    def test_geometric_onset_leaves_some_windows_static(self):
        # with hazard p, about (1-p)^(T-1) of sawtooth sequences stay
        # static through the whole window
        p = (0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0)
        f = np.asarray(
            synthetic_cue_batch(
                jax.random.PRNGKey(6), 64, 6, 32, 40, 1, regime_probs=p,
                onset_hazard=0.2,
            )
        )
        moved = np.abs(np.diff(f, axis=1)).max(axis=(1, 2, 3, 4)) > 1e-6
        frac_static = 1.0 - moved.mean()
        # (1-0.2)^5 = 0.33; allow a wide band for 64 samples
        assert 0.1 < frac_static < 0.6, frac_static

    def test_move_prob_freezes_some_sawtooths(self):
        p = (0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0)
        f = np.asarray(
            synthetic_cue_batch(
                jax.random.PRNGKey(7), 64, 4, 32, 40, 1, regime_probs=p,
                move_prob=0.5,
            )
        )
        moved = np.abs(np.diff(f, axis=1)).max(axis=(1, 2, 3, 4)) > 1e-6
        assert 0.25 < moved.mean() < 0.75, moved.mean()


def test_pretrain_v3_smoke():
    params, loss = pretrain(
        (1, 4), steps=4, batch=2, T=4, h=24, w=32, lr=5e-3, verbose=False,
        data="v3",
    )
    assert np.isfinite(loss)


def test_pretrain_reduces_loss():
    params, loss = pretrain(
        (1, 4), steps=6, batch=2, T=4, h=24, w=32, lr=5e-3, verbose=False
    )
    assert np.isfinite(loss)
    # compare against the untrained loss on a fixed batch
    from evolutionary_illusion_generator_tpu.models.prednet import init_params
    from evolutionary_illusion_generator_tpu.models.prednet.train import (
        prednet_loss,
    )

    frames = synthetic_motion_batch(jax.random.PRNGKey(9), 2, 4, 24, 32, 1)
    before = float(prednet_loss(init_params(jax.random.PRNGKey(0), (1, 4)), frames))
    after = float(prednet_loss(params, frames))
    assert after < before


def test_return_regime_ids():
    from evolutionary_illusion_generator_tpu.models.prednet.synthetic_data import (
        synthetic_cue_batch,
    )

    frames, regimes, onsets = synthetic_cue_batch(
        jax.random.PRNGKey(3), 16, 4, 24, 32, 1, return_regime=True
    )
    assert frames.shape == (16, 4, 24, 32, 1)
    assert regimes.shape == (16,)
    assert ((np.asarray(regimes) >= 0) & (np.asarray(regimes) <= 6)).all()
    assert onsets.shape == (16,)
    # no onset knobs: every sequence's clock starts at 0
    np.testing.assert_array_equal(np.asarray(onsets), 0.0)
    # same key without the flag: identical frames (regime sampling shared)
    frames2 = synthetic_cue_batch(jax.random.PRNGKey(3), 16, 4, 24, 32, 1)
    np.testing.assert_array_equal(np.asarray(frames), np.asarray(frames2))


def test_closed_mask_zeroes_ring_contribution():
    """A sequence masked out of the closed term must not affect the loss:
    all-ones mask == None, and flipping a masked sequence's tail frames
    leaves the masked loss unchanged."""
    from evolutionary_illusion_generator_tpu.models.prednet import init_params
    from evolutionary_illusion_generator_tpu.models.prednet.train import (
        prednet_seq_loss,
    )
    import jax.numpy as jnp

    params = init_params(jax.random.PRNGKey(0), (1, 4))
    frames = jax.random.uniform(jax.random.PRNGKey(1), (3, 6, 24, 32, 1))
    base = prednet_seq_loss(params, frames, t_open=4, closed_weight=5.0)
    ones = prednet_seq_loss(
        params, frames, t_open=4, closed_weight=5.0,
        closed_mask=jnp.ones((3,)),
    )
    np.testing.assert_allclose(float(base), float(ones), rtol=1e-6)

    mask = jnp.asarray([1.0, 0.0, 1.0])
    m0 = prednet_seq_loss(
        params, frames, t_open=4, closed_weight=5.0, closed_mask=mask
    )
    # perturb ONLY the masked sequence's closed-loop target frames: the
    # closed term must ignore it (the open-loop prefix is untouched)
    frames_p = frames.at[1, 4:].set(1.0 - frames[1, 4:])
    m1 = prednet_seq_loss(
        params, frames_p, t_open=4, closed_weight=5.0, closed_mask=mask
    )
    np.testing.assert_allclose(float(m0), float(m1), rtol=1e-6)


def test_motion_hinge_is_nonnegative_and_linear():
    """The closed motion-energy hinge only ever ADDS loss, scales linearly
    in motion_weight, and vanishes when the motion mask is all-zero."""
    from evolutionary_illusion_generator_tpu.models.prednet import init_params
    from evolutionary_illusion_generator_tpu.models.prednet.train import (
        prednet_seq_loss,
    )
    import jax.numpy as jnp

    params = init_params(jax.random.PRNGKey(0), (1, 4))
    frames = jax.random.uniform(jax.random.PRNGKey(2), (3, 6, 24, 32, 1))
    kw = dict(t_open=4, closed_weight=5.0)
    base = float(prednet_seq_loss(params, frames, **kw))
    m1 = float(
        prednet_seq_loss(params, frames, motion_weight=1.0, **kw)
    )
    m2 = float(
        prednet_seq_loss(params, frames, motion_weight=2.0, **kw)
    )
    # untrained net on moving targets: hinge strictly positive
    assert m1 > base
    np.testing.assert_allclose(m2 - m1, m1 - base, rtol=1e-4)

    z = float(
        prednet_seq_loss(
            params, frames, motion_weight=1.0,
            motion_mask=jnp.zeros((3,)), **kw
        )
    )
    np.testing.assert_allclose(z, base, rtol=1e-6)


def test_motion_hinge_mask_selects_sequences():
    """Only sequences weighted by motion_mask contribute to the hinge:
    perturbing an excluded sequence's closed targets leaves the hinge
    delta unchanged."""
    from evolutionary_illusion_generator_tpu.models.prednet import init_params
    from evolutionary_illusion_generator_tpu.models.prednet.train import (
        prednet_seq_loss,
    )
    import jax.numpy as jnp

    params = init_params(jax.random.PRNGKey(0), (1, 4))
    frames = jax.random.uniform(jax.random.PRNGKey(3), (3, 6, 24, 32, 1))
    mask = jnp.asarray([0.0, 1.0, 0.0])  # hinge watches seq 1 only
    kw = dict(t_open=4, closed_weight=0.0)

    def hinge(fr):
        with_h = prednet_seq_loss(
            params, fr, motion_weight=1.0, motion_mask=mask, **kw
        )
        without = prednet_seq_loss(params, fr, **kw)
        return float(with_h) - float(without)

    h0 = hinge(frames)
    # freeze seq-0's closed tail (a hinge-visible change IF seq 0 counted)
    frames_p = frames.at[0, 4:].set(frames[0, 3])
    h1 = hinge(frames_p)
    np.testing.assert_allclose(h0, h1, rtol=1e-5)
    # freezing the WATCHED sequence's tail kills its target motion, so
    # the hinge on it can only shrink
    frames_w = frames.at[1, 4:].set(frames[1, 3])
    h2 = hinge(frames_w)
    assert h2 <= h0 + 1e-7


def test_pretrain_ring_motion_smoke():
    params, loss = pretrain(
        (1, 4), steps=3, batch=4, T=4, h=24, w=32, verbose=False,
        closed_frames=2, closed_weight=5.0, ring_motion_weight=3.0,
        regime_probs=(0, 0.25, 0.2, 0.15, 0.2, 0.2, 0),
        onset_range=(2, 3), ring_speed_range=(1.0, 2.5),
    )
    assert np.isfinite(loss)


def test_pretrain_masked_closed_smoke():
    params, loss = pretrain(
        (1, 4), steps=3, batch=4, T=4, h=24, w=32, verbose=False,
        closed_frames=2, closed_weight=5.0, closed_exclude_rings=True,
        regime_probs=(0, 0.25, 0.2, 0.15, 0.2, 0.2, 0),
        onset_range=(2, 3), ring_speed_range=(1.0, 2.5),
    )
    assert np.isfinite(loss)


def test_ring_dir_cue_ties_direction_to_duty():
    """v5e: with ring_dir_cue the ring drift direction is a deterministic
    function of the duty cycle (duty > 0.5 -> expand, i.e. iso-phase radius
    grows, so u at fixed r decreases over time)."""
    from evolutionary_illusion_generator_tpu.models.prednet.synthetic_data import (
        _phase_fields,
    )
    import jax.numpy as jnp

    for i in range(8):
        out = _phase_fields(
            jax.random.PRNGKey(100 + i), 8, 48, 64,
            ring_speed_range=(1.5, 1.5), ring_dir_cue=True,
        )
        u_rings, duty = out[3], out[7]
        du = float(jnp.mean(u_rings[-1] - u_rings[-2]))
        assert abs(float(duty) - 0.5) > 0.05  # sampled away from ambiguity
        assert (float(duty) > 0.5) == (du < 0)


def test_ring_onset_range_gates_ring_clock():
    """Rings hold static for their own onset window, then drift; the
    per-sequence onset is reported for loss masking."""
    from evolutionary_illusion_generator_tpu.models.prednet.synthetic_data import (
        _phase_fields, synthetic_cue_batch,
    )
    import jax.numpy as jnp

    out = _phase_fields(
        jax.random.PRNGKey(5), 10, 48, 64, ring_speed_range=(2.0, 2.0),
        ring_dir_cue=True, ring_onset_range=(4, 4),
    )
    u = out[3]
    assert float(jnp.max(jnp.abs(u[3] - u[0]))) < 1e-6
    assert float(jnp.max(jnp.abs(u[6] - u[3]))) > 1e-2
    frames, regimes, onsets = synthetic_cue_batch(
        jax.random.PRNGKey(1), 24, 6, 24, 32, 1,
        regime_probs=(0, 0.2, 0.4, 0.1, 0.15, 0.15, 0),
        ring_speed_range=(1.0, 2.5), ring_dir_cue=True,
        ring_onset_range=(2, 4), return_regime=True,
    )
    r, o = np.asarray(regimes), np.asarray(onsets)
    assert (o[r != 2] == 0).all()
    assert ((o[r == 2] >= 2) & (o[r == 2] <= 4)).all()


def test_open_mask_all_ones_matches_unmasked():
    from evolutionary_illusion_generator_tpu.models.prednet import init_params
    from evolutionary_illusion_generator_tpu.models.prednet.train import (
        prednet_seq_loss,
    )
    import jax.numpy as jnp

    params = init_params(jax.random.PRNGKey(0), (1, 4))
    frames = jax.random.uniform(jax.random.PRNGKey(2), (3, 6, 24, 32, 1))
    base = float(prednet_seq_loss(params, frames, t_open=4, closed_weight=5.0))
    ones = float(prednet_seq_loss(
        params, frames, t_open=4, closed_weight=5.0,
        open_mask=jnp.ones((3, 4)),
    ))
    assert abs(base - ones) < 1e-5


def test_open_mask_drops_masked_frames_from_open_term():
    """With the closed term ~off, fully masking one sequence's open frames
    must equal removing its open contribution: loss over the remaining
    sequences only."""
    from evolutionary_illusion_generator_tpu.models.prednet import init_params
    from evolutionary_illusion_generator_tpu.models.prednet.train import (
        prednet_seq_loss,
    )
    import jax.numpy as jnp

    params = init_params(jax.random.PRNGKey(0), (1, 4))
    frames = jax.random.uniform(jax.random.PRNGKey(2), (3, 6, 24, 32, 1))
    mask0 = jnp.ones((3, 4)).at[0].set(0.0)
    masked = float(prednet_seq_loss(
        params, frames, t_open=4, closed_weight=0.0, open_mask=mask0,
    ))
    sub = float(prednet_seq_loss(
        params, frames[1:], t_open=4, closed_weight=0.0,
        open_mask=jnp.ones((2, 4)),
    ))
    assert abs(masked - sub) < 1e-5


def test_pretrain_v5e_smoke():
    params, loss = pretrain(
        (1, 4), steps=3, batch=4, T=4, h=24, w=32, verbose=False,
        closed_frames=2, closed_weight=5.0, ring_motion_weight=3.0,
        regime_probs=(0, 0.25, 0.2, 0.15, 0.2, 0.2, 0),
        onset_range=(2, 3), ring_speed_range=(1.0, 2.5),
        ring_dir_cue=True, ring_onset_range=(1, 2), ring_mask_prefix=True,
    )
    assert np.isfinite(loss)


def test_pretrain_v5f_rings_in_closed_l1_smoke():
    """v5f: ring_mask_prefix without closed_exclude_rings — rings are
    closed-L1-supervised toward their true fast continuation (sound under
    ring_dir_cue), with the static open prefix masked out of the E-loss."""
    params, loss = pretrain(
        (1, 4), steps=3, batch=4, T=4, h=24, w=32, verbose=False,
        closed_frames=2, closed_weight=5.0,
        regime_probs=(0, 0.25, 0.2, 0.15, 0.2, 0.2, 0),
        onset_range=(3, 4), ring_speed_range=(1.2, 2.0),
        ring_dir_cue=True, ring_onset_range=(4, 4), ring_mask_prefix=True,
    )
    assert np.isfinite(loss)


def test_pretrain_ring_closed_scale_smoke():
    """v5h: per-class closed weights — rings at a fraction of the cue
    closed weight (anti-contraction needs only >0.3 px control drift)."""
    params, loss = pretrain(
        (1, 4), steps=3, batch=4, T=4, h=24, w=32, verbose=False,
        closed_frames=2, closed_weight=5.0,
        regime_probs=(0, 0.25, 0.2, 0.15, 0.2, 0.2, 0),
        onset_range=(3, 4), ring_speed_range=(1.2, 2.0),
        ring_dir_cue=True, ring_onset_range=(4, 4), ring_mask_prefix=True,
        ring_closed_scale=0.25,
    )
    assert np.isfinite(loss)


def test_pretrain_checkpoint_resume_bitwise(tmp_path):
    """A run killed after a checkpoint and restarted must converge to the
    BITWISE-identical result of an uninterrupted run: the checkpoint holds
    params (f32, lossless from bf16), the exact opt-state leaves, and the
    RNG key at an iteration boundary, so the resumed run replays the same
    data stream through the same train step (stall-watchdog restarts of
    long TPU pretrains lose at most save_every steps, not the whole run)."""
    import os

    ck = str(tmp_path / "ck.npz")
    kw = dict(steps=4, batch=2, T=3, h=16, w=16, verbose=False)
    p_full, _ = pretrain((1, 2, 4), **kw)
    # full run that also wrote a mid-run checkpoint (state after step 2)
    pretrain((1, 2, 4), checkpoint=ck, save_every=2, **kw)
    assert os.path.exists(ck)
    # "restarted" run: resumes at step 2, runs 2-3
    p_res, _ = pretrain((1, 2, 4), checkpoint=ck, save_every=2, **kw)
    for full, res in zip(p_full, p_res):
        for name in full:
            np.testing.assert_array_equal(
                np.asarray(jax.device_get(full[name]), np.float32),
                np.asarray(jax.device_get(res[name]), np.float32),
                err_msg=name,
            )


def test_pretrain_stale_checkpoint_ignored(tmp_path):
    """A checkpoint from a different model shape must be ignored, not crash."""
    import os

    ck = str(tmp_path / "ck.npz")
    kw = dict(steps=3, batch=2, T=3, h=16, w=16, verbose=False)
    pretrain((1, 2, 4), checkpoint=ck, save_every=1, **kw)
    assert os.path.exists(ck)
    params, loss = pretrain((1, 4), checkpoint=ck, save_every=0, **kw)
    assert np.isfinite(loss)


def test_cue_period_range_changes_pattern_scale():
    """Lower cue periods must produce visibly finer sawtooth patterns."""
    from evolutionary_illusion_generator_tpu.models.prednet.synthetic_data import (
        synthetic_cue_batch,
    )

    def mean_grad(period_range):
        # all-linear-sawtooth batch so the period is the only scale knob
        f = np.asarray(
            synthetic_cue_batch(
                jax.random.PRNGKey(0), 4, 3, 48, 64, 1,
                regime_probs=(0, 0, 0, 1.0, 0, 0, 0),
                cue_period_range=period_range,
            )
        )
        return np.abs(np.diff(f[:, 0, :, :, 0], axis=-1)).mean()

    assert mean_grad((5.0, 7.0)) > 1.8 * mean_grad((30.0, 40.0))


def test_cue_period_pretrain_smoke():
    params, loss = pretrain(
        (1, 4), steps=2, batch=2, T=4, h=24, w=32, verbose=False,
        closed_frames=2, closed_weight=5.0,
        regime_probs=(0, 0.25, 0.2, 0.15, 0.2, 0.2, 0),
        onset_range=(3, 4), ring_speed_range=(1.2, 2.0),
        ring_dir_cue=True, ring_onset_range=(4, 4), ring_mask_prefix=True,
        ring_closed_scale=0.5, cue_period_range=(6.0, 40.0),
    )
    assert np.isfinite(loss)


def test_tang_radial_contracts_instead_of_rotating():
    """v6d mode: the wedge-ring class's ring structure drifts radially
    inward while the angular wedge layout stays put (synthetic_data.py
    ``tang_radial``; rationale measured in BENCH_NOTES "v6ab")."""
    import jax

    from evolutionary_illusion_generator_tpu.models.prednet.synthetic_data import (
        synthetic_cue_batch,
    )

    p = (0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0)  # tangential regime only
    h = w = 64
    T = 6
    f = np.asarray(
        synthetic_cue_batch(
            jax.random.PRNGKey(7), 8, T, h, w, 1,
            regime_probs=p, cue_speed_range=(1.0, 1.0), tang_radial=True,
        )
    )[..., 0]
    # moves at all
    assert np.abs(np.diff(f, axis=1)).max() > 1e-3

    yy, xx = np.mgrid[0:h, 0:w]
    inward_votes = 0
    rot_zero_votes = 0
    for b in range(f.shape[0]):
        # the per-sample centre is jittered; locate it by the darkest ring
        # gradient centroid — close enough to use the frame's mass centre
        # of the inverted image inside the disc
        img0, img1 = f[b, 0], f[b, T - 1]
        cy, cx = h / 2, w / 2
        r = np.hypot(yy - cy, xx - cx)
        # radial profile: mean value per 1-px radius bin
        nbins = int(r.max()) + 1
        def prof(img):
            s = np.bincount(r.astype(int).ravel(), img.ravel(), nbins)
            c = np.bincount(r.astype(int).ravel(), minlength=nbins)
            return s / np.maximum(c, 1)
        p0, p1 = prof(img0), prof(img1)
        lo, hi = 10, 28  # inside the disc, away from centre mask
        # inward contraction by s px/frame: content at radius r at t came
        # from r + s*t at 0 — the late profile matches the early one
        # sampled OUTWARD
        best = min(
            range(0, 9),
            key=lambda s: np.mean((p1[lo:hi] - p0[lo + s:hi + s]) ** 2),
        )
        if best >= 2:
            inward_votes += 1
        # no rotation: angular profile at a fixed radius band best aligns
        # at zero circular shift
        band = (r >= 16) & (r < 24)
        nang = 72
        ang = ((np.arctan2(yy - cy, xx - cx) + np.pi) / (2 * np.pi) * nang)
        ang = np.minimum(ang.astype(int), nang - 1)
        def aprof(img):
            s = np.bincount(ang[band], img[band], nang)
            c = np.bincount(ang[band], minlength=nang)
            return s / np.maximum(c, 1)
        a0, a1 = aprof(img0), aprof(img1)
        errs = [np.mean((a1 - np.roll(a0, k)) ** 2) for k in range(nang)]
        kbest = int(np.argmin(errs))
        if kbest == 0 or kbest >= nang - 1:
            rot_zero_votes += 1
    assert inward_votes >= 5, inward_votes
    assert rot_zero_votes >= 5, rot_zero_votes


def test_tang_uniform_phase_rate_scales_inverse_radius():
    """``tang_uniform``: the wedge class's per-pixel temporal phase rate
    is proportional to 1/r (uniform px/frame drift at every ring), where
    the default rigid rotation's rate is radius-constant (so inner rings
    move at omega*r px/frame — the measured sub-noise inner-band tail,
    BENCH_NOTES "v6e")."""
    from evolutionary_illusion_generator_tpu.models.prednet.synthetic_data import (
        _phase_fields,
    )

    h = w = 64

    def rate_ratio(tang_uniform):
        # fixed speed so the only radius dependence is the formulation's
        (_, u_tang, *_rest) = _phase_fields(
            jax.random.PRNGKey(3), 3, h, w, (1.0, 1.0),
            tang_uniform=tang_uniform,
        )
        u = np.asarray(u_tang)
        rate = np.abs(u[1] - u[0])  # per-pixel |d phase / d t|
        yy, xx = np.mgrid[0:h, 0:w]
        # the centre is jittered by up to h/8; bands at r-from-image-centre
        # 12-16 vs 24-28 stay ordered in true radius regardless
        r = np.hypot(yy - h / 2, xx - w / 2)
        inner = rate[(r >= 12) & (r < 16)].mean()
        outer = rate[(r >= 24) & (r < 28)].mean()
        return inner / outer

    # default rigid rotation: rate constant across radius (ratio ~ 1)
    assert 0.8 < rate_ratio(False) < 1.25
    # uniform-speed differential rotation: inner rate ~ (24..28)/(12..16)
    # times the outer one
    assert rate_ratio(True) > 1.4


def test_tang_uniform_smoke_and_exclusivity():
    params, loss = pretrain(
        (1, 4), steps=2, batch=2, T=4, h=24, w=32, verbose=False,
        regime_probs=(0, 0, 0, 0, 1.0, 0, 0), tang_uniform=True,
    )
    assert np.isfinite(loss)
    import pytest

    with pytest.raises(ValueError):
        pretrain((1, 4), steps=1, batch=1, T=4, h=24, w=32, verbose=False,
                 tang_radial=True, tang_uniform=True)


def test_ring_speed_cue_determines_speed_from_duty():
    """v7 control anchor: with ring_speed_cue the ring speed is a
    deterministic function of the duty-cue magnitude (|duty-0.5| in
    [0.08, 0.30] maps linearly onto ring_speed_range), so the whole ring
    continuation is appearance-determined and the L1 optimum cannot drift
    toward blur with training budget (VERDICT r4 weak #3)."""
    from evolutionary_illusion_generator_tpu.models.prednet.synthetic_data import (
        _phase_fields,
    )
    import jax.numpy as jnp

    lo, hi = 1.0, 2.0
    for i in range(8):
        out = _phase_fields(
            jax.random.PRNGKey(300 + i), 8, 48, 64,
            ring_speed_range=(lo, hi), ring_dir_cue=True,
            ring_speed_cue=True,
        )
        u_rings, r, duty = out[3], out[4], out[7]
        # u_rings[0] == r / ring_period exactly (t=0), recover the period
        period = float(r[20, 20] / u_rings[0][20, 20])
        du = float(jnp.mean(u_rings[-1] - u_rings[-2]))
        speed_obs = abs(du) * period
        cue_mag = abs(float(duty) - 0.5)
        expected = lo + (hi - lo) * min(max((cue_mag - 0.08) / 0.22, 0.0), 1.0)
        assert abs(speed_obs - expected) < 1e-3, (i, speed_obs, expected)
        # direction still follows the duty side
        assert (float(duty) > 0.5) == (du < 0)


def test_ring_speed_cue_requires_dir_cue():
    from evolutionary_illusion_generator_tpu.models.prednet.synthetic_data import (
        _phase_fields,
    )
    import pytest

    with pytest.raises(ValueError, match="ring_speed_cue"):
        _phase_fields(
            jax.random.PRNGKey(0), 4, 16, 16,
            ring_speed_range=(1.0, 2.0), ring_speed_cue=True,
        )


def test_cue_fine_speed_band_applies_below_threshold():
    """v7 weak-tail lever: sawtooths with period < cue_fine_max_period
    draw their speed from the fine band; coarser ones keep the base band."""
    from evolutionary_illusion_generator_tpu.models.prednet.synthetic_data import (
        _phase_fields,
    )
    import jax.numpy as jnp

    for i, (period_range, want) in enumerate(
        [((6.0, 6.0), 0.5), ((40.0, 40.0), 0.1)]
    ):
        out = _phase_fields(
            jax.random.PRNGKey(400 + i), 6, 48, 64,
            speed_range=(0.1, 0.1), cue_period_range=period_range,
            cue_fine_speed_range=(0.5, 0.5), cue_fine_max_period=12.0,
        )
        u_rad = out[2]
        period = period_range[0]
        du = float(jnp.mean(u_rad[-1] - u_rad[-2]))
        speed_obs = abs(du) * period
        assert abs(speed_obs - want) < 1e-3, (period, speed_obs, want)


def test_cue_motion_hinge_masks_and_sign():
    """v7 pixelwise amplitude hinge: nonnegative, zero under a zero mask,
    and identical to the base loss at weight 0."""
    from evolutionary_illusion_generator_tpu.models.prednet import init_params
    from evolutionary_illusion_generator_tpu.models.prednet.train import (
        prednet_seq_loss,
    )
    import jax.numpy as jnp

    params = init_params(jax.random.PRNGKey(0), (1, 4))
    frames = jax.random.uniform(jax.random.PRNGKey(2), (3, 6, 24, 32, 1))
    base = float(prednet_seq_loss(params, frames, t_open=4, closed_weight=5.0))
    zero_mask = float(prednet_seq_loss(
        params, frames, t_open=4, closed_weight=5.0,
        cue_motion_weight=3.0, cue_motion_mask=jnp.zeros((3,)),
    ))
    assert zero_mask == base
    hinged = float(prednet_seq_loss(
        params, frames, t_open=4, closed_weight=5.0,
        cue_motion_weight=3.0, cue_motion_mask=jnp.ones((3,)),
    ))
    assert hinged >= base


def test_pretrain_v7_levers_smoke():
    """All three v7 levers through the full pretrain step builder."""
    params, loss = pretrain(
        [1, 4], steps=2, batch=2, T=5, h=16, w=16, verbose=False,
        regime_probs=(0, 0.25, 0.25, 0.2, 0.15, 0.15, 0),
        ring_speed_range=(1.2, 2.0), onset_range=(3, 4),
        closed_frames=2, closed_weight=5.0, ring_dir_cue=True,
        ring_onset_range=(4, 4), ring_mask_prefix=True,
        ring_closed_scale=0.5, cue_speed_range=(0.10, 0.14),
        cue_period_range=(6.0, 40.0),
        cue_fine_speed_range=(0.14, 0.18), ring_speed_cue=True,
        cue_motion_weight=1.0,
    )
    assert np.isfinite(loss)


def test_band_prob_adds_white_gaps_and_preserves_plumbing():
    """band_prob (the rated-stimulus wedge-ring look, shipped by the v7band
    recipe) must only restyle the PATTERN: same regime/onset stream as the
    unbanded draw (banding keys are fold_ins, not stream consumers), white
    separator gaps appear, frames stay in [0, 1]."""
    from evolutionary_illusion_generator_tpu.models.prednet.synthetic_data import (
        synthetic_cue_batch,
    )

    kwargs = dict(
        batch=16, T=6, h=48, w=64, c=1,
        regime_probs=(0, 0.25, 0.2, 0.15, 0.2, 0.2, 0),
        ring_speed_range=(1.2, 2.0), onset_range=(3, 4),
        ring_dir_cue=True, ring_onset_range=(4, 4),
        cue_speed_range=(0.10, 0.14), cue_period_range=(6.0, 40.0),
        return_regime=True,
    )
    f0, r0, o0 = synthetic_cue_batch(
        jax.random.PRNGKey(7), band_prob=0.0, **kwargs
    )
    f1, r1, o1 = synthetic_cue_batch(
        jax.random.PRNGKey(7), band_prob=1.0, **kwargs
    )
    assert np.array_equal(np.asarray(r0), np.asarray(r1))
    assert np.array_equal(np.asarray(o0), np.asarray(o1))
    f0, f1 = np.asarray(f0), np.asarray(f1)
    assert np.isfinite(f1).all()
    assert f1.min() >= 0.0 and f1.max() <= 1.0
    # white separator gaps: banding fills the masked-out area with the
    # pattern's white level, so the fraction of pixels AT the per-sequence
    # maximum (flat gap plateaus, robust to the random gain/offset) rises
    def plateau_frac(f):
        mx = f.max(axis=(1, 2, 3, 4), keepdims=True)
        return float((f >= mx - 1e-3).mean())

    p0, p1 = plateau_frac(f0), plateau_frac(f1)
    assert p1 > p0 + 0.02, (p0, p1)


def test_pretrain_init_weights_warm_start(tmp_path):
    """--init_weights resumes from a save_params npz: the warm-started
    params must differ from a cold start at step 0 (i.e. actually loaded)
    and train to a finite loss."""
    from evolutionary_illusion_generator_tpu.models.prednet import init_params
    from evolutionary_illusion_generator_tpu.models.prednet.loader import (
        load_params,
        save_params,
    )

    params_a, _ = pretrain(
        (1, 4), steps=3, batch=2, T=4, h=24, w=32, lr=5e-3, verbose=False,
        data="v3",
    )
    src = str(tmp_path / "warm.npz")
    save_params(params_a, src)
    params_b, loss = pretrain(
        (1, 4), steps=2, batch=2, T=4, h=24, w=32, lr=5e-3, verbose=False,
        data="v3", init_weights=src,
    )
    assert np.isfinite(loss)
    # warm start must have taken: one fresh-init layer-0 kernel differs
    import jax

    cold = init_params(jax.random.PRNGKey(0), (1, 4))
    loaded = load_params(src, dtype=cold[0][next(iter(cold[0]))].dtype)
    k0 = next(iter(cold[0]))
    assert not np.allclose(
        np.asarray(cold[0][k0], np.float32),
        np.asarray(loaded[0][k0], np.float32),
    )
    assert all(
        np.asarray(la[k]).shape == np.asarray(lb[k]).shape
        for la, lb in zip(params_a, params_b) for k in la
    )

"""Optical-flow tests: known-displacement recovery + OpenCV cross-check."""

import numpy as np
import pytest

import jax.numpy as jnp

from evolutionary_illusion_generator_tpu.ops.flow import (
    FlowConfig,
    batched_flow,
    flow_vectors,
    shi_tomasi_corners,
    to_gray,
)

cv2 = pytest.importorskip("cv2")


def textured_image(h=120, w=160, seed=0):
    """Smooth random texture with strong corners."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (h // 8, w // 8))
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    return np.clip(img, 0, 1).astype(np.float32)


def shift_image(img, dx, dy):
    """Subpixel shift via affine warp (content moves by +dx, +dy)."""
    m = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(
        img, m, (img.shape[1], img.shape[0]), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_REFLECT,
    )


class TestCorners:
    def test_detects_corners_of_checkerboard(self):
        img = np.zeros((64, 64), np.float32)
        img[16:48, 16:48] = 1.0
        pos, mask = shi_tomasi_corners(jnp.asarray(img), max_corners=16, border=4)
        pos = np.asarray(pos)[np.asarray(mask)]
        assert len(pos) >= 4
        # the four strongest corners are near the square's corners
        square_corners = np.array([[16, 16], [47, 16], [16, 47], [47, 47]])
        for sc in square_corners:
            d = np.min(np.linalg.norm(pos - sc, axis=1))
            assert d <= 3.0, (sc, pos[:8])

    def test_mask_excludes_flat_regions(self):
        img = jnp.zeros((64, 64))
        pos, mask = shi_tomasi_corners(img, max_corners=16)
        assert not bool(np.any(np.asarray(mask)))


class TestLK:
    @pytest.mark.parametrize("shift", [(1.0, 0.0), (0.0, -1.5), (2.3, 1.7)])
    def test_recovers_uniform_translation(self, shift):
        dx, dy = shift
        img0 = textured_image()
        img1 = shift_image(img0, dx, dy)
        vec, mask = flow_vectors(jnp.asarray(img0), jnp.asarray(img1))
        vec = np.asarray(vec)[np.asarray(mask)]
        assert len(vec) >= 20
        med = np.median(vec[:, 2:4], axis=0)
        np.testing.assert_allclose(med, [dx, dy], atol=0.25)

    def test_matches_opencv_at_same_corners(self):
        img0 = textured_image(seed=3)
        img1 = shift_image(img0, 1.3, -0.8)
        vec, mask = flow_vectors(jnp.asarray(img0), jnp.asarray(img1))
        vec = np.asarray(vec)[np.asarray(mask)]
        pts = vec[:, :2].astype(np.float32).reshape(-1, 1, 2)
        img0_u8 = (img0 * 255).astype(np.uint8)
        img1_u8 = (img1 * 255).astype(np.uint8)
        nxt, st, _ = cv2.calcOpticalFlowPyrLK(
            img0_u8, img1_u8, pts, None, winSize=(21, 21), maxLevel=2
        )
        cv_flow = (nxt - pts).reshape(-1, 2)
        st = st.reshape(-1).astype(bool)
        assert st.sum() >= 20
        diff = np.linalg.norm(vec[st, 2:4] - cv_flow[st], axis=1)
        # median agreement within a tenth of a pixel; allow a few outliers
        assert np.median(diff) < 0.1, np.median(diff)
        assert np.percentile(diff, 90) < 0.5

    def test_batched_matches_single(self):
        img0a = textured_image(seed=1)
        img0b = textured_image(seed=2)
        img1a = shift_image(img0a, 1.0, 0.5)
        img1b = shift_image(img0b, -0.5, 1.0)
        f0 = jnp.stack([img0a, img0b])[..., None]
        f1 = jnp.stack([img1a, img1b])[..., None]
        bvec, bmask = batched_flow(f0, f1)
        for i, (i0, i1) in enumerate([(img0a, img1a), (img0b, img1b)]):
            svec, smask = flow_vectors(jnp.asarray(i0), jnp.asarray(i1))
            np.testing.assert_allclose(
                np.asarray(bvec[i]), np.asarray(svec), atol=1e-5
            )
            np.testing.assert_array_equal(np.asarray(bmask[i]), np.asarray(smask))

    def test_static_pair_zero_flow(self):
        img0 = textured_image(seed=5)
        vec, mask = flow_vectors(jnp.asarray(img0), jnp.asarray(img0))
        vec = np.asarray(vec)[np.asarray(mask)]
        assert len(vec) > 0
        assert np.max(np.abs(vec[:, 2:4])) < 0.05


class TestFileApi:
    def test_lucas_kanade_contract(self, tmp_path):
        from evolutionary_illusion_generator_tpu.ops.flow import lucas_kanade
        from evolutionary_illusion_generator_tpu.utils.image_io import save_image

        img0 = textured_image(seed=7)
        img1 = shift_image(img0, 1.0, 0.0)
        p0 = str(tmp_path / "a.png")
        p1 = str(tmp_path / "b.png")
        save_image(img0[..., None], p0)
        save_image(img1[..., None], p1)
        overlay = str(tmp_path / "flow.png")
        res = lucas_kanade(p0, p1, str(tmp_path), save=True, save_name=overlay)
        assert res["vectors"], "expected flow vectors"
        v = np.asarray(res["vectors"])
        assert v.shape[1] == 4
        med = np.median(v[:, 2], axis=0)
        assert abs(med - 1.0) < 0.35
        assert (tmp_path / "flow.png").exists()


class TestBf16LK:
    """Opt-in bfloat16 window path (FlowConfig.lk_dtype) vs the f32 default.

    The bf16 path quantizes window gathers/products only (solve, flow
    state, accumulation and the residual gate stay f32 — ops/flow/lk.py),
    so tracked flow must agree with f32 to well under the 0.1 px OpenCV
    cross-check budget."""

    def test_bf16_matches_f32(self):
        cfg16 = FlowConfig(lk_dtype="bfloat16")
        for seed, (dx, dy) in [(3, (1.3, -0.8)), (7, (0.07, 0.04)), (11, (2.3, 1.7))]:
            img0 = textured_image(seed=seed)
            img1 = shift_image(img0, dx, dy)
            v32, m32 = flow_vectors(jnp.asarray(img0), jnp.asarray(img1))
            v16, m16 = flow_vectors(jnp.asarray(img0), jnp.asarray(img1), cfg16)
            m32 = np.asarray(m32)
            m16 = np.asarray(m16)
            both = m32 & m16
            assert both.sum() >= 20
            # near-identical validity: quantization may flip a borderline
            # residual/eig gate on at most a couple of corners
            assert (m32 ^ m16).sum() <= 2
            diff = np.linalg.norm(
                np.asarray(v32)[both, 2:4] - np.asarray(v16)[both, 2:4], axis=1
            )
            assert np.median(diff) < 0.02, (seed, np.median(diff))
            assert np.percentile(diff, 95) < 0.05, (seed, float(np.percentile(diff, 95)))

    def test_bf16_still_matches_opencv(self):
        img0 = textured_image(seed=3)
        img1 = shift_image(img0, 1.3, -0.8)
        vec, mask = flow_vectors(
            jnp.asarray(img0), jnp.asarray(img1), FlowConfig(lk_dtype="bfloat16")
        )
        vec = np.asarray(vec)[np.asarray(mask)]
        pts = vec[:, :2].astype(np.float32).reshape(-1, 1, 2)
        nxt, st, _ = cv2.calcOpticalFlowPyrLK(
            (img0 * 255).astype(np.uint8), (img1 * 255).astype(np.uint8),
            pts, None, winSize=(21, 21), maxLevel=2,
        )
        cv_flow = (nxt - pts).reshape(-1, 2)
        st = st.reshape(-1).astype(bool)
        diff = np.linalg.norm(vec[st, 2:4] - cv_flow[st], axis=1)
        assert np.median(diff) < 0.1, np.median(diff)
        assert np.percentile(diff, 90) < 0.5

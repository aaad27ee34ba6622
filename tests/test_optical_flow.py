"""TV-L1 optical flow (data/optical_flow.py) — the reference's flow branch.

OpenCV's DualTVL1 lives in opencv-contrib (absent here), so validation is
against synthetic ground-truth warps: a translated smooth image must recover
the translation, identical frames must give ~zero flow, and cv2's Farneback
(present in core cv2) provides an independent cross-check on the same pair.
Postprocessing (clip +-20, /20, crop) is pinned to hand values against
pre_process_rgb_flow.py:110-114.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from flickering_adversarial_video_tpu.data.optical_flow import (
    flow_for_video,
    postprocess_flow,
    rgb_to_gray,
    tvl1_flow,
)

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def _smooth_image(rng, h, w, blur=4):
    """Blurred noise: textured enough for flow, smooth enough to linearize."""
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    k = np.ones(blur, np.float32) / blur
    for _ in range(3):
        img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
        img = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, img)
    return img


class TestTVL1:
    def test_zero_flow_for_identical_frames(self, rng):
        img = _smooth_image(rng, 64, 80)
        flow = np.asarray(tvl1_flow(img, img, nscales=3, iterations=20))
        assert flow.shape == (64, 80, 2)
        assert np.abs(flow).max() < 0.1

    @pytest.mark.parametrize("shift", [(2, 0), (0, 3), (2, 1)])
    def test_translation_recovery(self, rng, shift):
        dx, dy = shift
        big = _smooth_image(rng, 128, 128)
        # crop the SAME content at offset vs origin: i1's content moved +d
        i0 = big[16 : 16 + 80, 16 : 16 + 80]
        i1 = big[16 - dy : 16 - dy + 80, 16 - dx : 16 - dx + 80]
        flow = np.asarray(tvl1_flow(i0, i1, nscales=3, iterations=30))
        interior = flow[12:-12, 12:-12]
        med = np.median(interior.reshape(-1, 2), axis=0)
        assert abs(med[0] - dx) < 0.5, med
        assert abs(med[1] - dy) < 0.5, med

    @pytest.mark.skipif(not _HAS_CV2, reason="cv2 unavailable")
    def test_farneback_crosscheck(self, rng):
        big = _smooth_image(rng, 128, 128)
        i0 = big[16:96, 16:96]
        i1 = big[14:94, 15:95]  # content shift (+1, +2)
        ours = np.asarray(tvl1_flow(i0, i1, nscales=3, iterations=30))
        fb = cv2.calcOpticalFlowFarneback(
            i0.astype(np.uint8), i1.astype(np.uint8), None, 0.5, 3, 15, 3, 5, 1.2, 0
        )
        interior = np.s_[12:-12, 12:-12]
        for c in range(2):
            a, b = ours[..., c][interior].ravel(), fb[..., c][interior].ravel()
            # both should agree on the dominant translation
            assert abs(np.median(a) - np.median(b)) < 0.6

    def test_flow_for_video_shapes(self, rng):
        gray = np.stack([_smooth_image(rng, 48, 64) for _ in range(4)])
        flow = np.asarray(flow_for_video(gray, nscales=2, iterations=10))
        assert flow.shape == (3, 48, 64, 2)
        assert np.isfinite(flow).all()

    def test_rgb_to_gray_weights(self):
        rgb = np.zeros((2, 2, 3), np.float32)
        rgb[..., 0] = 100.0
        np.testing.assert_allclose(np.asarray(rgb_to_gray(rgb)), 29.9, rtol=1e-5)

    def test_postprocess_clip_scale_crop(self):
        # 40 px clips to 20 -> 1.0; -40 -> -1.0; 10 -> 0.5 (ref :110-113)
        flow = np.zeros((1, 8, 8, 2), np.float32)
        flow[..., 0] = 40.0
        flow[..., 1] = -40.0
        flow[0, 3, 3, :] = (10.0, -10.0)
        out = np.asarray(postprocess_flow(jnp.asarray(flow), crop_size=4))
        assert out.shape == (1, 4, 4, 2)
        assert out.max() == 1.0 and out.min() == -1.0
        np.testing.assert_allclose(out[0, 1, 1], [0.5, -0.5])


class TestVideoFlowBranch:
    def test_frames_to_flow_translation(self, rng):
        from flickering_adversarial_video_tpu.data.video import frames_to_flow

        big = _smooth_image(rng, 128, 128)
        g0 = big[16:96, 16:96]
        g1 = big[14:96 - 2, 16:96]  # content shift +2 rows
        out = frames_to_flow(np.stack([g0, g1]), crop_size=48)
        assert out.shape == (1, 48, 48, 2)
        # +2 px shift -> 2/20 = 0.1 after the reference normalization
        med = np.median(out[0, ..., 1])
        assert abs(med - 0.1) < 0.03, med

    @pytest.mark.skipif(not _HAS_CV2, reason="cv2 unavailable")
    def test_video_to_frames_flow_branch(self, rng, tmp_path):
        from flickering_adversarial_video_tpu.data.video import video_to_frames

        path = str(tmp_path / "clip.avi")
        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"MJPG"), 25, (64, 48)
        )
        if not writer.isOpened():  # pragma: no cover
            pytest.skip("no MJPG writer in this cv2 build")
        base = _smooth_image(rng, 64, 96)
        for t in range(5):
            frame = base[:48, t : t + 64]
            writer.write(cv2.cvtColor(frame.astype(np.uint8), cv2.COLOR_GRAY2BGR))
        writer.release()
        out = video_to_frames(
            path, resize_height=48, crop_size=32, n_steps=8, flow=True
        )
        assert out is not None
        clip, flow = out
        assert clip.shape[0] == 1 and clip.shape[2:] == (32, 32, 3)
        assert flow.shape == (1, clip.shape[1] - 1, 32, 32, 2)
        assert np.isfinite(flow).all()

    @pytest.mark.skipif(not _HAS_CV2, reason="cv2 unavailable")
    def test_flow_truncates_with_clip(self, rng, tmp_path):
        """When the clip keeps only the LAST n_steps frames, the gray stack
        must be truncated identically so flow[t] pairs with clip[t..t+1]."""
        from flickering_adversarial_video_tpu.data.video import video_to_frames

        path = str(tmp_path / "long.avi")
        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"MJPG"), 25, (48, 48)
        )
        if not writer.isOpened():  # pragma: no cover
            pytest.skip("no MJPG writer in this cv2 build")
        base = _smooth_image(rng, 64, 64)
        for t in range(10):
            frame = base[8 : 8 + 48, (t % 8) : (t % 8) + 48]
            writer.write(cv2.cvtColor(frame.astype(np.uint8), cv2.COLOR_GRAY2BGR))
        writer.release()
        out = video_to_frames(
            path, resize_height=48, crop_size=32, n_steps=4, flow=True
        )
        assert out is not None
        clip, flow = out
        assert clip.shape[1] == 4
        assert flow.shape[1] == clip.shape[1] - 1

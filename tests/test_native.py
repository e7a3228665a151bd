"""Tests for the C++ host runtime (built lib vs python/XLA oracles)."""

import numpy as np
import pytest

from lpi_tpu import native


requires_native = pytest.mark.skipif(
    not native.is_available(), reason="native library not built (make -C native)")


def rand_boxes(rng, n, scale=100):
    xy = rng.rand(n, 2) * scale
    wh = rng.rand(n, 2) * scale / 3 + 1
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


class TestResize:
    @requires_native
    def test_linear_ramp_exact(self):
        """Bilinear interpolation of a linear function is exact away from
        borders (PIL's downscale adds antialiasing; ours is the classic
        half-pixel-center bilinear, like torchvision's functional resize)."""
        H, W = 32, 32
        ramp = np.tile(np.linspace(0, 255, W, dtype=np.float32), (H, 1))
        img = np.repeat(ramp[..., None], 3, axis=2).astype(np.uint8)
        got = native.resize_normalize(img, 16, 16, np.zeros(3, np.float32),
                                      np.ones(3, np.float32))
        # interior columns follow the same linear ramp sampled at bin centers
        xs = (np.arange(16) + 0.5) * 2 - 0.5
        expected = np.interp(xs, np.arange(W), ramp[0]) / 255.0
        np.testing.assert_allclose(got[8, 2:14, 0], expected[2:14], atol=0.01)

    @requires_native
    def test_identity_resize(self):
        img = np.full((8, 8, 3), 128, np.uint8)
        out = native.resize_normalize(img, 8, 8, np.zeros(3, np.float32),
                                      np.ones(3, np.float32))
        np.testing.assert_allclose(out, 128 / 255.0, atol=1e-5)

    @requires_native
    def test_center_crop(self, rng):
        img = rng.rand(10, 12, 3).astype(np.float32)
        out = native.center_crop(img, 4, 6)
        np.testing.assert_allclose(out, img[3:7, 3:9])


class TestNativeNMS:
    @requires_native
    def test_matches_xla_nms(self, rng):
        import jax.numpy as jnp

        from lpi_tpu.ops.nms import nms_mask

        boxes = rand_boxes(rng, 40)
        scores = rng.rand(40).astype(np.float32)
        keep_native = set(native.nms_cpu(boxes, scores, 0.5).tolist())
        keep_xla = set(np.where(np.asarray(
            nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5)))[0].tolist())
        assert keep_native == keep_xla

    @requires_native
    def test_ml_nms_labels(self):
        boxes = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
        scores = np.asarray([0.9, 0.8], np.float32)
        same = native.ml_nms_cpu(boxes, scores, np.asarray([1, 1]), 0.5)
        diff = native.ml_nms_cpu(boxes, scores, np.asarray([1, 2]), 0.5)
        assert len(same) == 1 and len(diff) == 2

    @requires_native
    def test_soft_nms_decay(self):
        boxes = np.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]],
                           np.float32)
        scores = np.asarray([0.9, 0.8, 0.7], np.float32)
        out, kept = native.soft_nms_cpu(boxes, scores)
        assert kept == 3
        assert out[1] < 0.4 and abs(out[2] - 0.7) < 1e-5

    def test_python_fallback_nms(self, rng, monkeypatch):
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_load", lambda: None)
        boxes = rand_boxes(rng, 12)
        scores = rng.rand(12).astype(np.float32)
        keep = native.nms_cpu(boxes, scores, 0.5)
        assert len(keep) >= 1


class TestNativeRoiAlign:
    @requires_native
    def test_matches_xla_roi_align(self, rng):
        import jax.numpy as jnp

        from lpi_tpu.ops.roi_align import roi_align

        feat = rng.rand(12, 12, 5).astype(np.float32)
        roi = np.asarray([2.0, 1.0, 10.0, 9.0], np.float32)
        got = native.roi_align_cpu(feat, roi, 1.0, 4, 2)
        expected = np.asarray(roi_align(
            jnp.asarray(feat[None]), jnp.asarray([[0.0, *roi]]), out_size=4))[0]
        np.testing.assert_allclose(got, expected, atol=1e-4)

"""Multi-scale TTA driver vs the reference box_aug semantics."""

import numpy as np
import pytest

from lpi_tpu.eval.tta import (
    flip_boxes,
    multi_scale_detect,
    rescale_boxes,
    size_range_filter,
)

pytestmark = pytest.mark.fast


class TestHelpers:
    def test_flip_involution(self):
        b = np.asarray([[10, 5, 30, 25]], np.float32)
        np.testing.assert_allclose(flip_boxes(flip_boxes(b, 100), 100), b)

    def test_rescale(self):
        b = np.asarray([[10, 20, 30, 40]], np.float32)
        out = rescale_boxes(b, (100, 200), (50, 100))
        np.testing.assert_allclose(out, [[5, 10, 15, 20]])

    def test_size_range(self):
        b = np.asarray([[0, 0, 9, 9], [0, 0, 99, 99]], np.float32)
        keep = size_range_filter(b, 5, 50)  # (w+1)(h+1): 100 and 10000
        np.testing.assert_array_equal(keep, [True, False])


class TestMultiScaleDetect:
    def test_merges_scales_and_flips(self):
        """A detector that finds the same object at every transform must
        merge to one box in original coords."""
        H = W = 100
        image = np.zeros((H, W, 3), np.float32)
        gt = np.asarray([20, 30, 60, 70], np.float32)  # original coords
        calls = []

        def predict(img, scale, hflip):
            calls.append((scale, hflip))
            s = scale / 100.0
            box = gt * s
            if hflip:  # detector sees the flipped image
                box = np.asarray([scale - box[2], box[1],
                                  scale - box[0], box[3]])
            noise = 0.01 * len(calls)
            return (box[None] + noise, np.asarray([0.9 - noise]),
                    np.asarray([1]), (scale, scale))

        out = multi_scale_detect(predict, image, scales=(50, 100, 200),
                                 flip=True, nms_thresh=0.5)
        assert len(calls) == 6
        assert len(out["boxes"]) == 1  # NMS merged all 6 into one
        np.testing.assert_allclose(out["boxes"][0], gt, atol=1.0)

    def test_keep_ranges_filter(self):
        image = np.zeros((100, 100, 3), np.float32)

        def predict(img, scale, hflip):
            return (np.asarray([[0, 0, 10, 10]], np.float32),
                    np.asarray([0.9]), np.asarray([1]), (100, 100))

        out = multi_scale_detect(predict, image, scales=(100,), flip=False,
                                 keep_ranges=[(50, 200)])
        assert len(out["boxes"]) == 0  # 11x11 area below the 50^2 floor

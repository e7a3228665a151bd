"""Grounding transform pipeline: flip-with-boxes correctness, restrict
resize, multi-scale bucketing, bgr255 normalization."""

import numpy as np
import pytest

from lpi_tpu.data.transforms import (
    PIXEL_MEAN,
    PIXEL_STD,
    AugmentConfig,
    color_jitter,
    eval_transform,
    hflip,
    normalize_bgr255,
    resize_distort,
    train_transform,
)

pytestmark = pytest.mark.fast


class TestResizeDistort:
    def test_shape_and_box_scaling(self):
        img = np.zeros((100, 200, 3), np.float32)
        boxes = np.asarray([[20, 10, 60, 50]], np.float32)
        out, b = resize_distort(img, boxes, 50, 50)
        assert out.shape == (50, 50, 3)
        # x scaled by 50/200, y by 50/100
        np.testing.assert_allclose(b, [[5, 5, 15, 25]], atol=1e-5)

    def test_content_preserved(self):
        img = np.zeros((64, 64, 3), np.float32)
        img[:32] = 1.0  # top half white
        out, _ = resize_distort(img, np.zeros((0, 4)), 32, 32)
        assert out[:14].mean() > 0.9
        assert out[-14:].mean() < 0.1


class TestHFlip:
    def test_boxes_mirrored(self):
        img = np.zeros((10, 20, 3), np.float32)
        img[:, :5] = 1.0
        boxes = np.asarray([[0, 2, 5, 8]], np.float32)
        out, b = hflip(img, boxes)
        np.testing.assert_allclose(b, [[15, 2, 20, 8]])
        assert out[:, -5:].mean() == pytest.approx(1.0)
        assert out[:, :5].mean() == pytest.approx(0.0)

    def test_content_width_keeps_padding(self):
        img = np.zeros((10, 20, 3), np.float32)
        img[:, 8:10] = 1.0  # content region is [:, :10], bright at its right
        out, b = hflip(img, np.asarray([[8, 0, 10, 10]], np.float32), content_w=10)
        assert out[:, 0:2].mean() == pytest.approx(1.0)
        assert out[:, 10:].mean() == pytest.approx(0.0)  # padding untouched
        np.testing.assert_allclose(b, [[0, 0, 2, 10]])

    def test_involution(self):
        rng = np.random.RandomState(0)
        img = rng.rand(8, 12, 3).astype(np.float32)
        boxes = np.asarray([[1, 2, 5, 7]], np.float32)
        i2, b2 = hflip(*hflip(img, boxes))
        np.testing.assert_allclose(i2, img)
        np.testing.assert_allclose(b2, boxes)


class TestNormalize:
    def test_bgr255_formula(self):
        img = np.full((2, 2, 3), 0.5, np.float32)
        out = normalize_bgr255(img)
        expect = (127.5 - PIXEL_MEAN) / PIXEL_STD
        np.testing.assert_allclose(out[0, 0], expect, rtol=1e-5)

    def test_channel_swap(self):
        img = np.zeros((1, 1, 3), np.float32)
        img[..., 0] = 1.0  # pure red in RGB -> B channel gets 255 after swap? no: BGR means out[...,2]=R
        out = normalize_bgr255(img)
        # red (RGB idx 0) lands at BGR idx 2
        assert out[0, 0, 2] == pytest.approx((255 - PIXEL_MEAN[2]) / PIXEL_STD[2], rel=1e-5)
        assert out[0, 0, 0] == pytest.approx((0 - PIXEL_MEAN[0]) / PIXEL_STD[0], rel=1e-5)


class TestColorJitter:
    def test_zero_knobs_identity(self):
        rng = np.random.RandomState(0)
        img = rng.rand(4, 4, 3).astype(np.float32)
        np.testing.assert_allclose(color_jitter(rng, img), img)

    def test_brightness_bounds(self):
        rng = np.random.RandomState(0)
        img = np.full((4, 4, 3), 0.5, np.float32)
        out = color_jitter(rng, img, brightness=0.4)
        assert 0.5 * 0.6 - 1e-6 <= out.mean() <= 0.5 * 1.4 + 1e-6


class TestPipelines:
    def test_train_multi_scale_buckets(self):
        cfg = AugmentConfig(image_size=32, flip_prob=0.0,
                            multi_scale=(16, 24, 32), normalize=False)
        rng = np.random.RandomState(1)
        img = np.ones((32, 32, 3), np.float32)
        boxes = np.asarray([[0, 0, 32, 32]], np.float32)
        sizes = set()
        for _ in range(10):
            out, b = train_transform(rng, img, boxes, cfg)
            assert out.shape == (32, 32, 3)  # static bucket = max scale
            s = int(round(b[0, 2]))
            sizes.add(s)
            # content confined to [s, s]
            assert out[s:].sum() == pytest.approx(0.0)
            assert out[:, s:].sum() == pytest.approx(0.0)
        assert len(sizes) > 1  # multiple scales actually drawn

    def test_eval_deterministic(self):
        cfg = AugmentConfig(image_size=16, normalize=True)
        img = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)
        boxes = np.asarray([[0, 0, 32, 16]], np.float32)
        a1, b1 = eval_transform(img, boxes, cfg)
        a2, b2 = eval_transform(img, boxes, cfg)
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_allclose(b1, [[0, 0, 16, 8]])

    def test_flip_prob_one_flips_boxes(self):
        cfg = AugmentConfig(image_size=16, flip_prob=1.0, normalize=False)
        rng = np.random.RandomState(0)
        img = np.zeros((16, 16, 3), np.float32)
        boxes = np.asarray([[0, 0, 4, 16]], np.float32)
        _, b = train_transform(rng, img, boxes, cfg)
        np.testing.assert_allclose(b, [[12, 0, 16, 16]])

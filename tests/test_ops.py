"""Golden tests for the detection ops (NMS family, focal, deform conv, ROIAlign)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lpi_tpu.ops.boxes import box_giou, box_iou, decode_boxes, encode_boxes
from lpi_tpu.ops.deform_conv import deform_conv2d
from lpi_tpu.ops.focal import sigmoid_focal_loss, token_sigmoid_focal_loss
from lpi_tpu.ops.nms import ml_nms_mask, nms_mask, nms_padded, soft_nms
from lpi_tpu.ops.roi_align import roi_align


def naive_iou(a, b):
    out = np.zeros((len(a), len(b)))
    for i, (ax1, ay1, ax2, ay2) in enumerate(a):
        for j, (bx1, by1, bx2, by2) in enumerate(b):
            ix = max(0, min(ax2, bx2) - max(ax1, bx1))
            iy = max(0, min(ay2, by2) - max(ay1, by1))
            inter = ix * iy
            union = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
            out[i, j] = inter / union if union > 0 else 0
    return out


def naive_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    for i in order:
        if not np.isfinite(scores[i]):
            continue
        ok = True
        for j in keep:
            if naive_iou(boxes[i:i + 1], boxes[j:j + 1])[0, 0] > thr:
                ok = False
                break
        if ok:
            keep.append(i)
    return sorted(keep)


def rand_boxes(rng, n, scale=100):
    xy = rng.rand(n, 2) * scale
    wh = rng.rand(n, 2) * scale / 3 + 1
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


class TestBoxes:
    def test_iou_matches_naive(self, rng):
        a, b = rand_boxes(rng, 8), rand_boxes(rng, 5)
        np.testing.assert_allclose(
            np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b))),
            naive_iou(a, b), atol=1e-5)

    def test_giou_identity_and_disjoint(self):
        a = jnp.asarray([[0.0, 0, 10, 10]])
        b = jnp.asarray([[0.0, 0, 10, 10], [20, 20, 30, 30]])
        g = np.asarray(box_giou(a, b))
        assert g[0, 0] == pytest.approx(1.0, abs=1e-5)
        assert g[0, 1] < 0  # disjoint -> negative

    def test_encode_decode_roundtrip(self, rng):
        anchors = rand_boxes(rng, 10)
        gt = rand_boxes(rng, 10)
        deltas = encode_boxes(jnp.asarray(gt), jnp.asarray(anchors))
        back = decode_boxes(deltas, jnp.asarray(anchors))
        np.testing.assert_allclose(np.asarray(back), gt, rtol=1e-4, atol=1e-3)


class TestNMS:
    def test_matches_naive(self, rng):
        boxes = rand_boxes(rng, 32)
        scores = rng.rand(32).astype(np.float32)
        keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        assert sorted(np.where(keep)[0].tolist()) == naive_nms(boxes, scores, 0.5)

    def test_padding_rows_never_kept(self, rng):
        boxes = rand_boxes(rng, 8)
        scores = rng.rand(8).astype(np.float32)
        scores[5:] = -np.inf
        keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        assert not keep[5:].any()

    def test_ml_nms_separates_labels(self):
        boxes = jnp.asarray([[0.0, 0, 10, 10], [1, 1, 11, 11]])
        scores = jnp.asarray([0.9, 0.8])
        same = np.asarray(ml_nms_mask(boxes, scores, jnp.asarray([1, 1]), 0.5))
        diff = np.asarray(ml_nms_mask(boxes, scores, jnp.asarray([1, 2]), 0.5))
        assert same.tolist() == [True, False]
        assert diff.tolist() == [True, True]

    def test_nms_padded_static_output(self, rng):
        boxes = rand_boxes(rng, 16)
        scores = rng.rand(16).astype(np.float32)
        idx, valid = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 8)
        assert idx.shape == (8,) and valid.shape == (8,)
        kept = naive_nms(boxes, scores, 0.5)
        top8 = sorted(kept, key=lambda i: -scores[i])[:8]
        assert set(int(i) for i in np.asarray(idx)[np.asarray(valid)]) == set(top8)

    def test_soft_nms_decays_overlaps(self):
        boxes = jnp.asarray([[0.0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]])
        scores = jnp.asarray([0.9, 0.8, 0.7])
        out, _ = soft_nms(boxes, scores)
        out = np.asarray(out)
        assert out[0] == pytest.approx(0.9, abs=1e-5)  # top box untouched
        assert out[1] < 0.4  # identical overlap strongly decayed
        assert out[2] == pytest.approx(0.7, abs=1e-5)  # disjoint untouched


class TestFocal:
    def test_sigmoid_focal_matches_torch_formula(self, rng):
        logits = rng.randn(6, 4).astype(np.float32)
        targets = np.array([0, 1, 2, 4, 3, 0])
        got = np.asarray(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
        lt = torch.tensor(logits)
        t = torch.zeros(6, 4)
        for i, c in enumerate(targets):
            if c > 0:
                t[i, c - 1] = 1
        p = lt.sigmoid()
        expected = (-t * 0.25 * (1 - p) ** 2 * p.clamp(1e-9).log()
                    - (1 - t) * 0.75 * p ** 2 * (1 - p).clamp(1e-9).log())
        np.testing.assert_allclose(got, expected.numpy(), atol=1e-5)

    def test_token_focal_masked(self, rng):
        logits = rng.randn(2, 5, 7).astype(np.float32)
        targets = (rng.rand(2, 5, 7) > 0.7).astype(np.float32)
        mask = np.ones((2, 7), np.float32)
        mask[0, 4:] = 0
        loss = np.asarray(token_sigmoid_focal_loss(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(mask)))
        assert loss.shape == (2, 5, 7)
        np.testing.assert_array_equal(loss[0, :, 4:], 0)
        assert (loss[1] > 0).any()


class TestDeformConv:
    def test_zero_offsets_equal_standard_conv(self, rng):
        feat = rng.randn(2, 8, 8, 3).astype(np.float32)
        w = rng.randn(3, 3, 3, 5).astype(np.float32)
        offsets = np.zeros((2, 8, 8, 18), np.float32)
        got = np.asarray(deform_conv2d(jnp.asarray(feat), jnp.asarray(offsets),
                                       jnp.asarray(w)))
        tfeat = torch.tensor(feat).permute(0, 3, 1, 2)
        tw = torch.tensor(w).permute(3, 2, 0, 1)
        expected = F.conv2d(tfeat, tw, padding=1).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, expected, atol=1e-4)

    def test_integer_offset_shifts_sampling(self, rng):
        feat = rng.randn(1, 8, 8, 2).astype(np.float32)
        w = np.zeros((3, 3, 2, 2), np.float32)
        w[1, 1, 0, 0] = 1.0  # identity tap at kernel center, channel 0
        offsets = np.zeros((1, 8, 8, 18), np.float32)
        offsets[..., 2 * 4] = 1.0  # center tap dy=+1
        got = np.asarray(deform_conv2d(jnp.asarray(feat), jnp.asarray(offsets),
                                       jnp.asarray(w)))
        np.testing.assert_allclose(got[0, :7, :, 0], feat[0, 1:, :, 0], atol=1e-5)

    def test_modulated_mask_scales(self, rng):
        feat = rng.randn(1, 6, 6, 2).astype(np.float32)
        w = rng.randn(3, 3, 2, 2).astype(np.float32)
        offsets = np.zeros((1, 6, 6, 18), np.float32)
        big = np.full((1, 6, 6, 9), 20.0, np.float32)  # sigmoid ~= 1
        out_masked = np.asarray(deform_conv2d(jnp.asarray(feat), jnp.asarray(offsets),
                                              jnp.asarray(w), mask=jnp.asarray(big)))
        out_plain = np.asarray(deform_conv2d(jnp.asarray(feat), jnp.asarray(offsets),
                                             jnp.asarray(w)))
        np.testing.assert_allclose(out_masked, out_plain, atol=1e-4)

    def test_differentiable_through_offsets(self, rng):
        feat = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 2, 2).astype(np.float32))
        off = jnp.zeros((1, 6, 6, 18))
        g = jax.grad(lambda o: jnp.sum(deform_conv2d(feat, o, w) ** 2))(off)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestRoiAlign:
    def test_constant_map(self):
        feat = jnp.full((1, 8, 8, 3), 5.0)
        rois = jnp.asarray([[0.0, 1, 1, 7, 7]])
        out = roi_align(feat, rois, out_size=4)
        np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-5)

    def test_linear_ramp(self):
        """Bilinear sampling of a linear function is exact."""
        H = W = 8
        ramp = np.arange(H, dtype=np.float32)[:, None] * np.ones((1, W))
        feat = jnp.asarray(ramp[None, :, :, None])
        rois = jnp.asarray([[0.0, 0, 2, 8, 6]])  # y in [2, 6]
        out = np.asarray(roi_align(feat, rois, out_size=2, sampling_ratio=2))[0, :, :, 0]
        # bins of height 2: taps at y = 2+{0.5,1.5} and 4+{0.5,1.5} -> means 3, 5
        np.testing.assert_allclose(out[:, 0], [3.0, 5.0], atol=1e-5)

    def test_invalid_roi_zero(self):
        feat = jnp.ones((1, 8, 8, 2))
        rois = jnp.asarray([[-1.0, 0, 0, 4, 4]])
        out = roi_align(feat, rois, out_size=2)
        np.testing.assert_array_equal(np.asarray(out), 0)


class TestDeformConvWindow:
    def test_matches_gather_version_interior(self, rng):
        from lpi_tpu.ops.deform_conv import deform_conv2d_window

        feat = rng.randn(2, 12, 12, 4).astype(np.float32)
        w = rng.randn(3, 3, 4, 6).astype(np.float32)
        offsets = (rng.rand(2, 12, 12, 18).astype(np.float32) * 2 - 1) * 1.5
        mask = rng.randn(2, 12, 12, 9).astype(np.float32)
        a = np.asarray(deform_conv2d(jnp.asarray(feat), jnp.asarray(offsets),
                                     jnp.asarray(w), mask=jnp.asarray(mask)))
        b = np.asarray(deform_conv2d_window(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w),
            mask=jnp.asarray(mask), max_offset=3))
        # interior (away from the boundary-handling difference)
        np.testing.assert_allclose(a[:, 4:-4, 4:-4], b[:, 4:-4, 4:-4],
                                   atol=1e-3, rtol=1e-3)

    def test_zero_offsets_equal_standard_conv(self, rng):
        from lpi_tpu.ops.deform_conv import deform_conv2d_window

        feat = rng.randn(2, 8, 8, 3).astype(np.float32)
        w = rng.randn(3, 3, 3, 5).astype(np.float32)
        offsets = np.zeros((2, 8, 8, 18), np.float32)
        got = np.asarray(deform_conv2d_window(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w)))
        tfeat = torch.tensor(feat).permute(0, 3, 1, 2)
        tw = torch.tensor(w).permute(3, 2, 0, 1)
        expected = F.conv2d(tfeat, tw, padding=1).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, expected, atol=1e-4)

    def test_differentiable(self, rng):
        from lpi_tpu.ops.deform_conv import deform_conv2d_window

        feat = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 2, 2).astype(np.float32))
        off = jnp.full((1, 6, 6, 18), 0.3)
        g = jax.grad(lambda o: jnp.sum(deform_conv2d_window(feat, o, w) ** 2))(off)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestDeformConvFast:
    """matmul-first windowed formulation (the DyConv hot-path kernel)."""

    def test_matches_gather_version_interior(self, rng):
        from lpi_tpu.ops.deform_conv import deform_conv2d_fast

        feat = rng.randn(2, 12, 12, 4).astype(np.float32)
        w = rng.randn(3, 3, 4, 6).astype(np.float32)
        offsets = (rng.rand(2, 12, 12, 18).astype(np.float32) * 2 - 1) * 1.5
        mask = rng.randn(2, 12, 12, 9).astype(np.float32)
        bias = rng.randn(6).astype(np.float32)
        a = np.asarray(deform_conv2d(jnp.asarray(feat), jnp.asarray(offsets),
                                     jnp.asarray(w), bias=jnp.asarray(bias),
                                     mask=jnp.asarray(mask)))
        b = np.asarray(deform_conv2d_fast(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w),
            bias=jnp.asarray(bias), mask=jnp.asarray(mask), max_offset=3))
        np.testing.assert_allclose(a[:, 4:-4, 4:-4], b[:, 4:-4, 4:-4],
                                   atol=1e-3, rtol=1e-3)

    def test_zero_offsets_equal_standard_conv(self, rng):
        from lpi_tpu.ops.deform_conv import deform_conv2d_fast

        feat = rng.randn(2, 8, 8, 3).astype(np.float32)
        w = rng.randn(3, 3, 3, 5).astype(np.float32)
        offsets = np.zeros((2, 8, 8, 18), np.float32)
        got = np.asarray(deform_conv2d_fast(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w)))
        tfeat = torch.tensor(feat).permute(0, 3, 1, 2)
        tw = torch.tensor(w).permute(3, 2, 0, 1)
        expected = F.conv2d(tfeat, tw, padding=1).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, expected, atol=1e-4)

    def test_differentiable(self, rng):
        from lpi_tpu.ops.deform_conv import deform_conv2d_fast

        feat = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 2, 2).astype(np.float32))
        off = jnp.full((1, 6, 6, 18), 0.3)
        g = jax.grad(lambda o: jnp.sum(deform_conv2d_fast(feat, o, w) ** 2))(off)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestDeformConvFastScan:
    """scan-over-taps fast path: bit-identical to the unrolled fast path."""

    def test_matches_unrolled_fast(self, rng):
        from lpi_tpu.ops.deform_conv import (deform_conv2d_fast,
                                             deform_conv2d_fast_scan)

        feat = rng.randn(2, 10, 10, 4).astype(np.float32)
        w = rng.randn(3, 3, 4, 6).astype(np.float32)
        offsets = (rng.rand(2, 10, 10, 18).astype(np.float32) * 2 - 1) * 2.5
        mask = rng.randn(2, 10, 10, 9).astype(np.float32)
        bias = rng.randn(6).astype(np.float32)
        a = np.asarray(deform_conv2d_fast(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w),
            bias=jnp.asarray(bias), mask=jnp.asarray(mask), max_offset=2))
        b = np.asarray(deform_conv2d_fast_scan(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w),
            bias=jnp.asarray(bias), mask=jnp.asarray(mask), max_offset=2))
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    def test_strided_no_mask(self, rng):
        from lpi_tpu.ops.deform_conv import (deform_conv2d_fast,
                                             deform_conv2d_fast_scan)

        feat = rng.randn(1, 8, 8, 3).astype(np.float32)
        w = rng.randn(3, 3, 3, 5).astype(np.float32)
        offsets = np.full((1, 4, 4, 18), 0.4, np.float32)
        a = np.asarray(deform_conv2d_fast(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w), stride=2))
        b = np.asarray(deform_conv2d_fast_scan(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w), stride=2))
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    def test_differentiable(self, rng):
        from lpi_tpu.ops.deform_conv import deform_conv2d_fast_scan

        feat = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 2, 2).astype(np.float32))
        off = jnp.full((1, 6, 6, 18), 0.3)
        g = jax.grad(lambda o: jnp.sum(deform_conv2d_fast_scan(feat, o, w) ** 2))(off)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

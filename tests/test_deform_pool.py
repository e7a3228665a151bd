"""deform_psroi_pool vs hand-computed CUDA-kernel semantics
(`deform_pool_kernel_cuda.cu`)."""

import numpy as np
import pytest

from lpi_tpu.ops.deform_pool import deform_psroi_pool

pytestmark = pytest.mark.fast


def reference_psroi(feat, roi, trans, out_size, out_dim, spatial_scale,
                    sample_per_part, group_size, part_size, trans_std):
    """Direct numpy port of the CUDA forward loop."""
    H, W, C = feat.shape
    num_classes = 1 if trans is None else trans.shape[0] // 2
    ch_each = out_dim // num_classes
    x1 = round(roi[0]) * spatial_scale - 0.5
    y1 = round(roi[1]) * spatial_scale - 0.5
    x2 = (round(roi[2]) + 1.0) * spatial_scale - 0.5
    y2 = (round(roi[3]) + 1.0) * spatial_scale - 0.5
    rw = max(x2 - x1, 0.1)
    rh = max(y2 - y1, 0.1)
    bw, bh = rw / out_size, rh / out_size
    sw, sh = bw / sample_per_part, bh / sample_per_part
    out = np.zeros((out_size, out_size, out_dim))
    for ph in range(out_size):
        for pw in range(out_size):
            for ct in range(out_dim):
                part_h = min(int(ph * part_size / out_size), part_size - 1)
                part_w = min(int(pw * part_size / out_size), part_size - 1)
                cls = ct // ch_each
                tx = 0.0 if trans is None else trans.reshape(
                    num_classes, 2, part_size, part_size)[cls, 0, part_h, part_w] * trans_std
                ty = 0.0 if trans is None else trans.reshape(
                    num_classes, 2, part_size, part_size)[cls, 1, part_h, part_w] * trans_std
                ws = pw * bw + x1 + tx * rw
                hs = ph * bh + y1 + ty * rh
                gw = min(max(pw * group_size // out_size, 0), group_size - 1)
                gh = min(max(ph * group_size // out_size, 0), group_size - 1)
                c = (ct * group_size + gh) * group_size + gw
                total, count = 0.0, 0
                for ih in range(sample_per_part):
                    for iw in range(sample_per_part):
                        x = ws + iw * sw
                        y = hs + ih * sh
                        if x < -0.5 or x > W - 0.5 or y < -0.5 or y > H - 0.5:
                            continue
                        x = min(max(x, 0.0), W - 1.0)
                        y = min(max(y, 0.0), H - 1.0)
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        x1i, y1i = min(x0 + 1, W - 1), min(y0 + 1, H - 1)
                        dx, dy = x - x0, y - y0
                        v = (feat[y0, x0, c] * (1 - dx) * (1 - dy)
                             + feat[y0, x1i, c] * dx * (1 - dy)
                             + feat[y1i, x0, c] * (1 - dx) * dy
                             + feat[y1i, x1i, c] * dx * dy)
                        total += v
                        count += 1
                out[ph, pw, ct] = 0.0 if count == 0 else total / count
    return out


class TestDeformPSRoIPool:
    @pytest.mark.parametrize("group_size,trans_on", [(1, False), (2, True)])
    def test_matches_cuda_semantics(self, rng, group_size, trans_on):
        out_size, out_dim, spp, part, tstd = 3, 4, 2, 3, 0.2
        C = out_dim * group_size * group_size
        feat = rng.randn(1, 12, 14, C).astype(np.float32)
        roi = np.asarray([2.0, 1.0, 10.0, 9.0])
        trans = (rng.randn(2, part, part).astype(np.float32)
                 if trans_on else None)
        got = np.asarray(deform_psroi_pool(
            feat, np.asarray([[0.0, *roi]], np.float32),
            None if trans is None else trans[None],
            out_size=out_size, out_dim=out_dim, spatial_scale=0.5,
            sample_per_part=spp, group_size=group_size, part_size=part,
            trans_std=tstd))[0]
        want = reference_psroi(feat[0], roi, trans, out_size, out_dim, 0.5,
                               spp, group_size, part, tstd)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_out_of_image_roi_zero(self, rng):
        feat = rng.randn(1, 8, 8, 4).astype(np.float32)
        out = np.asarray(deform_psroi_pool(
            feat, np.asarray([[0.0, 100, 100, 120, 120]], np.float32),
            out_size=2, out_dim=4))
        np.testing.assert_array_equal(out, 0.0)

    def test_batch_index_routing(self, rng):
        feat = np.stack([np.zeros((8, 8, 4)), np.ones((8, 8, 4))]).astype(np.float32)
        rois = np.asarray([[0, 1, 1, 6, 6], [1, 1, 1, 6, 6]], np.float32)
        out = np.asarray(deform_psroi_pool(feat, rois, out_size=2, out_dim=4))
        assert out[0].max() == pytest.approx(0.0)
        assert out[1].min() == pytest.approx(1.0)

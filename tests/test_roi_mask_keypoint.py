"""Mask and keypoint ROI heads: shapes, loss behavior, target geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpi_tpu.models.glip.roi_mask_keypoint import (
    KeypointHead,
    MaskHead,
    keypoint_loss,
    keypoints_to_heatmap_targets,
    mask_loss,
    paste_mask_probs,
    pool_rois,
)

class TestMaskHead:
    def test_shapes(self, rng):
        head = MaskHead(num_classes=5, channels=8, num_convs=2)
        pooled = jnp.asarray(rng.randn(3, 14, 14, 8).astype(np.float32))
        v = head.init(jax.random.PRNGKey(0), pooled)
        out = head.apply(v, pooled)
        assert out.shape == (3, 28, 28, 5)

    def test_loss_prefers_correct_mask(self, rng):
        logits = jnp.full((1, 4, 4, 2), -10.0)
        gt = jnp.zeros((1, 4, 4)).at[0, :2].set(1.0)
        good = logits.at[0, :2, :, 1].set(10.0)  # class-1 channel matches gt
        labels = jnp.asarray([1])
        valid = jnp.asarray([True])
        l_good = float(mask_loss(good, gt, labels, valid))
        l_bad = float(mask_loss(logits, gt, labels, valid))
        assert l_good < l_bad

    def test_invalid_rois_ignored(self):
        logits = jnp.full((2, 4, 4, 2), 10.0)
        gt = jnp.zeros((2, 4, 4))
        labels = jnp.zeros((2,), jnp.int32)
        only_first = float(mask_loss(logits, gt, labels,
                                     jnp.asarray([True, False])))
        both = float(mask_loss(logits, gt, labels, jnp.asarray([True, True])))
        np.testing.assert_allclose(only_first, both, rtol=1e-6)

    def test_paste_selects_class(self, rng):
        logits = jnp.zeros((1, 2, 2, 3)).at[..., 2].set(5.0)
        p2 = paste_mask_probs(logits, jnp.asarray([2]))
        p0 = paste_mask_probs(logits, jnp.asarray([0]))
        assert float(p2.min()) > 0.9 and float(p0.max()) == pytest.approx(0.5)


class TestKeypointHead:
    pytestmark = pytest.mark.fast

    def test_shapes(self, rng):
        head = KeypointHead(num_keypoints=4, channels=8, num_convs=2,
                            heatmap_size=16)
        pooled = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
        v = head.init(jax.random.PRNGKey(0), pooled)
        out = head.apply(v, pooled)
        assert out.shape == (2, 16, 16, 4)

    def test_heatmap_targets_geometry(self):
        rois = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        kps = jnp.asarray([[[5.0, 5.0, 2.0], [20.0, 5.0, 2.0],
                            [5.0, 5.0, 0.0]]])
        idx, valid = keypoints_to_heatmap_targets(kps, rois, 8)
        assert int(idx[0, 0]) == 4 * 8 + 4  # center cell
        assert bool(valid[0, 0])
        assert not bool(valid[0, 1])  # outside roi
        assert not bool(valid[0, 2])  # invisible

    def test_loss_prefers_correct_cell(self):
        S = 8
        rois = jnp.asarray([[0.0, 0.0, 8.0, 8.0]])
        kps = jnp.asarray([[[2.0, 2.0, 2.0]]])  # cell (2, 2)
        good = jnp.zeros((1, S, S, 1)).at[0, 2, 2, 0].set(10.0)
        bad = jnp.zeros((1, S, S, 1)).at[0, 6, 6, 0].set(10.0)
        valid = jnp.asarray([True])
        assert float(keypoint_loss(good, kps, rois, valid)) < \
            float(keypoint_loss(bad, kps, rois, valid))


class TestPoolRois:
    pytestmark = pytest.mark.fast

    def test_shapes(self, rng):
        feats = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
        rois = jnp.asarray([[0.0, 0.0, 8.0, 8.0], [4.0, 4.0, 12.0, 12.0]])
        out = pool_rois(feats, rois, resolution=7, spatial_scale=1.0)
        assert out.shape == (2, 7, 7, 4)

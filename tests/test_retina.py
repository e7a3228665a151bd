"""RetinaNet head: shapes, matcher semantics, loss behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpi_tpu.models.glip.retina import RetinaNetHead, retina_losses, retina_match

class TestRetinaHead:
    def test_output_shapes(self, rng):
        head = RetinaNetHead(num_classes=7, num_anchors=9, channels=16,
                             num_convs=2)
        feats = [jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32)),
                 jnp.asarray(rng.randn(2, 4, 4, 16).astype(np.float32))]
        v = head.init(jax.random.PRNGKey(0), feats)
        out = head.apply(v, feats)
        assert out["cls_logits"][0].shape == (2, 8, 8, 9 * 7)
        assert out["bbox_pred"][1].shape == (2, 4, 4, 9 * 4)

    def test_prior_prob_bias(self, rng):
        """Fresh head must predict ~prior_prob foreground probability."""
        head = RetinaNetHead(num_classes=3, num_anchors=1, channels=8,
                             num_convs=1, prior_prob=0.01)
        feats = [jnp.zeros((1, 4, 4, 8))]
        v = head.init(jax.random.PRNGKey(0), feats)
        p = jax.nn.sigmoid(head.apply(v, feats)["cls_logits"][0])
        np.testing.assert_allclose(np.asarray(p), 0.01, atol=2e-3)


class TestMatcher:
    pytestmark = pytest.mark.fast

    ANCHORS = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30],
                           [100, 100, 110, 110]], jnp.float32)

    def test_fg_bg_ignore(self):
        gt = jnp.asarray([[0, 0, 10, 10], [21, 20, 30, 30]], jnp.float32)
        valid = jnp.asarray([True, True])
        matched, fg, ignore = retina_match(self.ANCHORS, gt, valid)
        assert bool(fg[0]) and int(matched[0]) == 0
        assert bool(fg[1]) and int(matched[1]) == 1  # IoU 0.9 > 0.5
        assert not bool(fg[2]) and not bool(ignore[2])

    def test_low_quality_claim(self):
        """A GT overlapping nothing above fg_iou still claims its best anchor."""
        gt = jnp.asarray([[0, 0, 30, 30]], jnp.float32)  # IoU with a0 = 1/9
        valid = jnp.asarray([True])
        matched, fg, ignore = retina_match(self.ANCHORS, gt, valid)
        assert bool(fg[0]) and int(matched[0]) == 0

    def test_invalid_gt_ignored(self):
        gt = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        matched, fg, ignore = retina_match(self.ANCHORS, gt,
                                           jnp.asarray([False]))
        assert not bool(fg.any())


class TestLosses:
    def test_perfect_prediction_low_loss(self, rng):
        anchors = jnp.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32)
        gt = jnp.asarray([[[0, 0, 10, 10]]], jnp.float32)
        labels = jnp.asarray([[2]], jnp.int32)  # 1-based class 2
        valid = jnp.asarray([[True]])
        good_cls = jnp.full((1, 2, 3), -20.0).at[0, 0, 1].set(20.0)
        good_box = jnp.zeros((1, 2, 4))  # anchor == gt -> zero deltas
        good = retina_losses(anchors, good_cls, good_box, gt, labels, valid)
        bad_cls = jnp.full((1, 2, 3), -20.0).at[0, 1, 0].set(20.0)
        bad = retina_losses(anchors, bad_cls, good_box, gt, labels, valid)
        assert float(good["loss_retina_cls"]) < float(bad["loss_retina_cls"])
        assert float(good["loss_retina_reg"]) == pytest.approx(0.0, abs=1e-6)

    def test_finite_gradients(self, rng):
        anchors = jnp.asarray(rng.rand(8, 4).astype(np.float32) * 20)
        anchors = anchors.at[:, 2:].set(anchors[:, :2] + 5)
        gt = jnp.asarray(rng.rand(2, 3, 4).astype(np.float32) * 10)
        gt = gt.at[..., 2:].set(gt[..., :2] + 6)
        labels = jnp.ones((2, 3), jnp.int32)
        valid = jnp.asarray([[True, True, False], [True, False, False]])

        def total(logits, deltas):
            losses = retina_losses(anchors, logits, deltas, gt, labels, valid)
            return sum(losses.values())

        g1, g2 = jax.grad(total, argnums=(0, 1))(
            jnp.zeros((2, 8, 3)), jnp.zeros((2, 8, 4)))
        assert np.isfinite(np.asarray(g1)).all()
        assert np.isfinite(np.asarray(g2)).all()

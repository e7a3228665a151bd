"""Standalone ATSS head: shapes, per-level scale, class-label losses."""

import jax
import jax.numpy as jnp
import numpy as np

from lpi_tpu.models.glip.atss_head import ATSSDetHead, atss_class_losses

# NOT in the `-m fast` lane: head forward + loss compiles are 15-30s each
# on this 1-core box. These run in the default (`not slow`) suite.


def _anchors():
    # two "levels": 4 anchors on a coarse grid + 1 large one
    a = jnp.asarray([
        [0, 0, 10, 10], [10, 0, 20, 10], [0, 10, 10, 20], [10, 10, 20, 20],
        [0, 0, 20, 20],
    ], jnp.float32)
    return a, (4, 1)


class TestHead:
    def test_output_shapes_and_scale(self, rng):
        head = ATSSDetHead(num_classes=5, channels=8, num_convs=2)
        feats = [jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32)),
                 jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))]
        v = head.init(jax.random.PRNGKey(0), feats)
        out = head.apply(v, feats)
        assert out["cls_logits"][0].shape == (2, 8, 8, 5)
        assert out["bbox_pred"][1].shape == (2, 4, 4, 4)
        assert out["centerness"][0].shape == (2, 8, 8, 1)
        # doubling a level's scale doubles its bbox deltas only
        v2 = jax.tree_util.tree_map(lambda x: x, v)
        v2 = {"params": dict(v2["params"])}
        v2["params"]["scales"] = v["params"]["scales"].at[1].set(2.0)
        out2 = head.apply(v2, feats)
        np.testing.assert_allclose(np.asarray(out2["bbox_pred"][1]),
                                   2 * np.asarray(out["bbox_pred"][1]),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out2["bbox_pred"][0]),
                                   np.asarray(out["bbox_pred"][0]))

    def test_prior_prob_bias(self):
        head = ATSSDetHead(num_classes=3, channels=8, num_convs=1,
                           prior_prob=0.01)
        feats = [jnp.zeros((1, 4, 4, 8))]
        v = head.init(jax.random.PRNGKey(0), feats)
        p = jax.nn.sigmoid(head.apply(v, feats)["cls_logits"][0])
        np.testing.assert_allclose(np.asarray(p), 0.01, atol=2e-3)


class TestLosses:
    def test_perfect_prediction_low_loss(self):
        anchors, lc = _anchors()
        A = anchors.shape[0]
        gt = jnp.asarray([[[0, 0, 10, 10], [0, 0, 20, 20]]], jnp.float32)
        labels = jnp.asarray([[2, 1]], jnp.int32)
        valid = jnp.asarray([[True, True]])
        # "good": the anchor coincident with each GT scores its own class;
        # "miss": everything confidently background
        base = jnp.full((1, A, 3), -20.0)
        cls_good = base.at[0, 0, 1].set(20.0).at[0, 4, 0].set(20.0)
        bbox = jnp.zeros((1, A, 4))  # decode(0) == anchor box
        ctr = jnp.full((1, A), 10.0)
        good = atss_class_losses(anchors, lc, cls_good, bbox, ctr, gt,
                                 labels, valid)
        miss = atss_class_losses(anchors, lc, base, bbox, ctr, gt,
                                 labels, valid)
        assert float(miss["loss_cls"]) > float(good["loss_cls"])
        assert float(good["loss_reg"]) < 0.5  # anchors roughly match GTs

    def test_no_valid_gt_finite(self):
        anchors, lc = _anchors()
        A = anchors.shape[0]
        out = atss_class_losses(
            anchors, lc, jnp.zeros((1, A, 3)), jnp.zeros((1, A, 4)),
            jnp.zeros((1, A)), jnp.zeros((1, 2, 4)),
            jnp.zeros((1, 2), jnp.int32), jnp.zeros((1, 2), bool))
        for v in out.values():
            assert np.isfinite(float(v))

    def test_grads_flow(self):
        anchors, lc = _anchors()
        A = anchors.shape[0]
        gt = jnp.asarray([[[0, 0, 10, 10]]], jnp.float32)
        labels = jnp.asarray([[1]], jnp.int32)
        valid = jnp.asarray([[True]])

        def f(logits):
            out = atss_class_losses(anchors, lc, logits, jnp.zeros((1, A, 4)),
                                    jnp.zeros((1, A)), gt, labels, valid)
            return out["loss_cls"] + out["loss_reg"] + out["loss_centerness"]

        g = jax.grad(f)(jnp.zeros((1, A, 3)))
        assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0

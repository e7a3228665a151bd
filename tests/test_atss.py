"""Tests for anchors, ATSS matching/losses, postprocessing, and VLDyHead."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpi_tpu.core.config import DyHeadConfig
from lpi_tpu.models.glip.anchors import cell_anchors, concat_anchors, grid_anchors
from lpi_tpu.models.glip.atss import atss_losses, atss_match, centerness_targets
from lpi_tpu.models.glip.postprocess import atss_postprocess, grounding_scores
from lpi_tpu.models.glip.vldyhead import TunableLinear, VLDyHead
from lpi_tpu.ops.boxes import encode_boxes


class TestAnchors:
    def test_cell_anchor_square(self):
        a = cell_anchors(64.0)
        np.testing.assert_allclose(a, [[-32, -32, 32, 32]])

    def test_grid_layout(self):
        per = grid_anchors([(2, 3)], strides=[8], sizes=[64])
        assert per[0].shape == (6, 4)
        # first anchor centered at (0, 0), next at (8, 0)
        np.testing.assert_allclose(per[0][0], [-32, -32, 32, 32])
        np.testing.assert_allclose(per[0][1], [8 - 32, -32, 8 + 32, 32])

    def test_concat_counts(self):
        allа, counts = concat_anchors([(4, 4), (2, 2)], [8, 16], [64, 128])
        assert counts == [16, 4]
        assert allа.shape == (20, 4)


@pytest.fixture(scope="module")
def pyramid():
    """Two-level toy pyramid over a 64x64 image."""
    anchors, counts = concat_anchors([(8, 8), (4, 4)], strides=[8, 16],
                                     sizes=[16, 32])
    return jnp.asarray(anchors), tuple(counts)


class TestATSSMatch:
    def test_gt_matches_nearby_anchors(self, pyramid):
        anchors, counts = pyramid
        gt = jnp.asarray([[24.0, 24.0, 40.0, 40.0]])  # centered at (32, 32)
        valid = jnp.asarray([True])
        matched, pos = atss_match(anchors, counts, gt, valid)
        pos = np.asarray(pos)
        assert pos.sum() > 0
        # positives' anchor centers must be inside the GT box
        centers = np.asarray(anchors)[pos]
        cx = (centers[:, 0] + centers[:, 2]) / 2
        cy = (centers[:, 1] + centers[:, 3]) / 2
        assert ((cx > 24) & (cx < 40)).all()
        assert ((cy > 24) & (cy < 40)).all()
        assert (np.asarray(matched)[pos] == 0).all()

    def test_invalid_gt_produces_no_positives(self, pyramid):
        anchors, counts = pyramid
        gt = jnp.asarray([[24.0, 24.0, 40.0, 40.0]])
        matched, pos = atss_match(anchors, counts, gt, jnp.asarray([False]))
        assert not np.asarray(pos).any()

    def test_two_gts_claim_different_anchors(self, pyramid):
        anchors, counts = pyramid
        gt = jnp.asarray([[0.0, 0.0, 16.0, 16.0], [40.0, 40.0, 62.0, 62.0]])
        valid = jnp.asarray([True, True])
        matched, pos = atss_match(anchors, counts, gt, valid)
        m = np.asarray(matched)[np.asarray(pos)]
        assert set(m) == {0, 1}


class TestCenterness:
    def test_perfect_center_is_one(self, pyramid):
        anchors, _ = pyramid
        a0 = anchors[:1]
        gt = a0  # gt == anchor -> l=r, t=b -> centerness 1
        t = encode_boxes(gt, a0)
        c = centerness_targets(t, a0)
        assert float(c[0]) == pytest.approx(1.0, abs=1e-4)


class TestATSSLosses:
    def test_finite_and_sane(self, pyramid, rng):
        anchors, counts = pyramid
        A = anchors.shape[0]
        B, G, T = 2, 3, 12
        gt = jnp.asarray([[[24, 24, 40, 40], [0, 0, 16, 16], [0, 0, 0, 0]],
                          [[8, 8, 30, 30], [0, 0, 0, 0], [0, 0, 0, 0]]],
                         dtype=jnp.float32)
        gv = jnp.asarray([[True, True, False], [True, False, False]])
        pm = jnp.zeros((B, G, T)).at[:, :, 2:5].set(1.0)
        tm = jnp.ones((B, T))
        losses = atss_losses(
            anchors, counts,
            jnp.asarray(rng.randn(B, A, 4).astype(np.float32)),
            jnp.asarray(rng.randn(B, A).astype(np.float32)),
            jnp.asarray(rng.randn(B, A, T).astype(np.float32)),
            gt, gv, pm, tm)
        for k in ("loss_reg", "loss_centerness", "loss_dot_product_token"):
            assert np.isfinite(float(losses[k])), k
            assert float(losses[k]) >= 0
        assert float(losses["num_pos"]) > 0

    def test_good_predictions_give_lower_loss(self, pyramid):
        anchors, counts = pyramid
        A = anchors.shape[0]
        B, G, T = 1, 1, 12
        gt = jnp.asarray([[[22.0, 23, 41, 39]]])
        gv = jnp.asarray([[True]])
        pm = jnp.zeros((B, G, T)).at[:, :, 2:5].set(1.0)
        tm = jnp.ones((B, T))
        matched, pos = atss_match(anchors, counts, gt[0], gv[0])
        perfect_deltas = encode_boxes(jnp.broadcast_to(gt[0, 0], (A, 4)), anchors)
        good_logits = jnp.where(
            pos[:, None] * pm[0, 0][None, :] > 0, 8.0, -8.0)[None]
        noobj = jnp.zeros(T).at[-1].set(1.0)
        good_logits = jnp.where(pos[None, :, None], good_logits,
                                jnp.where(noobj[None, None, :] > 0, 8.0, -8.0))
        good = atss_losses(anchors, counts, perfect_deltas[None],
                           jnp.full((B, A), 3.0), good_logits, gt, gv, pm, tm)
        bad = atss_losses(anchors, counts, jnp.zeros((B, A, 4)),
                          jnp.zeros((B, A)), -good_logits, gt, gv, pm, tm)
        assert float(good["loss_reg"]) < float(bad["loss_reg"])
        assert float(good["loss_dot_product_token"]) < float(bad["loss_dot_product_token"])


class TestPostprocess:
    def test_grounding_scores_span_mean(self):
        logits = jnp.asarray([[10.0, 10.0, -10.0, -10.0]])
        label_map = jnp.asarray([[1.0, 1, 0, 0], [0, 0, 1, 1]])
        s = np.asarray(grounding_scores(logits, label_map))
        assert s[0, 0] == pytest.approx(1.0, abs=1e-3)
        assert s[0, 1] == pytest.approx(0.0, abs=1e-3)

    def test_top_box_recovered(self, pyramid):
        anchors, counts = pyramid
        A = anchors.shape[0]
        T = 8
        target_anchor = 27
        dot_logits = jnp.full((A, T), -10.0).at[target_anchor, 1:3].set(10.0)
        label_map = jnp.zeros((1, T)).at[0, 1:3].set(1.0)
        out = atss_postprocess(
            anchors, counts, jnp.zeros((A, 4)), jnp.full((A,), 5.0),
            dot_logits, label_map, image_size=(64, 64), post_nms_top_n=5)
        assert bool(out["valid"][0])
        np.testing.assert_allclose(np.asarray(out["boxes"][0]),
                                   np.clip(np.asarray(anchors[target_anchor]), 0, 64),
                                   atol=1e-3)
        assert int(out["labels"][0]) == 1


class TestVLDyHead:
    def test_forward_shapes(self, rng):
        cfg = DyHeadConfig(num_convs=2, channels=16, max_tokens=10)
        head = VLDyHead(cfg, lang_dim=16)
        feats = [jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32)),
                 jnp.asarray(rng.randn(2, 4, 4, 16).astype(np.float32))]
        emb = jnp.asarray(rng.randn(2, 10, 16).astype(np.float32))
        masks = jnp.ones((2, 10))
        variables = head.init(jax.random.PRNGKey(0), feats, emb, masks)
        out = head.apply(variables, feats, emb, masks)
        assert out["bbox_pred"][0].shape == (2, 8, 8, 4)
        assert out["centerness"][1].shape == (2, 4, 4, 1)
        assert out["dot_logits"][0].shape == (2, 64, 10)
        assert out["dot_logits"][1].shape == (2, 16, 10)

    def test_tunable_linear_zero_init_is_identity(self, rng):
        m = TunableLinear(dim=16, max_len=50)
        x = jnp.asarray(rng.randn(2, 10, 16).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(np.asarray(m.apply(v, x)), np.asarray(x))

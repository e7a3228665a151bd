"""Tests for the two-stage ROI box head + multilevel pooler + clip eval mode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpi_tpu.models.glip.roi_heads import (
    BoxHead,
    assign_levels,
    multilevel_roi_align,
    roi_box_loss,
)


class TestLevels:
    def test_small_box_low_level(self):
        boxes = jnp.asarray([[0.0, 0, 32, 32], [0, 0, 448, 448]])
        lv = np.asarray(assign_levels(boxes, k_min=2, k_max=5))
        assert lv[0] == 0  # 32px -> k=2 clamp -> index 0
        assert lv[1] == 3  # 448px -> k=5 -> index 3


class TestPooler:
    def test_pools_from_assigned_level(self, rng):
        feats = [jnp.full((1, 64, 64, 2), 1.0), jnp.full((1, 32, 32, 2), 2.0)]
        small = jnp.asarray([[0.0, 0, 0, 8, 8]])     # tiny -> level 0
        big = jnp.asarray([[0.0, 0, 0, 250, 250]])   # canonical-rule level 1
        p_small = multilevel_roi_align(feats, small, strides=[4, 8], out_size=2)
        p_big = multilevel_roi_align(feats, big, strides=[4, 8], out_size=2)
        np.testing.assert_allclose(np.asarray(p_small), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(p_big), 2.0, atol=1e-5)


class TestBoxHead:
    def test_shapes_and_loss(self, rng):
        head = BoxHead(num_classes=3, hidden=32)
        pooled = jnp.asarray(rng.randn(6, 4, 4, 8).astype(np.float32))
        v = head.init(jax.random.PRNGKey(0), pooled)
        cls_logits, deltas = head.apply(v, pooled)
        assert cls_logits.shape == (6, 4) and deltas.shape == (6, 3, 4)

        proposals = jnp.asarray(rng.rand(6, 4).astype(np.float32) * 50)
        proposals = proposals.at[:, 2:].add(60)
        labels = jnp.asarray([0, 1, 2, 3, 0, 1])
        gts = proposals + 2.0
        valid = jnp.asarray([True] * 5 + [False])
        losses = roi_box_loss(cls_logits, deltas, proposals, labels, gts, valid)
        assert np.isfinite(losses["loss_classifier"])
        assert np.isfinite(losses["loss_box_reg"])

    def test_perfect_cls_lowers_loss(self, rng):
        R, C = 4, 2
        labels = jnp.asarray([0, 1, 2, 1])
        good = jax.nn.one_hot(labels, C + 1) * 20.0
        bad = -good
        proposals = jnp.asarray(rng.rand(R, 4).astype(np.float32) * 10)
        deltas = jnp.zeros((R, C, 4))
        valid = jnp.ones(R, bool)
        lg = roi_box_loss(good, deltas, proposals, labels, proposals, valid)
        lb = roi_box_loss(bad, deltas, proposals, labels, proposals, valid)
        assert float(lg["loss_classifier"]) < float(lb["loss_classifier"])
        # gt == proposals and zero deltas -> zero regression loss
        assert float(lg["loss_box_reg"]) == pytest.approx(0.0, abs=1e-5)


class TestClipZeroShot:
    def test_slinet_clip_mode_and_eval(self, rng):
        from tests.test_continual import TINY_CFG
        from lpi_tpu.continual.learner import RetrievalLearner
        from lpi_tpu.data.retrieval import synthetic_eval
        from lpi_tpu.data.tokenizer import ClipTokenizer

        cfg = dataclasses.replace(
            TINY_CFG, lpi=dataclasses.replace(TINY_CFG.lpi, prompt_type="clip"))
        learner = RetrievalLearner(cfg, task_sim_matrix=np.eye(3))
        tok = ClipTokenizer()
        ev = synthetic_eval(1, 6, tokenizer=tok, n_ctx=4)
        res = learner.evaluate(ev, num_tasks=1)
        assert np.isfinite(res["summary"]["r_mean"])
        assert res["task_id_accuracy"]["visual"] == 1.0  # all zeros == cat 0

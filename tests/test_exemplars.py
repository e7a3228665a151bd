"""Tests for herding exemplar memory (BaseLearner equivalent)."""

import numpy as np
import pytest

from lpi_tpu.continual.exemplars import ExemplarMemory, herding_selection


class TestHerding:
    def test_first_pick_is_closest_to_mean(self, rng):
        feats = rng.randn(50, 8)
        idx = herding_selection(feats, 5)
        assert len(idx) == 5 and len(set(idx.tolist())) == 5
        normed = feats / np.linalg.norm(feats, axis=1, keepdims=True)
        mu = normed.mean(0)
        assert idx[0] == int(np.argmax(normed @ mu))

    def test_mean_tracking_beats_random(self, rng):
        feats = rng.randn(200, 16)
        normed = feats / np.linalg.norm(feats, axis=1, keepdims=True)
        mu = normed.mean(0)
        sel = herding_selection(feats, 10)
        herd_err = np.linalg.norm(normed[sel].mean(0) - mu)
        rand_errs = [np.linalg.norm(
            normed[rng.choice(200, 10, replace=False)].mean(0) - mu)
            for _ in range(20)]
        assert herd_err < np.median(rand_errs)


class TestExemplarMemory:
    def test_budget_rebalances(self, rng):
        mem = ExemplarMemory(memory_size=20)
        mem.update(0, rng.randn(50, 8))
        assert len(mem.exemplars(0)) == 20
        mem.update(1, rng.randn(50, 8))
        assert len(mem.exemplars(0)) == 10
        assert len(mem.exemplars(1)) == 10

    def test_zero_budget_noop(self, rng):
        mem = ExemplarMemory(memory_size=0)
        mem.update(0, rng.randn(10, 4))
        assert mem.store == {}

    def test_nme_classification(self, rng):
        mem = ExemplarMemory(memory_size=40)
        a = rng.randn(30, 8) * 0.1 + np.r_[5.0, np.zeros(7)]
        b = rng.randn(30, 8) * 0.1 + np.r_[-5.0, np.zeros(7)]
        mem.update(0, a)
        mem.update(1, b)
        pred = mem.nme_classify(np.concatenate([a[:5], b[:5]]))
        np.testing.assert_array_equal(pred, [0] * 5 + [1] * 5)

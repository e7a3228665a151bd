"""LVIS evaluator semantics on tiny fixtures: federated ignore rule,
frequency bins, AP math (vs hand-computed values)."""

import numpy as np
import pytest

from lpi_tpu.eval.lvis import LvisEvaluator, frequency_bin

pytestmark = pytest.mark.fast

BOX = [0, 0, 10, 10]
OFF = [50, 50, 60, 60]


class TestFrequencyBin:
    def test_bins(self):
        assert frequency_bin(3) == "r"
        assert frequency_bin(10) == "c"
        assert frequency_bin(99) == "c"
        assert frequency_bin(100) == "f"


class TestLvisEvaluator:
    def test_perfect_detection(self):
        ev = LvisEvaluator()
        ev.update([BOX], [0.9], [1], [BOX], [1])
        res = ev.summarize()
        assert res["AP"] == pytest.approx(1.0)
        assert res["AP50"] == pytest.approx(1.0)

    def test_federated_ignore_rule(self):
        """A detection of category 2 on an image whose allowed set excludes 2
        must be IGNORED (not a false positive)."""
        # image 1: gt cat 1, allowed {1}; a spurious cat-2 det here
        # image 2: gt cat 2, allowed {2}; perfect cat-2 det
        ev = LvisEvaluator()
        ev.update([BOX, OFF], [0.9, 0.95], [1, 2], [BOX], [1],
                  pos_cats=[1], neg_cats=[])
        ev.update([BOX], [0.9], [2], [BOX], [2], pos_cats=[2], neg_cats=[])
        res = ev.summarize()
        # cat 2's spurious image-1 detection is ignored -> AP stays 1.0
        assert res["per_class"][2] == pytest.approx(1.0)
        assert res["AP"] == pytest.approx(1.0)

    def test_coco_mode_counts_fp(self):
        """Without pos/neg sets the same spurious detection IS a FP."""
        ev = LvisEvaluator()
        ev.update([BOX, OFF], [0.9, 0.95], [1, 2], [BOX], [1])
        ev.update([BOX], [0.9], [2], [BOX], [2])
        res = ev.summarize()
        # the higher-scored spurious det precedes the TP: precision drops
        assert res["per_class"][2] < 1.0

    def test_neg_cats_make_fp(self):
        """Detections of a category in the image's NEG set are real FPs."""
        ev = LvisEvaluator()
        ev.update([OFF], [0.95], [2], [BOX], [1], pos_cats=[1], neg_cats=[2])
        ev.update([BOX], [0.9], [2], [BOX], [2], pos_cats=[2], neg_cats=[])
        res = ev.summarize()
        assert res["per_class"][2] < 1.0

    def test_frequency_bins_reported(self):
        ev = LvisEvaluator(category_image_counts={1: 2, 2: 50, 3: 1000})
        for c in (1, 2, 3):
            ev.update([BOX], [0.9], [c], [BOX], [c])
        res = ev.summarize()
        assert res["APr"] == pytest.approx(1.0)
        assert res["APc"] == pytest.approx(1.0)
        assert res["APf"] == pytest.approx(1.0)

    def test_max_dets_truncation(self):
        ev = LvisEvaluator(max_dets=1)
        ev.update([OFF, BOX], [0.95, 0.9], [1, 1], [BOX], [1])
        res = ev.summarize()
        # only the (miss) top-1 det survives
        assert res["AP"] == pytest.approx(0.0)

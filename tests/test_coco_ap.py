"""Tests for the from-scratch COCO-style mAP evaluator."""

import numpy as np
import pytest

from lpi_tpu.eval.coco_ap import evaluate_detections


def det(boxes, scores, labels):
    return {"boxes": np.asarray(boxes, float), "scores": np.asarray(scores, float),
            "labels": np.asarray(labels)}


def gt(boxes, labels):
    return {"boxes": np.asarray(boxes, float), "labels": np.asarray(labels)}


class TestCocoAP:
    def test_perfect_detections(self):
        g = [gt([[0, 0, 10, 10], [20, 20, 40, 40]], [1, 2])]
        d = [det([[0, 0, 10, 10], [20, 20, 40, 40]], [0.9, 0.8], [1, 2])]
        res = evaluate_detections(d, g)
        assert res["mAP"] == pytest.approx(1.0, abs=1e-6)
        assert res["AP50"] == pytest.approx(1.0, abs=1e-6)
        assert res["per_class"][1] == pytest.approx(1.0, abs=1e-6)

    def test_wrong_class_scores_zero(self):
        g = [gt([[0, 0, 10, 10]], [1])]
        d = [det([[0, 0, 10, 10]], [0.9], [2])]
        res = evaluate_detections(d, g)
        assert res["mAP"] == pytest.approx(0.0, abs=1e-6)

    def test_localization_quality_matters(self):
        g = [gt([[0, 0, 10, 10]], [1])]
        # IoU = 0.69 box: counts at 0.5-0.65 but not at >=0.7 thresholds
        d = [det([[0, 0, 10, 6.9]], [0.9], [1])]
        res = evaluate_detections(d, g)
        assert res["AP50"] == pytest.approx(1.0, abs=1e-6)
        assert np.isnan(res["AP75"]) or res["AP75"] == pytest.approx(0.0, abs=1e-6)
        assert 0 < res["mAP"] < 1

    def test_false_positives_reduce_precision(self):
        g = [gt([[0, 0, 10, 10]], [1])]
        clean = [det([[0, 0, 10, 10]], [0.9], [1])]
        noisy = [det([[0, 0, 10, 10], [50, 50, 60, 60]], [0.5, 0.9], [1, 1])]
        ap_clean = evaluate_detections(clean, g)["AP50"]
        ap_noisy = evaluate_detections(noisy, g)["AP50"]
        assert ap_noisy < ap_clean

    def test_duplicate_detections_count_once(self):
        g = [gt([[0, 0, 10, 10]], [1])]
        d = [det([[0, 0, 10, 10], [0, 0, 10, 10]], [0.9, 0.8], [1, 1])]
        res = evaluate_detections(d, g, iou_thresholds=(0.5,))
        # second det is a FP -> precision envelope still 1.0 at recall 1.0
        # but max recall is 1 with one TP; AP stays 1.0 since FP comes after TP
        assert res["AP50"] == pytest.approx(1.0, abs=1e-6)
        d2 = [det([[0, 0, 10, 10], [0, 0, 10, 10]], [0.8, 0.9], [1, 1])]
        res2 = evaluate_detections(d2, g, iou_thresholds=(0.5,))
        # now the duplicate outranks the TP... still greedy-matches first det
        assert res2["AP50"] == pytest.approx(1.0, abs=1e-6)

    def test_multi_image_aggregation(self):
        g = [gt([[0, 0, 10, 10]], [1]), gt([[0, 0, 10, 10]], [1])]
        d = [det([[0, 0, 10, 10]], [0.9], [1]), det([], [], [])]
        res = evaluate_detections(d, g, iou_thresholds=(0.5,))
        assert res["AP50"] == pytest.approx(0.5, abs=0.01)  # recall caps at 0.5


class TestFlickrEvaluator:
    def test_recall_at_k(self):
        from lpi_tpu.eval.flickr import FlickrEvaluator

        ev = FlickrEvaluator(ks=(1, 5))
        # phrase 1: top box hits
        ev.update([[0, 0, 10, 10], [50, 50, 60, 60]], [0.9, 0.1], [[0, 0, 10, 10]])
        # phrase 2: hit only at rank 2
        ev.update([[50, 50, 60, 60], [0, 0, 10, 10]], [0.9, 0.8], [[0, 0, 10, 10]])
        # phrase 3: never hit
        ev.update([[50, 50, 60, 60]], [0.9], [[0, 0, 10, 10]])
        res = ev.summarize()
        assert res["R@1"] == pytest.approx(100 / 3)
        assert res["R@5"] == pytest.approx(200 / 3)
        assert res["upper_bound"] == pytest.approx(200 / 3)
        assert res["num_phrases"] == 3

    def test_multiple_gt_boxes(self):
        from lpi_tpu.eval.flickr import FlickrEvaluator

        ev = FlickrEvaluator(ks=(1,))
        ev.update([[20, 20, 30, 30]], [0.9],
                  [[0, 0, 10, 10], [20, 20, 30, 30]])
        assert ev.summarize()["R@1"] == 100.0

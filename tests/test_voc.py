"""VOC evaluation protocol: matching quirks + AP metrics."""

import numpy as np
import pytest

from lpi_tpu.eval.voc import eval_detection_voc, voc_ap, voc_prec_rec

pytestmark = pytest.mark.fast


def _gt(boxes, labels, difficult=None):
    g = {"boxes": np.asarray(boxes, float), "labels": np.asarray(labels)}
    if difficult is not None:
        g["difficult"] = np.asarray(difficult, bool)
    return g


def _pred(boxes, labels, scores):
    return {"boxes": np.asarray(boxes, float), "labels": np.asarray(labels),
            "scores": np.asarray(scores, float)}


class TestMatching:
    def test_perfect_detection(self):
        gts = [_gt([[0, 0, 10, 10]], [1])]
        preds = [_pred([[0, 0, 10, 10]], [1], [0.9])]
        res = eval_detection_voc(gts, preds, use_07_metric=False)
        assert res["ap"][1] == pytest.approx(1.0)

    def test_duplicate_detection_is_fp(self):
        gts = [_gt([[0, 0, 10, 10]], [1])]
        preds = [_pred([[0, 0, 10, 10], [0, 0, 10, 10]], [1, 1], [0.9, 0.8])]
        prec, rec = voc_prec_rec(gts, preds)
        # first hit TP, second FP
        np.testing.assert_array_equal(rec[1], [1.0, 1.0])
        np.testing.assert_allclose(prec[1], [1.0, 0.5])

    def test_difficult_not_counted(self):
        gts = [_gt([[0, 0, 10, 10], [20, 20, 30, 30]], [1, 1],
                   difficult=[False, True])]
        # one detection on the difficult GT: neither TP nor FP
        preds = [_pred([[20, 20, 30, 30]], [1], [0.9])]
        prec, rec = voc_prec_rec(gts, preds)
        assert len(prec[1]) == 1 and np.isnan(prec[1][0])  # 0/0
        assert rec[1][0] == 0.0  # n_pos counts only non-difficult

    def test_low_iou_is_fp(self):
        gts = [_gt([[0, 0, 10, 10]], [1])]
        preds = [_pred([[8, 8, 18, 18]], [1], [0.9])]
        prec, rec = voc_prec_rec(gts, preds)
        assert prec[1][0] == 0.0 and rec[1][0] == 0.0


class TestAP:
    def test_07_metric_11_points(self):
        # precision 1.0 up to recall 0.5, then 0.5 -> 11-point average
        prec = [None, np.array([1.0, 0.5])]
        rec = [None, np.array([0.5, 1.0])]
        ap = voc_ap(prec, rec, use_07_metric=True)
        # recall thresholds 0..0.5 take p=1.0 (6 pts), 0.6..1.0 take 0.5
        assert ap[1] == pytest.approx((6 * 1.0 + 5 * 0.5) / 11)

    def test_area_metric(self):
        prec = [np.array([1.0, 0.5])]
        rec = [np.array([0.5, 1.0])]
        ap = voc_ap(prec, rec, use_07_metric=False)
        assert ap[0] == pytest.approx(0.5 * 1.0 + 0.5 * 0.5)

    def test_map_nanmean(self):
        gts = [_gt([[0, 0, 10, 10]], [2])]
        preds = [_pred([[0, 0, 10, 10]], [2], [0.9])]
        res = eval_detection_voc(gts, preds, use_07_metric=False)
        assert np.isnan(res["ap"][0]) and np.isnan(res["ap"][1])
        assert res["map"] == pytest.approx(1.0)  # nanmean skips absent classes


class TestCli:
    def test_eval_detection_voc(self, tmp_path, capsys):
        import json

        from lpi_tpu.cli.main import main

        gt = {"images": [{"id": 1}], "categories": [{"id": 1, "name": "c"}],
              "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                               "bbox": [0, 0, 10, 10]}]}
        preds = [{"image_id": 1, "boxes": [[0, 0, 10, 10]], "scores": [0.9],
                  "labels": [1]}]
        (tmp_path / "gt.json").write_text(json.dumps(gt))
        (tmp_path / "p.json").write_text(json.dumps(preds))
        res = main(["eval-detection", str(tmp_path / "p.json"),
                    "--gt", str(tmp_path / "gt.json"), "--protocol", "voc"])
        assert res["map"] == pytest.approx(1.0)

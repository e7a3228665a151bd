"""Flickr30k-entities phrase-grounding Recall@k.

Role of the reference's `evaluation/flickr_eval.py` (SURVEY §2.3 G20): a
phrase is recalled at k if any of its top-k score-sorted predicted boxes
reaches IoU >= `thresh` with any of the phrase's (merged) ground-truth
boxes; also reports the recall upper bound (any prediction at all hitting).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from lpi_tpu.eval.coco_ap import _iou_matrix


class FlickrEvaluator:
    def __init__(self, ks: Sequence[int] = (1, 5, 10), thresh: float = 0.5):
        self.ks = tuple(ks)
        self.thresh = thresh
        self.records: List[dict] = []

    def update(self, boxes: np.ndarray, scores: np.ndarray,
               gt_boxes: np.ndarray):
        """One phrase: predicted (boxes, scores) vs its gt box set."""
        boxes = np.asarray(boxes, float).reshape(-1, 4)
        gt_boxes = np.asarray(gt_boxes, float).reshape(-1, 4)
        order = np.argsort(-np.asarray(scores)) if len(boxes) else np.zeros(0, int)
        iou = _iou_matrix(boxes[order], gt_boxes)
        hit_any = iou.max(axis=1) >= self.thresh if iou.size else np.zeros(0, bool)
        self.records.append({
            k: bool(hit_any[:k].any()) for k in self.ks
        } | {"upper": bool(hit_any.any())})

    def summarize(self) -> Dict[str, float]:
        n = max(len(self.records), 1)
        out = {f"R@{k}": 100.0 * sum(r[k] for r in self.records) / n
               for k in self.ks}
        out["upper_bound"] = 100.0 * sum(r["upper"] for r in self.records) / n
        out["num_phrases"] = len(self.records)
        return out

"""RetinaNet head — the reference's classic one-stage alternative head.

Compact equivalent of `maskrcnn_benchmark/modeling/rpn/retina.py`
(RetinaNetHead/RetinaNetModule, registered `RPN_HEADS "RetinaNetHead"` —
SURVEY §2.3 G19, unused by LPI configs) with the focal-loss matcher of
`modeling/rpn/loss.py` (`make_focal_loss_evaluator`, RETINANET/FOCAL
defaults `config/defaults.py:322-353`):

* shared 4-conv class/box towers over FPN levels, A anchors per location
  (class logits [B,H,W,A*C] bias-initialized to prior_prob, box deltas
  [B,H,W,A*4]);
* IoU matcher: fg >= 0.5, bg < 0.4, in-between ignored; each GT also claims
  its best-IoU anchor (low-quality matches);
* losses: sigmoid focal (alpha .25, gamma 2) on non-ignored anchors,
  normalized by #fg; smooth-L1 (beta 0.11, weight 4.0) on encoded deltas.

Static shapes: padded GT boxes + validity masks, vmapped over the batch.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lpi_tpu.ops.boxes import box_iou, encode_boxes
from lpi_tpu.ops.focal import sigmoid_focal_loss


class RetinaNetHead(nn.Module):
    num_classes: int  # foreground classes (sigmoid; no background slot)
    num_anchors: int = 9  # len(aspect_ratios) * scales_per_octave
    channels: int = 256
    num_convs: int = 4  # MODEL.RETINANET.NUM_CONVS
    prior_prob: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        c = self.channels
        A = self.num_anchors
        bias_value = -np.log((1 - self.prior_prob) / self.prior_prob)
        cls_tower = [nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name=f"cls_tower{i}") for i in range(self.num_convs)]
        box_tower = [nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name=f"bbox_tower{i}") for i in range(self.num_convs)]
        cls_head = nn.Conv(A * self.num_classes, (3, 3), padding="SAME",
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(bias_value),
                           name="cls_logits")
        box_head = nn.Conv(A * 4, (3, 3), padding="SAME",
                           kernel_init=nn.initializers.normal(0.01),
                           name="bbox_pred")

        out = {"cls_logits": [], "bbox_pred": []}
        for f in features:
            ct = f
            bt = f
            for conv in cls_tower:
                ct = jax.nn.relu(conv(ct))
            for conv in box_tower:
                bt = jax.nn.relu(conv(bt))
            out["cls_logits"].append(cls_head(ct))
            out["bbox_pred"].append(box_head(bt))
        return out


def retina_match(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                 gt_valid: jnp.ndarray, fg_iou: float = 0.5,
                 bg_iou: float = 0.4):
    """Matcher semantics of `Matcher(0.5, 0.4, True)` for one image.

    -> (matched_gt_index [A] (valid where fg), fg [A], ignore [A])."""
    iou = box_iou(anchors, gt_boxes)  # [A, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    fg = best_iou >= fg_iou
    ignore = (best_iou >= bg_iou) & ~fg
    # allow low-quality matches: each valid gt claims its best anchor
    best_anchor = jnp.argmax(iou, axis=0)  # [G]
    claimed = jnp.zeros(anchors.shape[0], bool).at[best_anchor].set(
        gt_valid, mode="drop")
    gt_for_claim = jnp.zeros(anchors.shape[0], jnp.int32).at[best_anchor].set(
        jnp.arange(gt_boxes.shape[0], dtype=jnp.int32), mode="drop")
    fg = fg | claimed
    ignore = ignore & ~claimed
    matched = jnp.where(claimed, gt_for_claim, best_gt)
    return matched, fg, ignore


def retina_losses(anchors: jnp.ndarray, cls_logits: jnp.ndarray,
                  bbox_pred: jnp.ndarray, gt_boxes: jnp.ndarray,
                  gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
                  alpha: float = 0.25, gamma: float = 2.0,
                  reg_beta: float = 0.11, reg_weight: float = 4.0):
    """Batched focal-loss evaluator.

    cls_logits [B, A, C] (A = total anchors across levels, flattened);
    bbox_pred [B, A, 4]; gt_labels 1-based class ids (the reference's COCO
    convention — logit column c-1 scores class c, 0 = background).
    """

    def one(cl, bp, boxes, labels, valid):
        matched, fg, ignore = retina_match(anchors, boxes, valid)
        tgt = jnp.where(fg, jnp.take(labels, matched, mode="clip"), 0)
        tgt = jnp.where(ignore, -1, tgt)  # focal's ignore sentinel
        cls = sigmoid_focal_loss(cl, tgt, alpha=alpha, gamma=gamma).sum()
        deltas = encode_boxes(jnp.take(boxes, matched, axis=0, mode="clip"),
                              anchors)
        diff = jnp.abs(bp - deltas)
        sl1 = jnp.where(diff < reg_beta, 0.5 * diff * diff / reg_beta,
                        diff - 0.5 * reg_beta).sum(-1)
        reg = jnp.where(fg, sl1, 0.0).sum()
        num_fg = jnp.maximum(fg.sum(), 1.0)
        return cls / num_fg, reg_weight * reg / num_fg / 4.0

    cls, reg = jax.vmap(one)(cls_logits, bbox_pred, gt_boxes, gt_labels,
                             gt_valid)
    return {"loss_retina_cls": cls.mean(), "loss_retina_reg": reg.mean()}

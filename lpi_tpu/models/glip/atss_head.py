"""Standalone ATSS detection head — the reference's class-based ATSS module.

Compact equivalent of `maskrcnn_benchmark/modeling/rpn/atss.py:75-260`
(ATSSHead/ATSSModule, registered `RPN_HEADS "ATSSHead"` — SURVEY §2.3 G19,
unused by LPI configs which route through VLDyHead instead):

* separate NUM_CONVS-deep class/box towers over FPN levels (plain 3x3 convs;
  the DFConv/DyReLU/SE tower options live in VLDyHead's DyConv which this
  head shares via config when needed);
* heads: per-anchor class logits (sigmoid, C foreground classes, bias
  prior-initialized), box deltas through a per-level learnable Scale
  (`atss.py:171-186`), and centerness;
* losses (`modeling/rpn/loss.py` class path, shared ATSS assignment):
  sigmoid focal (alpha .25 gamma 2) on 1-based class labels normalized by
  #pos, GIoU regression weighted by centerness targets, centerness BCE —
  identical matcher to the token head (`atss.py:36` here).

Static shapes: padded GT + validity masks, vmapped over the batch.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lpi_tpu.models.glip.atss import atss_match, centerness_targets
from lpi_tpu.ops.boxes import decode_boxes, elementwise_giou, encode_boxes
from lpi_tpu.ops.focal import sigmoid_focal_loss


class ATSSDetHead(nn.Module):
    num_classes: int  # foreground classes (sigmoid; no background slot)
    num_anchors: int = 1  # ATSS default: 1 anchor/location (octave 1, ratio 1)
    channels: int = 128  # MODEL.ATSS.CHANNELS
    num_convs: int = 2  # MODEL.ATSS.NUM_CONVS
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
        ctr_head = nn.Conv(A, (3, 3), padding="SAME",
                           kernel_init=nn.initializers.normal(0.01),
                           name="centerness")
        scales = self.param("scales", nn.initializers.ones, (len(features),))

        out = {"cls_logits": [], "bbox_pred": [], "centerness": []}
        for l, f in enumerate(features):
            ct = f
            bt = f
            for conv in cls_tower:
                ct = jax.nn.relu(conv(ct))
            for conv in box_tower:
                bt = jax.nn.relu(conv(bt))
            out["cls_logits"].append(cls_head(ct))
            out["bbox_pred"].append(box_head(bt) * scales[l])
            out["centerness"].append(ctr_head(bt))
        return out


def atss_class_losses(
    anchors: jnp.ndarray,  # [A, 4]
    level_counts: tuple,
    cls_logits: jnp.ndarray,  # [B, A, C]
    bbox_pred: jnp.ndarray,  # [B, A, 4] deltas
    centerness: jnp.ndarray,  # [B, A]
    gt_boxes: jnp.ndarray,  # [B, G, 4]
    gt_labels: jnp.ndarray,  # [B, G] 1-based class ids
    gt_valid: jnp.ndarray,  # [B, G]
    topk: int = 9,
    reg_loss_weight: float = 2.0,
):
    """Class-label ATSS losses (`rpn/atss.py:209-229` → `loss.py` class path)."""
    matched, pos = jax.vmap(
        lambda gb, gv: atss_match(anchors, level_counts, gb, gv, topk)
    )(gt_boxes, gt_valid)  # [B, A]

    labels = jnp.take_along_axis(gt_labels, matched, axis=1)  # [B, A]
    labels = jnp.where(pos, labels, 0)  # 0 = background
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)
    flat_logits = cls_logits.reshape(-1, cls_logits.shape[-1])
    cls = sigmoid_focal_loss(flat_logits, labels.reshape(-1)).sum() / num_pos

    matched_boxes = jnp.take_along_axis(gt_boxes, matched[..., None], axis=1)
    reg_targets = encode_boxes(matched_boxes, anchors[None])
    ctr_t = jnp.where(pos, centerness_targets(reg_targets, anchors[None]), 0.0)
    sum_ctr = jnp.maximum(jnp.sum(ctr_t), 1e-6)

    pred_boxes = decode_boxes(bbox_pred, anchors[None])
    giou = elementwise_giou(pred_boxes, matched_boxes)
    loss_reg = jnp.sum(jnp.where(pos, (1.0 - giou) * ctr_t, 0.0)) / sum_ctr

    bce = jnp.maximum(centerness, 0) - centerness * ctr_t + jnp.log1p(
        jnp.exp(-jnp.abs(centerness)))
    loss_ctr = jnp.sum(jnp.where(pos, bce, 0.0)) / num_pos

    return {
        "loss_cls": cls,
        "loss_reg": loss_reg * reg_loss_weight,
        "loss_centerness": loss_ctr,
    }

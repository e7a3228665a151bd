"""ATSS matcher + GLIP grounding losses, static-shape.

Equivalent of `maskrcnn_benchmark/modeling/rpn/loss.py:518-1185`
(ATSSLossComputation) for the LPI path:

* ATSS assignment (`loss.py:737-780`): per FPN level the top-k=9 anchors by
  center distance per GT are candidates; positives are candidates with
  IoU >= mean+std(candidates) whose centers lie inside the GT (>0.01);
  an anchor claimed by several GTs keeps the highest-IoU one.
* Per-anchor token labels (`loss.py:782-792`): positives inherit the GT's
  positive_map row; negatives get the [NoObj] convention — last text token
  set to 1.
* Losses (`loss.py:1146-1185`): token-sigmoid focal on dot-product logits
  / num_pos_avg, GIoU regression on positives weighted by centerness
  targets / sum(centerness), centerness BCE / num_pos_avg; reg x 2.0.

All shapes are padded/static: GTs come as [G, 4] + validity mask; the whole
assignment is one vmap'd tensor program (no per-image Python loops).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lpi_tpu.ops.boxes import box_center, box_iou, decode_boxes, elementwise_giou, encode_boxes
from lpi_tpu.ops.focal import token_sigmoid_focal_loss

INF = 1e8


def atss_match(
    anchors: jnp.ndarray,  # [A, 4]
    level_counts: Sequence[int],  # python ints, sum == A
    gt_boxes: jnp.ndarray,  # [G, 4] padded
    gt_valid: jnp.ndarray,  # [G] bool
    topk: int = 9,
):
    """Single-image ATSS assignment.

    Returns (matched_gt [A] int32 — index into G, pos_mask [A] bool).
    """
    A = anchors.shape[0]
    G = gt_boxes.shape[0]
    iou = box_iou(anchors, gt_boxes)  # [A, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)

    ac = box_center(anchors)  # [A, 2]
    gc = box_center(gt_boxes)  # [G, 2]
    dist = jnp.sqrt(jnp.sum((ac[:, None] - gc[None]) ** 2, axis=-1))  # [A, G]

    candidate = jnp.zeros((A, G), bool)
    start = 0
    for n_l in level_counts:
        k = min(topk, n_l)
        d_l = dist[start:start + n_l]  # [n_l, G]
        _, idx = jax.lax.top_k(-d_l.T, k)  # [G, k] smallest distances
        m = jnp.zeros((G, n_l), bool).at[
            jnp.arange(G)[:, None], idx].set(True).T  # [n_l, G]
        candidate = candidate.at[start:start + n_l].set(m)
        start += n_l

    k_tot = sum(min(topk, n) for n in level_counts)
    # IoU statistics over each GT's candidate set (fixed size k_tot)
    cand_iou = jnp.where(candidate, iou, 0.0)
    mean = jnp.sum(cand_iou, axis=0) / k_tot
    var = jnp.sum(jnp.where(candidate, (iou - mean[None]) ** 2, 0.0), axis=0) / max(k_tot - 1, 1)
    thresh = mean + jnp.sqrt(var)  # [G]

    # center-inside-gt (>0.01 margin, loss.py:765-770)
    l = ac[:, None, 0] - gt_boxes[None, :, 0]
    t = ac[:, None, 1] - gt_boxes[None, :, 1]
    r = gt_boxes[None, :, 2] - ac[:, None, 0]
    b = gt_boxes[None, :, 3] - ac[:, None, 1]
    inside = jnp.min(jnp.stack([l, t, r, b], axis=-1), axis=-1) > 0.01

    is_pos = candidate & (iou >= thresh[None]) & inside & gt_valid[None, :]
    iou_masked = jnp.where(is_pos, iou, -INF)
    matched_gt = jnp.argmax(iou_masked, axis=1)  # [A]
    pos_mask = jnp.max(iou_masked, axis=1) > -INF
    return matched_gt.astype(jnp.int32), pos_mask


def centerness_targets(reg_targets: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """sqrt((min(l,r)/max(l,r)) * (min(t,b)/max(t,b))) (`loss.py:832-850`)."""
    gts = decode_boxes(reg_targets, anchors)
    c = box_center(anchors)
    l = c[..., 0] - gts[..., 0]
    t = c[..., 1] - gts[..., 1]
    r = gts[..., 2] - c[..., 0]
    b = gts[..., 3] - c[..., 1]
    lr_min = jnp.minimum(l, r)
    lr_max = jnp.maximum(l, r)
    tb_min = jnp.minimum(t, b)
    tb_max = jnp.maximum(t, b)
    val = (lr_min / jnp.clip(lr_max, 1e-9)) * (tb_min / jnp.clip(tb_max, 1e-9))
    return jnp.sqrt(jnp.clip(val, 0.0))


@partial(jax.jit, static_argnames=("level_counts", "topk", "reg_loss_weight"))
def atss_losses(
    anchors: jnp.ndarray,  # [A, 4]
    level_counts: tuple,
    bbox_pred: jnp.ndarray,  # [B, A, 4] deltas
    centerness: jnp.ndarray,  # [B, A]
    dot_logits: jnp.ndarray,  # [B, A, T]
    gt_boxes: jnp.ndarray,  # [B, G, 4]
    gt_valid: jnp.ndarray,  # [B, G]
    positive_map: jnp.ndarray,  # [B, G, T]
    text_masks: jnp.ndarray,  # [B, T]
    topk: int = 9,
    reg_loss_weight: float = 2.0,
):
    """Batch grounding losses. Returns dict(loss_reg, loss_centerness,
    loss_dot_product_token)."""
    B, A, T = dot_logits.shape

    matched, pos = jax.vmap(
        lambda gb, gv: atss_match(anchors, level_counts, gb, gv, topk)
    )(gt_boxes, gt_valid)  # [B, A], [B, A]

    # token labels: positive anchors inherit their GT's map; negatives [NoObj]
    tok = jnp.take_along_axis(positive_map, matched[..., None], axis=1)  # [B, A, T]
    noobj = jnp.zeros((T,)).at[-1].set(1.0)
    token_labels = jnp.where(pos[..., None], tok, noobj[None, None, :])

    num_pos_raw = jnp.sum(pos)
    num_pos = jnp.maximum(num_pos_raw, 1.0)
    tok_loss = token_sigmoid_focal_loss(dot_logits, token_labels, text_masks)
    loss_dot = jnp.sum(tok_loss) / num_pos

    matched_boxes = jnp.take_along_axis(gt_boxes, matched[..., None], axis=1)
    reg_targets = encode_boxes(matched_boxes, anchors[None])  # [B, A, 4]
    ctr_t = centerness_targets(reg_targets, anchors[None])  # [B, A]
    ctr_t = jnp.where(pos, ctr_t, 0.0)
    sum_ctr = jnp.maximum(jnp.sum(ctr_t), 1e-6)

    pred_boxes = decode_boxes(bbox_pred, anchors[None])
    giou = elementwise_giou(pred_boxes, matched_boxes)
    loss_reg = jnp.sum(jnp.where(pos, (1.0 - giou) * ctr_t, 0.0)) / sum_ctr

    bce = jnp.maximum(centerness, 0) - centerness * ctr_t + jnp.log1p(
        jnp.exp(-jnp.abs(centerness)))
    loss_ctr = jnp.sum(jnp.where(pos, bce, 0.0)) / num_pos

    return {
        "loss_reg": loss_reg * reg_loss_weight,
        "loss_centerness": loss_ctr,
        "loss_dot_product_token": loss_dot,
        "num_pos": num_pos_raw,
    }

"""FCOS anchor-free head — the reference's alternative detection head family.

Compact equivalent of `maskrcnn_benchmark/modeling/rpn/fcos.py` (SURVEY §2.3
G19 — registered but unused by LPI configs): per-location class logits,
(l, t, r, b) distance regression through a per-level scale + exp, and
centerness; targets assign each location the smallest ground-truth box that
contains it within the level's regression range. Static shapes: padded GTs
with validity masks, vmapped assignment.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lpi_tpu.ops.focal import sigmoid_focal_loss

INF = 1e8
DEFAULT_RANGES = ((-1, 64), (64, 128), (128, 256), (256, 512), (512, INF))


class FCOSHead(nn.Module):
    num_classes: int
    channels: int = 256
    num_convs: int = 4
    num_levels: int = 5
    prior_prob: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        c = self.channels
        bias_value = -np.log((1 - self.prior_prob) / self.prior_prob)
        cls_tower = [nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name=f"cls_tower{i}") for i in range(self.num_convs)]
        box_tower = [nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name=f"box_tower{i}") for i in range(self.num_convs)]
        cls_head = nn.Conv(self.num_classes, (3, 3), padding="SAME",
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(bias_value),
                           name="cls_logits")
        box_head = nn.Conv(4, (3, 3), padding="SAME",
                           kernel_init=nn.initializers.normal(0.01), name="bbox_pred")
        ctr_head = nn.Conv(1, (3, 3), padding="SAME",
                           kernel_init=nn.initializers.normal(0.01), name="centerness")
        scales = self.param("scales", nn.initializers.ones, (self.num_levels,))

        out = {"cls_logits": [], "ltrb": [], "centerness": []}
        for l, f in enumerate(features):
            ct = f
            bt = f
            for conv in cls_tower:
                ct = jax.nn.relu(conv(ct))
            for conv in box_tower:
                bt = jax.nn.relu(conv(bt))
            out["cls_logits"].append(cls_head(ct))
            out["ltrb"].append(jnp.exp(box_head(bt) * scales[l]))
            out["centerness"].append(ctr_head(ct)[..., 0])
        return out


def fcos_locations(shapes: Sequence[Tuple[int, int]],
                   strides: Sequence[int]) -> List[np.ndarray]:
    """Per-level center points [(H*W, 2) xy] (fcos.py compute_locations)."""
    out = []
    for (H, W), s in zip(shapes, strides):
        ys = (np.arange(H) + 0.5) * s
        xs = (np.arange(W) + 0.5) * s
        xg, yg = np.meshgrid(xs, ys)
        out.append(np.stack([xg.ravel(), yg.ravel()], axis=1).astype(np.float32))
    return out


def fcos_assign(
    points: jnp.ndarray,  # [P, 2]
    ranges: jnp.ndarray,  # [P, 2] per-point regression range
    gt_boxes: jnp.ndarray,  # [G, 4]
    gt_labels: jnp.ndarray,  # [G] (1-based)
    gt_valid: jnp.ndarray,  # [G]
):
    """-> (labels [P] 0=bg, ltrb targets [P, 4], centerness targets [P])."""
    x, y = points[:, 0:1], points[:, 1:2]
    l = x - gt_boxes[None, :, 0]
    t = y - gt_boxes[None, :, 1]
    r = gt_boxes[None, :, 2] - x
    b = gt_boxes[None, :, 3] - y
    ltrb = jnp.stack([l, t, r, b], axis=-1)  # [P, G, 4]
    inside = jnp.min(ltrb, axis=-1) > 0
    max_reg = jnp.max(ltrb, axis=-1)
    in_range = (max_reg >= ranges[:, 0:1]) & (max_reg <= ranges[:, 1:2])
    area = ((gt_boxes[:, 2] - gt_boxes[:, 0]) *
            (gt_boxes[:, 3] - gt_boxes[:, 1]))[None, :]
    candidate = inside & in_range & gt_valid[None, :]
    area_masked = jnp.where(candidate, area, INF)
    best = jnp.argmin(area_masked, axis=1)  # smallest containing box
    pos = jnp.min(area_masked, axis=1) < INF
    labels = jnp.where(pos, jnp.take(gt_labels, best), 0)
    tgt = jnp.take_along_axis(ltrb, best[:, None, None], axis=1)[:, 0]  # [P,4]
    lr = jnp.stack([tgt[:, 0], tgt[:, 2]], -1)
    tb = jnp.stack([tgt[:, 1], tgt[:, 3]], -1)
    ctr = jnp.sqrt(jnp.clip(
        (jnp.min(lr, -1) / jnp.clip(jnp.max(lr, -1), 1e-9)) *
        (jnp.min(tb, -1) / jnp.clip(jnp.max(tb, -1), 1e-9)), 0.0))
    return labels.astype(jnp.int32), tgt, jnp.where(pos, ctr, 0.0)


@partial(jax.jit, static_argnames=())
def fcos_losses(
    points: jnp.ndarray,  # [P, 2] all levels concat
    ranges: jnp.ndarray,  # [P, 2]
    cls_logits: jnp.ndarray,  # [B, P, C]
    ltrb_pred: jnp.ndarray,  # [B, P, 4] (already exp'd)
    centerness: jnp.ndarray,  # [B, P]
    gt_boxes: jnp.ndarray,  # [B, G, 4]
    gt_labels: jnp.ndarray,  # [B, G]
    gt_valid: jnp.ndarray,  # [B, G]
):
    labels, tgt, ctr_t = jax.vmap(
        lambda gb, gl, gv: fcos_assign(points, ranges, gb, gl, gv)
    )(gt_boxes, gt_labels, gt_valid)
    pos = labels > 0
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)

    cls = sigmoid_focal_loss(
        cls_logits.reshape(-1, cls_logits.shape[-1]), labels.reshape(-1))
    loss_cls = jnp.sum(cls) / num_pos

    # GIoU on decoded boxes around each point
    def decode(p, d):
        return jnp.stack([p[:, 0] - d[:, 0], p[:, 1] - d[:, 1],
                          p[:, 0] + d[:, 2], p[:, 1] + d[:, 3]], -1)

    from lpi_tpu.ops.boxes import elementwise_giou

    pred_boxes = jax.vmap(lambda d: decode(points, d))(ltrb_pred)
    tgt_boxes = jax.vmap(lambda d: decode(points, d))(tgt)
    giou = elementwise_giou(pred_boxes, tgt_boxes)
    sum_ctr = jnp.maximum(jnp.sum(jnp.where(pos, ctr_t, 0.0)), 1e-6)
    loss_reg = jnp.sum(jnp.where(pos, (1 - giou) * ctr_t, 0.0)) / sum_ctr

    bce = (jnp.maximum(centerness, 0) - centerness * ctr_t
           + jnp.log1p(jnp.exp(-jnp.abs(centerness))))
    loss_ctr = jnp.sum(jnp.where(pos, bce, 0.0)) / num_pos
    return {"loss_cls": loss_cls, "loss_reg": loss_reg,
            "loss_centerness": loss_ctr, "num_pos": jnp.sum(pos)}

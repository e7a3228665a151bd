"""Two-stage ROI box head (Faster-RCNN style) — GLIP's carried ROI-heads.

Compact equivalent of `maskrcnn_benchmark/modeling/roi_heads/box_head`
(+`modeling/poolers.py`), the two-stage path the reference carries but never
enables in LPI configs (`MODEL.RPN_ONLY: True`; SURVEY §2.3 G19): FPN-level
assignment by box scale (the canonical-224 rule), multi-level ROIAlign,
2xFC head with class logits + per-class box deltas, and the standard
CE + smooth-L1 training losses on padded proposal sets.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from lpi_tpu.ops.boxes import box_area, encode_boxes
from lpi_tpu.ops.roi_align import roi_align


def assign_levels(boxes: jnp.ndarray, k_min: int = 2, k_max: int = 5,
                  canonical_scale: float = 224.0, canonical_level: int = 4
                  ) -> jnp.ndarray:
    """FPN paper level assignment: k = k0 + log2(sqrt(area)/224)."""
    scale = jnp.sqrt(jnp.clip(box_area(boxes), 1e-6))
    k = jnp.floor(canonical_level + jnp.log2(scale / canonical_scale + 1e-8))
    return jnp.clip(k, k_min, k_max).astype(jnp.int32) - k_min


def multilevel_roi_align(features: Sequence[jnp.ndarray],
                         rois: jnp.ndarray,  # [R, 5] (batch, x1, y1, x2, y2)
                         strides: Sequence[int],
                         out_size: int = 7) -> jnp.ndarray:
    """Pool each ROI from its assigned FPN level ([R, out, out, C])."""
    levels = assign_levels(rois[:, 1:], k_min=0, k_max=len(features) - 1,
                           canonical_level=2)
    pooled = jnp.stack([
        roi_align(f, rois, out_size=out_size, spatial_scale=1.0 / s)
        for f, s in zip(features, strides)
    ])  # [L, R, out, out, C]
    onehot = jax.nn.one_hot(levels, len(features), dtype=pooled.dtype)
    return jnp.einsum("lrhwc,rl->rhwc", pooled, onehot)


class BoxHead(nn.Module):
    """2xFC box head: per-ROI class logits + per-class box deltas."""

    num_classes: int  # foreground classes; +1 background logit
    hidden: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray):
        R = pooled.shape[0]
        x = pooled.reshape(R, -1).astype(self.dtype)
        x = jax.nn.relu(nn.Dense(self.hidden, name="fc6")(x))
        x = jax.nn.relu(nn.Dense(self.hidden, name="fc7")(x))
        cls_logits = nn.Dense(self.num_classes + 1,
                              kernel_init=nn.initializers.normal(0.01),
                              name="cls_score")(x)
        box_deltas = nn.Dense(self.num_classes * 4,
                              kernel_init=nn.initializers.normal(0.001),
                              name="bbox_pred")(x)
        return cls_logits, box_deltas.reshape(R, self.num_classes, 4)


def smooth_l1(x: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def roi_box_loss(cls_logits: jnp.ndarray,  # [R, C+1]
                 box_deltas: jnp.ndarray,  # [R, C, 4]
                 proposals: jnp.ndarray,  # [R, 4]
                 labels: jnp.ndarray,  # [R] 0 = background
                 matched_gt: jnp.ndarray,  # [R, 4]
                 valid: jnp.ndarray):  # [R]
    """Softmax CE over all valid proposals + smooth-L1 regression on the
    matched class's deltas for positives (box_head loss semantics)."""
    logz = jax.nn.logsumexp(cls_logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(cls_logits.astype(jnp.float32),
                                 labels[:, None], axis=-1)[:, 0]
    ce = jnp.where(valid, logz - picked, 0.0)
    num_valid = jnp.maximum(jnp.sum(valid), 1.0)
    loss_cls = jnp.sum(ce) / num_valid

    pos = valid & (labels > 0)
    targets = encode_boxes(matched_gt, proposals)
    cls_idx = jnp.clip(labels - 1, 0)
    per_cls = jnp.take_along_axis(
        box_deltas.astype(jnp.float32), cls_idx[:, None, None].repeat(4, -1),
        axis=1)[:, 0]
    reg = jnp.sum(smooth_l1(per_cls - targets), axis=-1)
    loss_reg = jnp.sum(jnp.where(pos, reg, 0.0)) / jnp.maximum(jnp.sum(pos), 1.0)
    return {"loss_classifier": loss_cls, "loss_box_reg": loss_reg}

"""Box utilities: IoU, GIoU, ATSS-style encode/decode. Pure jnp, static shapes.

Functional equivalents of the reference's `structures/boxlist_ops.py` IoU and
`layers/set_loss.py:generalized_box_iou` (used by the RefExp evaluator) and
the ATSS box coder (`rpn/loss.py` reg targets). Boxes are [x1, y1, x2, y2].
"""

from __future__ import annotations

import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0)


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU: a [N,4], b [M,4] -> [N,M]."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def box_giou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise generalized IoU [-1, 1]: a [N,4], b [M,4] -> [N,M]."""
    iou = box_iou(a, b)
    lt = jnp.minimum(a[:, None, :2], b[None, :, :2])
    rb = jnp.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    hull = wh[..., 0] * wh[..., 1]
    inter_lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    inter_rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = jnp.prod(jnp.maximum(inter_rb - inter_lt, 0.0), -1)
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)


def elementwise_giou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-row GIoU: a [N,4], b [N,4] -> [N]."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    inter = jnp.prod(jnp.maximum(rb - lt, 0.0), -1)
    union = box_area(a) + box_area(b) - inter
    iou = inter / jnp.maximum(union, 1e-9)
    hl = jnp.minimum(a[..., :2], b[..., :2])
    hr = jnp.maximum(a[..., 2:], b[..., 2:])
    hull = jnp.prod(jnp.maximum(hr - hl, 0.0), -1)
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)


def box_center(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([(boxes[..., 0] + boxes[..., 2]) / 2,
                      (boxes[..., 1] + boxes[..., 3]) / 2], axis=-1)


# --- ATSS box coder (reference rpn/loss.py reg target encoding) ----------
def encode_boxes(gt: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Encode gt relative to anchors as (dx, dy, dw, dh) with weights (10,10,5,5)."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]
    gx = gt[..., 0] + 0.5 * gw
    gy = gt[..., 1] + 0.5 * gh
    wx, wy, ww, wh = 10.0, 10.0, 5.0, 5.0
    return jnp.stack([
        wx * (gx - ax) / jnp.maximum(aw, 1e-9),
        wy * (gy - ay) / jnp.maximum(ah, 1e-9),
        ww * jnp.log(jnp.maximum(gw, 1e-9) / jnp.maximum(aw, 1e-9)),
        wh * jnp.log(jnp.maximum(gh, 1e-9) / jnp.maximum(ah, 1e-9)),
    ], axis=-1)


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray,
                 clamp: float = 4.135166556742356) -> jnp.ndarray:
    """Inverse of encode_boxes (dw/dh clamped at log(1000/16))."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah
    wx, wy, ww, wh = 10.0, 10.0, 5.0, 5.0
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, max=clamp)
    dh = jnp.clip(deltas[..., 3] / wh, max=clamp)
    cx = dx * aw + ax
    cy = dy * ah + ay
    w = jnp.exp(dw) * aw
    h = jnp.exp(dh) * ah
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)

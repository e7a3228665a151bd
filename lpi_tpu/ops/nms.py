"""Static-shape NMS family for TPU.

TPU-native equivalents of the reference CUDA kernels
(`grounding/maskrcnn_benchmark/csrc/cuda/nms.cu`, `ml_nms.cu`,
`cpu/soft_nms.cpp` — SURVEY §2.4): padded inputs, masked invalid entries,
fixed output sizes. The greedy dependency is expressed as a `fori_loop` over
the score-sorted order with a running keep mask; XLA keeps everything on
device with no host sync.

Conventions: `boxes [N,4]` xyxy, `scores [N]`; padding rows carry
score=-inf (or `mask=False`). Returns a keep mask aligned with the sorted
order mapped back to input order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lpi_tpu.ops.boxes import box_iou


@partial(jax.jit, static_argnames=("iou_threshold",))
def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
             iou_threshold: float = 0.5) -> jnp.ndarray:
    """Greedy NMS keep-mask in input order. Padding: score = -inf."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    valid = jnp.isfinite(scores[order])
    iou = box_iou(b, b)

    def body(i, keep):
        # suppressed if any higher-scoring kept box overlaps > thr
        overlap = (iou[i] > iou_threshold) & keep & (jnp.arange(n) < i)
        ki = valid[i] & ~jnp.any(overlap)
        return keep.at[i].set(ki)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


@partial(jax.jit, static_argnames=("iou_threshold",))
def ml_nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, labels: jnp.ndarray,
                iou_threshold: float = 0.5) -> jnp.ndarray:
    """Class-aware NMS (`ml_nms.cu` behavior): suppression only within the
    same label — label equality folded into the IoU matrix."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    l = labels[order]
    valid = jnp.isfinite(scores[order])
    iou = box_iou(b, b) * (l[:, None] == l[None, :])

    def body(i, keep):
        overlap = (iou[i] > iou_threshold) & keep & (jnp.arange(n) < i)
        ki = valid[i] & ~jnp.any(overlap)
        return keep.at[i].set(ki)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)


@partial(jax.jit, static_argnames=("method", "iterations"))
def soft_nms(boxes: jnp.ndarray, scores: jnp.ndarray, sigma: float = 0.5,
             iou_threshold: float = 0.3, score_threshold: float = 0.001,
             method: str = "gaussian", iterations: int | None = None):
    """Soft-NMS (`cpu/soft_nms.cpp` behavior): iteratively pick the max-score
    box and decay overlapping scores (gaussian or linear). Returns
    (decayed_scores, selection_order_mask)."""
    n = boxes.shape[0]
    iters = iterations or n
    iou = box_iou(boxes, boxes)

    def body(_, carry):
        s, out = carry
        i = jnp.argmax(s)
        picked = s[i] > score_threshold
        out = out.at[i].set(jnp.where(picked, s[i], out[i]))
        if method == "gaussian":
            decay = jnp.exp(-(iou[i] ** 2) / sigma)
        else:
            decay = jnp.where(iou[i] > iou_threshold, 1.0 - iou[i], 1.0)
        s = jnp.where(picked, s * decay, s)
        s = s.at[i].set(-jnp.inf)  # remove picked from pool
        return s, out

    _, out = jax.lax.fori_loop(0, iters, body,
                               (scores, jnp.full_like(scores, -jnp.inf)))
    return out, out > score_threshold


def nms_padded(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
               max_outputs: int):
    """NMS returning exactly `max_outputs` (index, validity) pairs —
    the static-shape interface detection postprocessors consume."""
    keep = nms_mask(boxes, scores, iou_threshold)
    kept_scores = jnp.where(keep, scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(kept_scores, max_outputs)
    return idx, jnp.isfinite(top_scores)

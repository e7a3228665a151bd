"""ROIAlign / ROIPool on TPU — per-ROI bilinear grids, fully vectorized.

Replaces `csrc/cuda/ROIAlign_cuda.cu` (+CPU twin) and `ROIPool_cuda.cu`
behind `layers/roi_align.py` / `layers/roi_pool.py` (SURVEY §2.4). ROIs are
a static-size [R, 5] array (batch_idx, x1, y1, x2, y2) in input coordinates;
invalid rows (batch_idx < 0) produce zeros.

Uses the aligned=False convention of the reference wrappers (no half-pixel
shift), sampling_ratio bilinear taps per bin averaged (ROIAlign) or a dense
max over taps (ROIPool approximation at sampling density `sampling_ratio`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lpi_tpu.ops.bilinear import bilinear_sample


def _roi_grid(roi, out_size: int, sampling_ratio: int, spatial_scale: float):
    x1, y1, x2, y2 = roi[0], roi[1], roi[2], roi[3]
    x1, y1, x2, y2 = (v * spatial_scale for v in (x1, y1, x2, y2))
    rw = jnp.maximum(x2 - x1, 1.0)
    rh = jnp.maximum(y2 - y1, 1.0)
    bin_h = rh / out_size
    bin_w = rw / out_size
    s = sampling_ratio
    iy = (jnp.arange(out_size)[:, None] * bin_h
          + (jnp.arange(s)[None, :] + 0.5) * bin_h / s + y1)  # [out, s]
    ix = (jnp.arange(out_size)[:, None] * bin_w
          + (jnp.arange(s)[None, :] + 0.5) * bin_w / s + x1)
    yy = iy.reshape(-1)[:, None]  # [out*s, 1]
    xx = ix.reshape(-1)[None, :]  # [1, out*s]
    return jnp.broadcast_to(yy, (out_size * s, out_size * s)), \
        jnp.broadcast_to(xx, (out_size * s, out_size * s))


@partial(jax.jit, static_argnames=("out_size", "sampling_ratio", "mode"))
def roi_align(
    features: jnp.ndarray,  # [B, H, W, C]
    rois: jnp.ndarray,  # [R, 5] (batch_idx, x1, y1, x2, y2)
    out_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    mode: str = "avg",
) -> jnp.ndarray:
    """-> [R, out_size, out_size, C]."""
    B = features.shape[0]
    s = sampling_ratio

    def one(roi):
        bidx = roi[0].astype(jnp.int32)
        feat = jnp.take(features, jnp.clip(bidx, 0, B - 1), axis=0)
        yy, xx = _roi_grid(roi[1:], out_size, s, spatial_scale)
        vals = bilinear_sample(feat.astype(jnp.float32), yy, xx)  # [out*s, out*s, C]
        C = vals.shape[-1]
        vals = vals.reshape(out_size, s, out_size, s, C)
        if mode == "avg":
            pooled = vals.mean(axis=(1, 3))
        else:
            pooled = vals.max(axis=(1, 3))
        return jnp.where(bidx >= 0, pooled, jnp.zeros_like(pooled))

    return jax.vmap(one)(rois)


def roi_pool(features, rois, out_size: int = 7, spatial_scale: float = 1.0):
    """Max-pool ROI pooling (ROIPool_cuda.cu behavior approximated with a
    dense 4-tap max per bin)."""
    return roi_align(features, rois, out_size, spatial_scale,
                     sampling_ratio=4, mode="max")

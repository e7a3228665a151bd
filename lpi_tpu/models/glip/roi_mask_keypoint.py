"""Mask and keypoint ROI heads — the two-stage extras of the reference.

Compact equivalents of `modeling/roi_heads/mask_head/*` and
`modeling/roi_heads/keypoint_head/*` (SURVEY §2.3 G19, registered but
unused by LPI configs):

* `MaskHead` — MaskRCNNFPNFeatureExtractor (4x conv3x3+relu on 14x14
  ROI-aligned features) + MaskRCNNC4Predictor (2x-deconv + 1x1 per-class
  mask logits, `roi_mask_predictors.py:11-49`); training loss = per-pixel
  BCE on the matched class's channel against 28x28-rasterized GT masks
  (`mask_head/loss.py` project semantics); inference = sigmoid + the
  matched class channel (`mask_head/inference.py:37-86`).
* `KeypointHead` — KeypointRCNNFeatureExtractor (8x conv3x3+relu) +
  KeypointRCNNPredictor (deconv + interpolate to 56x56 heatmaps); loss =
  softmax cross-entropy over the flattened heatmap at each visible
  keypoint's discretized location (`keypoint_head/loss.py:54-140`).

Static shapes: fixed ROIs-per-image; invalid ROIs carry zero weight.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from lpi_tpu.ops.roi_align import roi_align


class MaskHead(nn.Module):
    num_classes: int
    channels: int = 256
    num_convs: int = 4
    resolution: int = 14  # pooled input; mask logits come out at 2x
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> jnp.ndarray:
        """pooled [R, res, res, C] -> mask logits [R, 2*res, 2*res, classes]."""
        h = pooled
        for i in range(self.num_convs):
            h = nn.Conv(self.channels, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"fcn{i}")(h)
            h = jax.nn.relu(h)
        h = nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="deconv")(h)
        h = jax.nn.relu(h)
        return nn.Conv(self.num_classes, (1, 1), name="mask_logits")(h)


def mask_loss(mask_logits: jnp.ndarray,  # [R, M, M, C]
              gt_masks: jnp.ndarray,  # [R, M, M] in {0,1}
              labels: jnp.ndarray,  # [R] 0-based matched class
              valid: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel BCE on each ROI's matched-class channel, mean over valid
    ROI pixels (`mask_head/loss.py` semantics)."""
    R, M, _, C = mask_logits.shape
    sel = jnp.take_along_axis(
        mask_logits, labels.reshape(R, 1, 1, 1).astype(jnp.int32), axis=-1
    )[..., 0].astype(jnp.float32)
    t = gt_masks.astype(jnp.float32)
    bce = jnp.maximum(sel, 0) - sel * t + jnp.log1p(jnp.exp(-jnp.abs(sel)))
    per_roi = bce.mean(axis=(1, 2))
    w = valid.astype(jnp.float32)
    return jnp.sum(per_roi * w) / jnp.maximum(w.sum(), 1.0)


def paste_mask_probs(mask_logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Inference: sigmoid probability map of each ROI's predicted class
    (`mask_head/inference.py:63-86`); pasting into image space is the
    caller's resize of these [R, M, M] maps into the ROI boxes."""
    R = mask_logits.shape[0]
    sel = jnp.take_along_axis(
        mask_logits, labels.reshape(R, 1, 1, 1).astype(jnp.int32), axis=-1)[..., 0]
    return jax.nn.sigmoid(sel.astype(jnp.float32))


class KeypointHead(nn.Module):
    num_keypoints: int = 17
    channels: int = 512
    num_convs: int = 8
    heatmap_size: int = 56
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> jnp.ndarray:
        """pooled [R, res, res, C] -> heatmap logits [R, S, S, K]."""
        h = pooled
        for i in range(self.num_convs):
            h = nn.Conv(self.channels, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"conv_fcn{i}")(h)
            h = jax.nn.relu(h)
        h = nn.ConvTranspose(self.num_keypoints, (4, 4), strides=(2, 2),
                             dtype=self.dtype, name="kps_score_lowres")(h)
        R = h.shape[0]
        S = self.heatmap_size
        return jax.image.resize(h, (R, S, S, self.num_keypoints), "bilinear")


def keypoints_to_heatmap_targets(keypoints: jnp.ndarray,  # [R, K, 3] x,y,vis
                                 rois: jnp.ndarray,  # [R, 4] xyxy
                                 heatmap_size: int):
    """Discretize keypoints into per-ROI heatmap cells
    (`keypoint_head/loss.py:keypoints_to_heat_map`). -> (index [R,K], valid)."""
    S = heatmap_size
    x1, y1, x2, y2 = (rois[:, i] for i in range(4))
    sx = S / jnp.maximum(x2 - x1, 1e-6)
    sy = S / jnp.maximum(y2 - y1, 1e-6)
    x = ((keypoints[..., 0] - x1[:, None]) * sx[:, None]).astype(jnp.int32)
    y = ((keypoints[..., 1] - y1[:, None]) * sy[:, None]).astype(jnp.int32)
    inside = (x >= 0) & (x < S) & (y >= 0) & (y < S)
    valid = inside & (keypoints[..., 2] > 0)
    x = jnp.clip(x, 0, S - 1)
    y = jnp.clip(y, 0, S - 1)
    return y * S + x, valid


def keypoint_loss(heatmap_logits: jnp.ndarray,  # [R, S, S, K]
                  keypoints: jnp.ndarray,  # [R, K, 3]
                  rois: jnp.ndarray,  # [R, 4]
                  roi_valid: jnp.ndarray) -> jnp.ndarray:
    """Softmax CE over the flattened heatmap at each visible keypoint
    (`keypoint_head/loss.py:110-140`)."""
    R, S, _, K = heatmap_logits.shape
    idx, kp_valid = keypoints_to_heatmap_targets(keypoints, rois, S)
    logits = heatmap_logits.reshape(R, S * S, K).transpose(0, 2, 1)  # [R,K,SS]
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, idx[..., None], axis=-1)[..., 0]
    ce = logz - picked
    w = (kp_valid & roi_valid[:, None]).astype(jnp.float32)
    return jnp.sum(ce * w) / jnp.maximum(w.sum(), 1.0)


def pool_rois(features: jnp.ndarray, rois: jnp.ndarray,
              resolution: int, spatial_scale: float) -> jnp.ndarray:
    """Single-level ROIAlign convenience for the heads above."""
    n = rois.shape[0]
    batched = jnp.concatenate(
        [jnp.zeros((n, 1), rois.dtype), rois], axis=1)
    return roi_align(features, batched, out_size=resolution,
                     spatial_scale=spatial_scale)

"""Deformable position-sensitive ROI pooling (DCN's DeformRoIPooling).

TPU-native equivalent of `csrc/cuda/deform_pool_cuda.cu` +
`deform_pool_kernel_cuda.cu` (`DeformablePSROIPoolForwardKernel`) — the one
reference native op with no round-1 equivalent (unused by LPI configs;
capability parity). Semantics preserved:

* ROI coords are rounded, scaled by `spatial_scale`, shifted by -0.5, the
  end side gets +1 before scaling; sizes clamp to >= 0.1
  (`deform_pool_kernel_cuda.cu:74-82`);
* bins sampled on a `sample_per_part` x `sample_per_part` sub-grid; samples
  outside [-0.5, dim-0.5] are SKIPPED (not zero-contributed), the rest are
  coordinate-clamped and bilinearly interpolated; the bin value is the mean
  over surviving samples (`:119-138`);
* position-sensitive channels: output channel `ctop` at bin (ph, pw) reads
  input channel `(ctop*group + gh)*group + gw` with gh/gw the bin's group
  cell (`:132,107-111`);
* optional `trans` offsets [N, num_classes*2, part, part] scaled by
  `trans_std` and the ROI size, indexed by the bin's part cell, shared by
  that class's block of output channels (`:103-117`).

Layout: NHWC features; rois [N, 5] = (batch_idx, x1, y1, x2, y2).
Differentiable w.r.t. features and trans through the bilinear weights.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lpi_tpu.ops.bilinear import bilinear_sample


@partial(jax.jit, static_argnames=("out_size", "out_dim", "spatial_scale",
                                   "sample_per_part", "group_size",
                                   "part_size", "trans_std"))
def deform_psroi_pool(
    features: jnp.ndarray,  # [B, H, W, C]; C == out_dim * group_size**2
    rois: jnp.ndarray,  # [N, 5] (batch_idx, x1, y1, x2, y2)
    trans: jnp.ndarray | None = None,  # [N, classes*2, part, part]
    out_size: int = 7,
    out_dim: int | None = None,
    spatial_scale: float = 1.0,
    sample_per_part: int = 4,
    group_size: int = 1,
    part_size: int | None = None,
    trans_std: float = 0.1,
) -> jnp.ndarray:
    """-> pooled [N, out_size, out_size, out_dim]."""
    B, H, W, C = features.shape
    g = group_size
    out_dim = out_dim or C // (g * g)
    part = part_size or out_size
    num_classes = 1 if trans is None else trans.shape[1] // 2
    ch_each = out_dim // num_classes

    idx = np.arange(out_size)
    gcell = np.clip((idx * g) // out_size, 0, g - 1)  # bin -> group cell
    part_cell = np.minimum((idx * part) // out_size, part - 1)
    # position-sensitive input channel for (ph, pw, ctop): (ct*g+gh)*g+gw
    ct = np.arange(out_dim)
    cmap = jnp.asarray((ct[None, None, :] * g + gcell[:, None, None]) * g
                       + gcell[None, :, None])  # [out, out, out_dim]

    def one_roi(roi, tr):
        b = roi[0].astype(jnp.int32)
        x1 = jnp.round(roi[1]) * spatial_scale - 0.5
        y1 = jnp.round(roi[2]) * spatial_scale - 0.5
        x2 = (jnp.round(roi[3]) + 1.0) * spatial_scale - 0.5
        y2 = (jnp.round(roi[4]) + 1.0) * spatial_scale - 0.5
        rw = jnp.maximum(x2 - x1, 0.1)
        rh = jnp.maximum(y2 - y1, 0.1)
        bin_w = rw / out_size
        bin_h = rh / out_size
        sub_w = bin_w / sample_per_part
        sub_h = bin_h / sample_per_part

        fmap = jnp.take(features, b, axis=0)  # [H, W, C]
        wstart = idx[None, :] * bin_w + x1  # [1, out] broadcast over rows
        hstart = idx[:, None] * bin_h + y1  # [out, 1]

        chunks = []
        for cls in range(num_classes):
            if tr is not None:
                tcls = tr.reshape(num_classes, 2, part, part)[cls] * trans_std
                offx = tcls[0][part_cell][:, part_cell] * rw  # [out, out]
                offy = tcls[1][part_cell][:, part_cell] * rh
            else:
                offx = 0.0
                offy = 0.0
            total = jnp.zeros((out_size, out_size, C))
            count = jnp.zeros((out_size, out_size, 1))
            for ih in range(sample_per_part):
                for iw in range(sample_per_part):
                    x, y = jnp.broadcast_arrays(
                        wstart + offx + iw * sub_w,
                        hstart + offy + ih * sub_h)  # [out, out]
                    inside = ((x >= -0.5) & (x <= W - 0.5)
                              & (y >= -0.5) & (y <= H - 0.5))[..., None]
                    xc = jnp.clip(x, 0.0, W - 1.0)
                    yc = jnp.clip(y, 0.0, H - 1.0)
                    val = bilinear_sample(fmap, yc, xc)  # [out, out, C]
                    total = total + jnp.where(inside, val, 0.0)
                    count = count + inside.astype(jnp.float32)
            mean = jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)
            # position-sensitive channel select for this class's outputs
            sel = jnp.take_along_axis(
                mean, cmap[..., cls * ch_each:(cls + 1) * ch_each], axis=-1)
            chunks.append(sel)
        return jnp.concatenate(chunks, axis=-1)  # [out, out, out_dim]

    if trans is None:
        return jax.vmap(lambda r: one_roi(r, None))(rois)
    return jax.vmap(one_roi)(rois, trans)

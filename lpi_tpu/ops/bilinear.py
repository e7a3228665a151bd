"""Bilinear sampling on feature maps — the gather core shared by deformable
conv and ROIAlign. Out-of-bounds samples contribute zero (matching the
reference CUDA kernels' boundary handling in `ROIAlign_cuda.cu` /
`deform_conv_kernel_cuda.cu`). Differentiable w.r.t. both features and
coordinates (XLA AD turns the gathers into scatter-adds on the backward
pass)."""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(features: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Sample `features [H, W, C]` at float coords (y, x) of any shape [...].

    Returns [..., C]. Points outside [-1, H) x [-1, W) contribute zero, and
    each corner tap outside the map is dropped — the ROIAlign convention.
    """
    H, W, C = features.shape
    oob = (y <= -1.0) | (y >= H) | (x <= -1.0) | (x >= W)
    y = jnp.clip(y, 0.0, H - 1.0)
    x = jnp.clip(x, 0.0, W - 1.0)

    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ly = y - y0
    lx = x - x0
    hy = 1.0 - ly
    hx = 1.0 - lx

    def gather(yy, xx):
        idx = (yy.astype(jnp.int32) * W + xx.astype(jnp.int32)).reshape(-1)
        return features.reshape(H * W, C)[idx].reshape(y.shape + (C,))

    val = (gather(y0, x0) * (hy * hx)[..., None]
           + gather(y0, x1) * (hy * lx)[..., None]
           + gather(y1, x0) * (ly * hx)[..., None]
           + gather(y1, x1) * (ly * lx)[..., None])
    return jnp.where(oob[..., None], 0.0, val)

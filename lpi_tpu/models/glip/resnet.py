"""ResNet backbone with frozen BatchNorm (GLIP's alternative visual tower).

Equivalent of `maskrcnn_benchmark/modeling/backbone/resnet.py` as the
registry alternative to Swin (SURVEY §2.3 G18 — registered but unused by
the LPI configs, which pin Swin-T). Standard bottleneck ResNet with
`FrozenBatchNorm` (affine-only, running stats folded — the detectron
convention, `layers/batch_norm.py:FrozenBatchNorm2d`), returning the C3-C5
stage maps for the FPN.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics: y = x * scale + bias, where
    scale/bias fold the frozen running stats (affine params only)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale + bias


class Bottleneck(nn.Module):
    out_channels: int  # expanded (4x) width
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.out_channels // 4
        identity = x
        h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = FrozenBatchNorm(mid, name="bn1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(mid, (3, 3), strides=(self.stride,) * 2, padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = FrozenBatchNorm(mid, name="bn2")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = FrozenBatchNorm(self.out_channels, name="bn3")(h)
        if self.stride != 1 or x.shape[-1] != self.out_channels:
            identity = nn.Conv(self.out_channels, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = FrozenBatchNorm(self.out_channels, name="downsample_bn")(identity)
        return jax.nn.relu(h + identity)


class ResNet(nn.Module):
    """ResNet-50 by default (blocks 3,4,6,3); returns C3, C4, C5."""

    blocks: Sequence[int] = (3, 4, 6, 3)
    base_width: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> List[jnp.ndarray]:
        x = nn.Conv(self.base_width, (7, 7), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="stem_conv")(
                        images.astype(self.dtype))
        x = FrozenBatchNorm(self.base_width, name="stem_bn")(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        outs = []
        for s, depth in enumerate(self.blocks):
            width = self.base_width * 4 * (2 ** s)
            for b in range(depth):
                stride = 2 if (b == 0 and s > 0) else 1
                x = Bottleneck(width, stride, self.dtype,
                               name=f"stage{s}_block{b}")(x)
            if s >= 1:  # C3 (stride 8), C4 (16), C5 (32)
                outs.append(x)
        return outs


# -- backbone registry (`modeling/backbone/__init__.py` role) --------------
BACKBONES = {}


def register_backbone(name):
    def deco(fn):
        BACKBONES[name] = fn
        return fn
    return deco


@register_backbone("swint-fpn-retinanet")
def _build_swin(cfg, dtype=jnp.float32):
    from lpi_tpu.models.glip.swin import SwinTransformer

    s = cfg.swin
    return SwinTransformer(
        patch_size=s.patch_size, embed_dim=s.embed_dim, depths=s.depths,
        num_heads=s.num_heads, window_size=s.window_size,
        mlp_ratio=s.mlp_ratio, out_stages=(2, 3, 4, 5), dtype=dtype)


@register_backbone("resnet50-fpn")
def _build_resnet50(cfg, dtype=jnp.float32):
    return ResNet(blocks=(3, 4, 6, 3), dtype=dtype)


def build_backbone(name: str, cfg, dtype=jnp.float32):
    if name not in BACKBONES:
        raise ValueError(f"unknown backbone {name!r}; have {sorted(BACKBONES)}")
    return BACKBONES[name](cfg, dtype)

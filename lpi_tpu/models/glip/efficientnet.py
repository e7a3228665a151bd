"""EfficientNet backbone + BiFPN — GLIP's EfficientDet-family alternative.

Compact Flax equivalents of the reference's
`modeling/backbone/efficientnet.py` (MBConv/EffiInvResUnit stages with
squeeze-excitation, swish activations, stem `EffiInitBlock`) and
`modeling/backbone/efficientdet.py` (BiFPN: bidirectional top-down +
bottom-up pyramid with fast-normalized fusion weights and depthwise
separable convs) — SURVEY §2.3 G18, registered-but-unused by LPI configs.

Width/depth follow the B0 scaling by default; `width_mult`/`depth_mult`
give the other Bx variants. Returns the stride-8/16/32 feature maps like
the Swin tower, so the same heads compose on top.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from lpi_tpu.models.glip.resnet import FrozenBatchNorm


def _round_channels(c: float, divisor: int = 8) -> int:
    new = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new < 0.9 * c:
        new += divisor
    return new


class SqueezeExcite(nn.Module):
    channels: int
    reduced: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = nn.swish(s)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="expand")(s)
        return x * jax.nn.sigmoid(s)


class MBConv(nn.Module):
    """EffiInvResUnit (`efficientnet.py:391-470`): expand -> depthwise ->
    SE -> project, residual when shapes match."""

    in_ch: int
    out_ch: int
    kernel: int = 3
    stride: int = 1
    expand: int = 6
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.in_ch * self.expand
        h = x
        if self.expand != 1:
            h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(h)
            h = FrozenBatchNorm(mid, name="expand_bn")(h).astype(self.dtype)
            h = nn.swish(h)
        h = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, name="dw_conv")(h)
        h = FrozenBatchNorm(mid, name="dw_bn")(h).astype(self.dtype)
        h = nn.swish(h)
        if self.se_ratio > 0:
            h = SqueezeExcite(mid, max(1, int(self.in_ch * self.se_ratio)),
                              self.dtype, name="se")(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(h)
        h = FrozenBatchNorm(self.out_ch, name="project_bn")(h).astype(self.dtype)
        if self.stride == 1 and self.in_ch == self.out_ch:
            h = h + x
        return h


# B0 stage spec: (kernel, stride, expand, channels, repeats)
B0_STAGES = (
    (3, 1, 1, 16, 1),
    (3, 2, 6, 24, 2),
    (5, 2, 6, 40, 2),
    (3, 2, 6, 80, 3),
    (5, 1, 6, 112, 3),
    (5, 2, 6, 192, 4),
    (3, 1, 6, 320, 1),
)


class EfficientNet(nn.Module):
    """`efficientnet.py:515-640` capability: returns stride 8/16/32 maps
    (C3 = stage-3 out, C4 = stage-5 out, C5 = stage-7 out)."""

    width_mult: float = 1.0
    depth_mult: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> List[jnp.ndarray]:
        import math

        x = nn.Conv(_round_channels(32 * self.width_mult), (3, 3),
                    strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem_conv")(images.astype(self.dtype))
        x = FrozenBatchNorm(x.shape[-1], name="stem_bn")(x).astype(self.dtype)
        x = nn.swish(x)
        outs = []
        in_ch = x.shape[-1]
        for si, (k, s, e, c, r) in enumerate(B0_STAGES):
            c = _round_channels(c * self.width_mult)
            r = int(math.ceil(r * self.depth_mult))
            for b in range(r):
                x = MBConv(in_ch=in_ch, out_ch=c, kernel=k,
                           stride=s if b == 0 else 1, expand=e,
                           dtype=self.dtype, name=f"stage{si}_block{b}")(x)
                in_ch = c
            if si in (2, 4, 6):  # strides 8, 16, 32
                outs.append(x)
        return outs


class BiFPNLayer(nn.Module):
    """One BiFPN pass (`efficientdet.py` BiFPN block): top-down then
    bottom-up with fast-normalized (relu-weighted) fusion and depthwise
    separable 3x3 convs."""

    channels: int
    num_levels: int = 5
    eps: float = 1e-4
    dtype: jnp.dtype = jnp.float32

    def _sep_conv(self, name):
        def apply(x):
            h = nn.Conv(self.channels, (3, 3), padding="SAME",
                        feature_group_count=self.channels, use_bias=False,
                        dtype=self.dtype, name=f"{name}_dw")(x)
            h = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                        name=f"{name}_pw")(h)
            return FrozenBatchNorm(self.channels, name=f"{name}_bn")(h).astype(self.dtype)
        return apply

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        L = self.num_levels
        assert len(feats) == L
        w_td = self.param("w_td", nn.initializers.ones, (L - 1, 2))
        w_bu = self.param("w_bu", nn.initializers.ones, (L - 1, 3))

        def up(x, like):
            B, H, W, C = like.shape
            return jax.image.resize(x, (B, H, W, C), method="nearest")

        def down(x, like):
            B, H, W, C = like.shape
            return nn.max_pool(x, (3, 3), strides=(x.shape[1] // H or 1,
                                                   x.shape[2] // W or 1),
                               padding="SAME")[:, :H, :W]

        # top-down
        td = [None] * L
        td[L - 1] = feats[L - 1]
        for i in range(L - 2, -1, -1):
            w = jax.nn.relu(w_td[i])
            w = w / (w.sum() + self.eps)
            fused = w[0] * feats[i] + w[1] * up(td[i + 1], feats[i])
            td[i] = self._sep_conv(f"td{i}")(nn.swish(fused))
        # bottom-up
        out = [None] * L
        out[0] = td[0]
        for i in range(1, L):
            w = jax.nn.relu(w_bu[i - 1])
            w = w / (w.sum() + self.eps)
            fused = (w[0] * feats[i] + w[1] * td[i]
                     + w[2] * down(out[i - 1], feats[i]))
            out[i] = self._sep_conv(f"bu{i}")(nn.swish(fused))
        return out


class EfficientNetBiFPN(nn.Module):
    """EfficientDet-style backbone: EfficientNet C3-C5 + extra P6/P7 +
    `num_bifpn` stacked BiFPN layers -> 5-level pyramid at `channels`."""

    channels: int = 64
    num_bifpn: int = 3
    width_mult: float = 1.0
    depth_mult: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> List[jnp.ndarray]:
        c3, c4, c5 = EfficientNet(self.width_mult, self.depth_mult,
                                  self.dtype, name="body")(images)
        feats = []
        for i, c in enumerate((c3, c4, c5)):
            h = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                        name=f"lateral{i}")(c)
            feats.append(h)
        p6 = nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="SAME",
                     dtype=self.dtype, name="p6")(c5)
        p7 = nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="SAME",
                     dtype=self.dtype, name="p7")(nn.swish(p6))
        feats += [p6, p7]
        for i in range(self.num_bifpn):
            feats = BiFPNLayer(self.channels, len(feats), dtype=self.dtype,
                               name=f"bifpn{i}")(feats)
        return feats

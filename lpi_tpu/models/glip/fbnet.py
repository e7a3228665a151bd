"""FBNet mobile backbone — GLIP's NAS-family alternative.

Compact equivalent of `modeling/backbone/fbnet.py` (SURVEY §2.3 G18,
registered-but-unused by LPI configs): FBNet-C-style inverted-residual
stages (expansion 1/3/6, kernels 3/5, relu — MBConv without
squeeze-excitation), returning the stride-8/16/32 pyramid. Also ports the
NAS `MixedOperationRandom` utility (`modeling/backbone/mixer.py:1-23`):
average over candidate ops, or per-sample path selection.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from lpi_tpu.models.glip.resnet import FrozenBatchNorm


class InvertedResidual(nn.Module):
    """FBNet IRF block: 1x1 expand -> kxk depthwise -> 1x1 project (relu)."""

    in_ch: int
    out_ch: int
    kernel: int = 3
    stride: int = 1
    expand: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.in_ch * self.expand
        h = x
        if self.expand != 1:
            h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="pw")(h)
            h = FrozenBatchNorm(mid, name="pw_bn")(h).astype(self.dtype)
            h = jax.nn.relu(h)
        h = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride,) * 2, padding="SAME",
                    feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, name="dw")(h)
        h = FrozenBatchNorm(mid, name="dw_bn")(h).astype(self.dtype)
        h = jax.nn.relu(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pwl")(h)
        h = FrozenBatchNorm(self.out_ch, name="pwl_bn")(h).astype(self.dtype)
        if self.stride == 1 and self.in_ch == self.out_ch:
            h = h + x
        return h


# FBNet-C-ish: (kernel, stride, expand, channels, repeats) per stage
FBNET_C_STAGES = (
    (3, 1, 1, 16, 1),
    (3, 2, 6, 24, 4),
    (5, 2, 6, 32, 4),
    (5, 2, 6, 64, 4),
    (5, 1, 6, 112, 4),
    (5, 2, 6, 184, 4),
    (3, 1, 6, 352, 1),
)


class FBNet(nn.Module):
    """Returns [C3 (stride 8), C4 (stride 16), C5 (stride 32)]."""

    stages: Sequence = FBNET_C_STAGES
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> List[jnp.ndarray]:
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype,
                    name="stem")(images.astype(self.dtype))
        x = FrozenBatchNorm(16, name="stem_bn")(x).astype(self.dtype)
        x = jax.nn.relu(x)
        in_ch = 16
        outs = []
        for si, (k, s, e, c, r) in enumerate(self.stages):
            for b in range(r):
                x = InvertedResidual(in_ch=in_ch, out_ch=c, kernel=k,
                                     stride=s if b == 0 else 1, expand=e,
                                     dtype=self.dtype,
                                     name=f"stage{si}_block{b}")(x)
                in_ch = c
            if si in (2, 4, 6):
                outs.append(x)
        return outs


def mixed_operation_random(ops, x, x_path=None):
    """`mixer.py:MixedOperationRandom.forward`: average the candidate ops,
    or select one per call / per sample."""
    if x_path is None:
        return sum(op(x) for op in ops) / len(ops)
    if isinstance(x_path, (int, float)):
        return ops[int(x_path)](x)
    # per-sample path: [B] int array
    outs = jnp.stack([op(x) for op in ops])  # [n_ops, B, ...]
    idx = jnp.asarray(x_path, jnp.int32)
    return jnp.take_along_axis(
        outs, idx.reshape((1, -1) + (1,) * (outs.ndim - 2)), axis=0)[0]

"""FPN with RetinaNet P6/P7 extra levels (GLIP's neck).

Equivalent of `maskrcnn_benchmark/modeling/backbone/fpn.py` as configured by
`build_retinanet_swint_fpn_backbone` (`backbone/__init__.py:37-80`): lateral
1x1 + top-down nearest upsample + 3x3 output convs, P6 = conv(P5),
P7 = conv(relu(P6)). Consumes the last three Swin stage maps (192/384/768
ch; the 96-ch stage is skipped via the reference's `in_channels == 0`
convention).

`use_gn=False` matches the LPI configs: `MODEL.FPN.USE_GN` keeps its
default False (`defaults.py:277` — the yaml's `USE_GN: True` is under
DYHEAD), so the reference FPN convs are plain conv + bias
(`make_layers.py:95-120`). The GN variant covers the USE_GN config surface.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _gn_conv(out_ch: int, k: int, use_gn: bool, dtype, name: str):
    if not use_gn:
        return nn.Conv(out_ch, (k, k), padding="SAME", use_bias=True,
                       dtype=dtype, name=f"{name}_conv")
    groups = 32 if out_ch % 32 == 0 else min(out_ch, 8)
    return nn.Sequential([
        nn.Conv(out_ch, (k, k), padding="SAME", use_bias=False, dtype=dtype,
                name=f"{name}_conv"),
        nn.GroupNorm(num_groups=groups, dtype=jnp.float32, name=f"{name}_gn"),
    ])


class FPN(nn.Module):
    out_channels: int = 256
    num_inputs: int = 3
    use_gn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        """features: bottom-up NHWC maps (e.g. strides 8/16/32) ->
        [P3..P7] NHWC maps at out_channels."""
        feats = list(features)[-self.num_inputs:]
        inners = []
        for i, f in enumerate(feats):
            inner = _gn_conv(self.out_channels, 1, self.use_gn, self.dtype,
                             f"inner{i}")(f.astype(self.dtype))
            inners.append(inner)
        # top-down pathway
        for i in range(len(inners) - 2, -1, -1):
            up = inners[i + 1]
            B, H, W, C = inners[i].shape
            up = jax.image.resize(up, (B, H, W, C), method="nearest")
            inners[i] = inners[i] + up
        outs = [
            _gn_conv(self.out_channels, 3, self.use_gn, self.dtype,
                     f"layer{i}")(inners[i])
            for i in range(len(inners))
        ]
        p5 = outs[-1]
        p6 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding="SAME",
                     dtype=self.dtype, name="p6")(p5)
        p7 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding="SAME",
                     dtype=self.dtype, name="p7")(jax.nn.relu(p6))
        return outs + [p6, p7]

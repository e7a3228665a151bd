"""VLDyHead: GLIP's dynamic detection head with the dot-product token path.

From-scratch Flax equivalent of `maskrcnn_benchmark/modeling/rpn/vldyhead.py`
as the LPI configs exercise it (`EARLY_FUSE_ON: False` — no VLFuse/BERT
stages in the tower):

* 6x DyConv: per level, deformable 3x3 convs (offsets+mask predicted per
  level) over {level-1 (stride 2), level, level+1 (upsampled)}, fused by a
  spatial pyramid attention (h_sigmoid of a 1x1-conv'd GAP) and passed
  through DyReLU (`vldyhead.py:141-236`);
* heads: cls logits (unused by the LPI loss but present), bbox_pred scaled
  by a per-level learnable scalar, centerness, and the **dot-product token
  head**: `Linear(768 -> A*256)` on the L2-normalized text embedding / 2,
  logits = image feats @ projected text / exp(log_scale) + (emb @ bias_lang
  + bias0), clamped to +-50000 (`vldyhead.py:645-681, 829-847`);
* `tunable_linear` (ADD_LINEAR_LAYER / language_prompt_v4): a zero-init
  `[1000, 768]` weight whose first S rows are added to the text embeddings
  (`vldyhead.py:914-917`).

Deviation from the reference (documented): DyConv offsets are computed from
the feature actually being convolved rather than reusing the current level's
offset buffer for neighbors of different spatial size (the reference relies
on unchecked CUDA reads there — SURVEY latent-bug family).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from lpi_tpu.core.config import DyHeadConfig
from lpi_tpu.ops.deform_conv import (deform_conv2d, deform_conv2d_fast,
                                     deform_conv2d_fast_scan,
                                     deform_conv2d_fused,
                                     deform_conv2d_pallas)


def h_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class Conv3x3Norm(nn.Module):
    """3x3 (optionally deformable) conv + GroupNorm (`vldyhead.py` Conv3x3Norm)."""

    out_channels: int
    stride: int = 1
    deformable: bool = True
    dtype: jnp.dtype = jnp.float32
    deform_impl: str = "pallas"
    deform_window: int = 3
    deform_dtype: jnp.dtype = jnp.float32
    deform_remat: str | bool = "auto"

    @nn.compact
    def __call__(self, x, offset=None, mask=None):
        if self.deformable and offset is not None:
            w = self.param("kernel", nn.initializers.normal(0.01),
                           (3, 3, x.shape[-1], self.out_channels))
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.deform_impl in ("fast", "fast_scan", "pallas", "fused"):
                # Windowed impls clamp offsets to +-deform_window px; sow the
                # fraction that would be clamped so callers (e.g.
                # GroundingPredictor.check_deform_clipping) can verify the
                # window is wide enough for real trained offsets.
                self.sow("intermediates", "offset_clip_frac",
                         jnp.mean((jnp.abs(offset.astype(jnp.float32))
                                   > self.deform_window).astype(jnp.float32)))
            if self.stride > 1:  # offsets are input-res; deform wants output-res
                offset = offset[:, ::self.stride, ::self.stride]
                mask = mask[:, ::self.stride, ::self.stride] if mask is not None else None
            if self.deform_impl == "fast":
                y = deform_conv2d_fast(x, offset, w, b, mask=mask,
                                       stride=self.stride,
                                       max_offset=self.deform_window)
            elif self.deform_impl == "fast_scan":
                y = deform_conv2d_fast_scan(x, offset, w, b, mask=mask,
                                            stride=self.stride,
                                            max_offset=self.deform_window)
            elif self.deform_impl == "pallas":
                remat = {"on": True, "off": False}.get(self.deform_remat,
                                                       self.deform_remat)
                y = deform_conv2d_pallas(x, offset, w, b, mask=mask,
                                         stride=self.stride,
                                         max_offset=self.deform_window,
                                         compute_dtype=self.deform_dtype,
                                         remat=remat)
            elif self.deform_impl == "fused":
                y = deform_conv2d_fused(x, offset, w, b, mask=mask,
                                        stride=self.stride,
                                        max_offset=self.deform_window)
            else:
                y = deform_conv2d(x, offset, w, b, mask=mask, stride=self.stride)
        else:
            y = nn.Conv(self.out_channels, (3, 3), strides=(self.stride,) * 2,
                        padding="SAME", dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.01), name="conv")(x)
        groups = 16 if self.out_channels % 16 == 0 else 1
        return nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=jnp.float32,
                            name="gn")(y).astype(self.dtype)


class DyReLU(nn.Module):
    """DyReLU-B (`layers/dyrelu.py:38-115`, exp=4 piecewise max)."""

    channels: int
    reduction: int = 4
    lambda_a: float = 2.0

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        y = jnp.mean(x, axis=(1, 2))  # GAP [B, C]
        y = nn.Dense(self.channels // self.reduction, name="fc1")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(4 * self.channels, name="fc2")(y)
        y = h_sigmoid(y).reshape(B, 1, 1, 4 * self.channels)
        a1, b1, a2, b2 = jnp.split(y, 4, axis=-1)
        a1 = (a1 - 0.5) * self.lambda_a + 1.0
        a2 = (a2 - 0.5) * self.lambda_a
        b1 = b1 - 0.5
        b2 = b2 - 0.5
        return jnp.maximum(x * a1 + b1, x * a2 + b2)


class DyConv(nn.Module):
    """One dynamic conv stage over the FPN pyramid (`vldyhead.py:141-236`)."""

    in_channels: int
    out_channels: int
    use_dyrelu: bool = True
    use_dyfuse: bool = True
    use_deform: bool = True
    dtype: jnp.dtype = jnp.float32
    deform_impl: str = "pallas"
    deform_window: int = 3
    deform_dtype: jnp.dtype = jnp.float32
    deform_remat: str | bool = "auto"

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        conv_same = Conv3x3Norm(self.out_channels, 1, self.use_deform,
                                self.dtype, self.deform_impl,
                                self.deform_window, self.deform_dtype,
                                self.deform_remat, name="conv_same")
        conv_down = Conv3x3Norm(self.out_channels, 2, self.use_deform,
                                self.dtype, self.deform_impl,
                                self.deform_window, self.deform_dtype,
                                self.deform_remat, name="conv_down")
        conv_up = Conv3x3Norm(self.out_channels, 1, self.use_deform,
                              self.dtype, self.deform_impl,
                              self.deform_window, self.deform_dtype,
                              self.deform_remat, name="conv_up")
        offset_conv = (
            nn.Conv(27, (3, 3), padding="SAME",
                    kernel_init=nn.initializers.normal(0.01), name="offset")
            if self.use_deform else None
        )
        attn_conv = (
            nn.Conv(1, (1, 1), kernel_init=nn.initializers.normal(0.01),
                    name="attn") if self.use_dyfuse else None
        )
        dyrelu = DyReLU(self.out_channels, name="dyrelu") if self.use_dyrelu else None

        def off(f):
            if offset_conv is None:
                return None, None
            om = offset_conv(f)
            return om[..., :18], om[..., 18:]

        offsets = [off(f) for f in feats]

        outs = []
        for level, feature in enumerate(feats):
            o, m = offsets[level]
            temp = [conv_same(feature, o, m)]
            if level > 0:
                o_p, m_p = offsets[level - 1]
                temp.append(conv_down(feats[level - 1], o_p, m_p))
            if level < len(feats) - 1:
                o_n, m_n = offsets[level + 1]
                up = conv_up(feats[level + 1], o_n, m_n)
                B, H, W, C = temp[0].shape
                temp.append(jax.image.resize(up, (B, H, W, C), method="bilinear"))
            stacked = jnp.stack(temp)  # [k, B, H, W, C]
            if attn_conv is not None:
                attn = jnp.stack([
                    h_sigmoid(attn_conv(jnp.mean(t, axis=(1, 2), keepdims=True)))
                    for t in temp
                ])  # [k, B, 1, 1, 1]
                fused = jnp.mean(stacked * attn, axis=0)
            else:
                fused = jnp.mean(stacked, axis=0)
            outs.append(fused)
        if dyrelu is not None:
            outs = [dyrelu(o) for o in outs]
        else:
            outs = [jax.nn.relu(o) for o in outs]
        return outs


class VLDyHead(nn.Module):
    cfg: DyHeadConfig
    lang_dim: int = 768
    num_anchors: int = 1
    dtype: jnp.dtype = jnp.float32
    bert_cfg: object = None  # BertConfig for early-fusion language stages

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], embedded: jnp.ndarray,
                 text_masks: jnp.ndarray, hidden: jnp.ndarray = None):
        """features: FPN maps NHWC; embedded [B, T, 768]; masks [B, T];
        `hidden` — language hidden states, consumed when early fusion is on.

        Returns dict with per-level lists: bbox_pred [B,H,W,A*4], centerness
        [B,H,W,A], dot_logits [B, HWA, T] — plus the (bias-initialized but
        LPI-unused) cls logits.
        """
        c = self.cfg
        x = list(features)
        in_ch = x[0].shape[-1]
        for i in range(c.num_convs):
            first = i == 0
            if c.early_fuse and hidden is not None:
                from lpi_tpu.models.glip.vlfuse import VLFuse

                x, hidden = VLFuse(
                    v_dim=x[0].shape[-1], l_dim=self.lang_dim,
                    embed_dim=c.fuse_embed_dim, num_heads=c.fuse_heads,
                    init_values=1.0 / c.num_convs, dtype=self.dtype,
                    name=f"fuse{i}")(x, hidden, text_masks)
                if self.bert_cfg is not None:
                    from lpi_tpu.models.glip.bert import BertLayer

                    hidden = BertLayer(self.bert_cfg, self.dtype,
                                       name=f"lang{i}")(hidden, text_masks)
            x = DyConv(
                in_channels=in_ch if first else c.channels,
                out_channels=c.channels,
                use_dyrelu=c.use_dyrelu and (not first or in_ch == c.channels),
                use_dyfuse=c.use_dyfuse and (not first or in_ch == c.channels),
                use_deform=c.use_dfconv and (not first or in_ch == c.channels),
                dtype=self.dtype, deform_impl=c.deform_impl,
                deform_window=c.deform_window,
                deform_remat=c.deform_remat,
                # "auto" follows the model dtype: an f32 config gets
                # bit-faithful f32 deform (the accuracy gate), a bf16 one
                # (the flagship recipe) the halved-HBM product maps
                deform_dtype=jnp.bfloat16 if (
                    c.deform_dtype == "bfloat16"
                    or (c.deform_dtype == "auto"
                        and self.dtype == jnp.bfloat16))
                else jnp.float32, name=f"tower{i}")(x)

        bias_value = -math.log((1 - c.prior_prob) / c.prior_prob)
        A = self.num_anchors
        cls_conv = nn.Conv(A * (c.num_classes - 1), (1, 1),
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(bias_value),
                           name="cls_logits")
        bbox_conv = nn.Conv(A * 4, (1, 1), kernel_init=nn.initializers.normal(0.01),
                            name="bbox_pred")
        ctr_conv = nn.Conv(A * 1, (1, 1), kernel_init=nn.initializers.normal(0.01),
                           name="centerness")
        scales = self.param("scales", nn.initializers.ones, (len(x),))
        log_scale = self.param("log_scale",
                               nn.initializers.constant(c.log_scale), (1,))
        bias_lang = self.param("bias_lang", nn.initializers.zeros, (self.lang_dim,))
        bias0 = self.param("bias0", nn.initializers.constant(bias_value), (1,))
        dot_proj_text = nn.Dense(A * c.channels, name="dot_product_projection_text")

        # normalized text embedding -> per-token projections + bias.
        # eps INSIDE the sqrt: padding tokens are exactly zero and
        # norm(0).clip() has a NaN backward (0 * inf), poisoning training.
        emb = embedded * jax.lax.rsqrt(
            jnp.sum(embedded * embedded, axis=-1, keepdims=True) + 1e-12)
        proj_tokens = dot_proj_text(emb / 2.0)  # [B, T, A*C]
        tokens_bias = emb @ bias_lang + bias0  # [B, T]

        out = {"bbox_pred": [], "centerness": [], "dot_logits": [], "cls_logits": [],
               "visual": x}
        for l, feat in enumerate(x):
            B, H, W, C = feat.shape
            out["cls_logits"].append(cls_conv(feat))
            out["bbox_pred"].append(bbox_conv(feat) * scales[l])
            out["centerness"].append(ctr_conv(feat))
            q = feat.reshape(B, H * W * A, C)  # identity image projection
            logit = jnp.einsum("bnc,btc->bnt", q,
                               proj_tokens.reshape(B, -1, C)) / jnp.exp(log_scale)
            logit = logit + tokens_bias[:, None, :]
            logit = jnp.clip(logit, -50000.0, 50000.0)
            out["dot_logits"].append(logit)
        return out


class TunableLinear(nn.Module):
    """ADD_LINEAR_LAYER: zero-init [max_len, dim] additive text adapter."""

    dim: int = 768
    max_len: int = 1000

    @nn.compact
    def __call__(self, embedded: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", nn.initializers.zeros, (self.max_len, self.dim))
        S = embedded.shape[1]
        return embedded + w[None, :S, :]

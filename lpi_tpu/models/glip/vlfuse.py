"""VLFuse — GLIP's early cross-modal fusion (MHA-B) in Flax.

Equivalent of `maskrcnn_benchmark/utils/fuse_helper.py:171-343`
(BiMultiHeadAttention + BiAttentionBlock) and `rpn/vldyhead.py:350-430`
(VLFuse): all FPN levels are flattened and concatenated into one visual
sequence, bidirectional cross-attention runs between it and the language
hidden states (stable-softmax max-subtraction + ±50000 clamps), and
layer-scaled residuals update both modalities. Off in every LPI config
(`EARLY_FUSE_ON: False`) but part of the GLIP capability surface.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class BiMultiHeadAttention(nn.Module):
    v_dim: int
    l_dim: int
    embed_dim: int = 256
    num_heads: int = 8
    stable_softmax_2d: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, v: jnp.ndarray, l: jnp.ndarray,
                 attention_mask_l: jnp.ndarray | None = None):
        B, Nv, _ = v.shape
        Nl = l.shape[1]
        H = self.num_heads
        hd = self.embed_dim // H
        scale = hd ** -0.5
        xavier = nn.initializers.xavier_uniform()

        def heads(x):
            return x.reshape(B, -1, H, hd).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(self.embed_dim, kernel_init=xavier, dtype=self.dtype,
                           name="v_proj")(v) * scale)
        k = heads(nn.Dense(self.embed_dim, kernel_init=xavier, dtype=self.dtype,
                           name="l_proj")(l))
        val_v = heads(nn.Dense(self.embed_dim, kernel_init=xavier, dtype=self.dtype,
                               name="values_v_proj")(v))
        val_l = heads(nn.Dense(self.embed_dim, kernel_init=xavier, dtype=self.dtype,
                               name="values_l_proj")(l))

        attn = jnp.einsum("bhvd,bhld->bhvl", q, k).astype(jnp.float32)
        if self.stable_softmax_2d:
            attn = attn - jnp.max(attn)
        attn = jnp.clip(attn, -50000.0, 50000.0)

        # language <- vision direction: softmax over the visual axis
        attn_t = attn.transpose(0, 1, 3, 2)  # [B,H,Nl,Nv]
        attn_t = attn_t - jnp.max(attn_t, axis=-1, keepdims=True)
        attn_t = jnp.clip(attn_t, -50000.0, 50000.0)
        attn_l = jax.nn.softmax(attn_t, axis=-1)

        # vision <- language direction: mask padded tokens then softmax
        if attention_mask_l is not None:
            bias = jnp.where(attention_mask_l[:, None, None, :] > 0, 0.0, -9e15)
            attn = attn + bias
        attn_v = jax.nn.softmax(attn, axis=-1)

        out_v = jnp.einsum("bhvl,bhld->bhvd", attn_v, val_l)
        out_l = jnp.einsum("bhlv,bhvd->bhld", attn_l, val_v)
        out_v = out_v.transpose(0, 2, 1, 3).reshape(B, Nv, self.embed_dim)
        out_l = out_l.transpose(0, 2, 1, 3).reshape(B, Nl, self.embed_dim)
        out_v = nn.Dense(self.v_dim, kernel_init=xavier, dtype=self.dtype,
                         name="out_v_proj")(out_v)
        out_l = nn.Dense(self.l_dim, kernel_init=xavier, dtype=self.dtype,
                         name="out_l_proj")(out_l)
        return out_v, out_l


class BiAttentionBlock(nn.Module):
    """Pre-LN bi-attention with layer-scale residuals (`fuse_helper.py:307`)."""

    v_dim: int
    l_dim: int
    embed_dim: int = 256
    num_heads: int = 8
    init_values: float = 1.0 / 6.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, v, l, attention_mask_l=None):
        vn = nn.LayerNorm(dtype=jnp.float32, name="layer_norm_v")(v).astype(v.dtype)
        ln = nn.LayerNorm(dtype=jnp.float32, name="layer_norm_l")(l).astype(l.dtype)
        dv, dl = BiMultiHeadAttention(
            self.v_dim, self.l_dim, self.embed_dim, self.num_heads,
            dtype=self.dtype, name="attn")(vn, ln, attention_mask_l)
        gamma_v = self.param("gamma_v",
                             nn.initializers.constant(self.init_values), (self.v_dim,))
        gamma_l = self.param("gamma_l",
                             nn.initializers.constant(self.init_values), (self.l_dim,))
        return v + gamma_v * dv, l + gamma_l * dl


class VLFuse(nn.Module):
    """Fuse all FPN levels with the language hidden states."""

    v_dim: int = 256
    l_dim: int = 768
    embed_dim: int = 256
    num_heads: int = 8
    init_values: float = 1.0 / 6.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], hidden: jnp.ndarray,
                 attention_mask_l: jnp.ndarray | None = None
                 ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        shapes = [(f.shape[1], f.shape[2]) for f in features]
        B = features[0].shape[0]
        flat = jnp.concatenate(
            [f.reshape(B, -1, f.shape[-1]) for f in features], axis=1)
        fused_v, fused_l = BiAttentionBlock(
            self.v_dim, self.l_dim, self.embed_dim, self.num_heads,
            self.init_values, self.dtype, name="b_attn")(
                flat, hidden, attention_mask_l)
        outs = []
        start = 0
        for (h, w), f in zip(shapes, features):
            n = h * w
            outs.append(fused_v[:, start:start + n].reshape(B, h, w, self.v_dim))
            start += n
        return outs, fused_l

"""Swin backbone variants: v2 (conv stem) and VL (language-aware windows).

From-scratch equivalents of the reference's alternative visual backbones
(SURVEY §2.3 G18, selected by `MODEL.SWINT.VERSION`):

* `SwinTransformerV2` — `backbone/swint_v2.py`: stock Swin stages behind an
  overlapping ConvEmbed stem (7x7 stride-4 pad-2 conv + LayerNorm,
  `swint_v2.py:442-497`) instead of the non-overlapping 4x4 patchify.
* `SwinTransformerVL` — `backbone/swint_vl.py`: every window-attention block
  jointly attends over vision and language. Image queries attend to their
  window's tokens PLUS all text tokens (with a learned per-head image->text
  bias and the text padding mask, `swint_vl.py:149-175`); text queries
  attend to ALL of the image's window-batched keys plus text (t2i bias
  column + t2t bias matrix, `:185-207`); text output is projected back to
  the language width and carries its own residual+MLP stream
  (`:264-346`). The tower consumes/returns `language_dict_features`-style
  (hidden, mask) pairs (`:699-737`).

Both reuse the v1 building blocks (`models/glip/swin.py`) wherever the
reference shares them: window partition geometry, relative-position bias
tables, shifted-window masks, patch merging.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lpi_tpu.models.glip.swin import (
    PatchMerging,
    SwinBlock,
    SwinMlp,
    _window_partition,
    _window_reverse,
    relative_position_index,
    shifted_window_mask,
)


class ConvEmbed(nn.Module):
    """Overlapping conv stem (`swint_v2.py:442-497`)."""

    embed_dim: int = 96
    patch_size: int = 7
    stride: int = 4
    padding: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, int, int]:
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.stride, self.stride),
                    padding=[(self.padding, self.padding)] * 2,
                    dtype=self.dtype, name="proj")(images.astype(self.dtype))
        B, h, w, C = x.shape
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(
            x.reshape(B, h * w, C)).astype(self.dtype)
        return x, h, w


class SwinTransformerV2(nn.Module):
    """Swin-T stages behind the ConvEmbed stem (`swint_v2.py:499-670`)."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    out_stages: Sequence[int] = (2, 3, 4)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        x, H, W = ConvEmbed(embed_dim=self.embed_dim, dtype=self.dtype,
                            name="patch_embed")(images)
        outs = []
        for s, depth in enumerate(self.depths):
            dim = self.embed_dim * (2 ** s)
            for b in range(depth):
                x = SwinBlock(dim=dim, num_heads=self.num_heads[s],
                              window_size=self.window_size,
                              shift=0 if b % 2 == 0 else self.window_size // 2,
                              mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                              name=f"stage{s}_block{b}")(x, H, W)
            if (s + 2) in self.out_stages:
                out = nn.LayerNorm(dtype=jnp.float32, name=f"out_norm{s}")(x)
                outs.append(out.reshape(x.shape[0], H, W, dim).astype(self.dtype))
            if s < len(self.depths) - 1:
                x = PatchMerging(dim, self.dtype, name=f"downsample{s}")(x, H, W)
                H, W = (H + 1) // 2, (W + 1) // 2
        return outs


class WindowAttentionVL(nn.Module):
    """Joint vision-language window attention (`swint_vl.py:64-211`)."""

    dim: int
    num_heads: int
    window_size: int
    text_dim: int
    max_text_len: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray],
                 x_text: jnp.ndarray, mask_text: jnp.ndarray):
        """x [nW*B, N, C]; mask [nW, N, N] additive; x_text [B, Nt, Ct];
        mask_text [B, Nt] additive (0 / -inf). -> (x', x_text')."""
        Bn, N, C = x.shape
        H = self.num_heads
        ws = self.window_size
        B, Nt, Ct = x_text.shape
        nW = Bn // B
        hd = C // H
        scale = hd ** -0.5

        table = self.param("relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02),
                           ((2 * ws - 1) ** 2, H))
        idx = jnp.asarray(relative_position_index(ws).reshape(-1))
        rel_bias = jnp.take(table, idx, axis=0).reshape(N, N, H).transpose(2, 0, 1)
        i2t_bias = self.param("i2t_relative_position_bias",
                              nn.initializers.truncated_normal(0.02),
                              (2, H, self.max_text_len))
        t2t_bias = self.param("t2t_relative_position_bias",
                              nn.initializers.truncated_normal(0.02),
                              (H, self.max_text_len, self.max_text_len))

        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        q, k, v = [a.reshape(Bn, N, H, hd).transpose(0, 2, 1, 3)
                   for a in jnp.split(qkv, 3, axis=-1)]
        qkv_t = nn.Dense(3 * C, dtype=self.dtype, name="qkv_text")(x_text)
        q_t, k_t, v_t = [a.reshape(B, Nt, H, hd).transpose(0, 2, 1, 3)
                         for a in jnp.split(qkv_t, 3, axis=-1)]

        f32 = jnp.float32
        q = q.astype(f32) * scale
        # ---- image stream: window self-attn + image->text ----
        attn = q @ k.astype(f32).transpose(0, 1, 3, 2) + rel_bias[None].astype(f32)
        if mask is not None:
            attn = (attn.reshape(B, nW, H, N, N)
                    + mask[None, :, None].astype(f32)).reshape(Bn, H, N, N)
        k_t_rep = jnp.repeat(k_t, nW, axis=0).astype(f32)  # [Bn, H, Nt, hd]
        attn_i2t = q @ k_t_rep.transpose(0, 1, 3, 2)  # [Bn, H, N, Nt]
        i2t = (i2t_bias[0][None, :, None, :Nt].astype(f32)
               + mask_text[:, None, None, :].astype(f32))
        attn_i2t = attn_i2t + jnp.repeat(i2t, nW, axis=0)
        full = jax.nn.softmax(jnp.concatenate([attn, attn_i2t], -1), axis=-1)
        v_full = jnp.concatenate([v.astype(f32),
                                  jnp.repeat(v_t, nW, axis=0).astype(f32)], 2)
        out = (full @ v_full).transpose(0, 2, 1, 3).reshape(Bn, N, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out.astype(self.dtype))

        # ---- text stream: text->all-windows + text->text ----
        q_t = q_t.astype(f32) * scale
        k_all = k.reshape(B, nW, H, N, hd).transpose(0, 2, 1, 3, 4).reshape(
            B, H, nW * N, hd).astype(f32)
        v_all = v.reshape(B, nW, H, N, hd).transpose(0, 2, 1, 3, 4).reshape(
            B, H, nW * N, hd).astype(f32)
        attn_t2i = q_t @ k_all.transpose(0, 1, 3, 2)  # [B, H, Nt, nW*N]
        attn_t2i = attn_t2i + i2t_bias[1][None, :, :Nt, None].astype(f32)
        attn_t2t = q_t @ k_t.astype(f32).transpose(0, 1, 3, 2)
        attn_t2t = (attn_t2t + t2t_bias[None, :, :Nt, :Nt].astype(f32)
                    + mask_text[:, None, None, :].astype(f32))
        full_t = jax.nn.softmax(jnp.concatenate([attn_t2i, attn_t2t], -1), -1)
        vt_full = jnp.concatenate([v_all, v_t.astype(f32)], 2)
        out_t = (full_t @ vt_full).transpose(0, 2, 1, 3).reshape(B, Nt, C)
        out_t = nn.Dense(self.text_dim, dtype=self.dtype,
                         name="proj_text")(out_t.astype(self.dtype))
        return out, out_t


class SwinBlockVL(nn.Module):
    """Swin block with the joint VL attention (`swint_vl.py:214-346`)."""

    dim: int
    num_heads: int
    text_dim: int
    max_text_len: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, H: int, W: int, x_text, mask_text):
        import math as _math

        B, L, C = x.shape
        ws = self.window_size
        shortcut = x
        shortcut_text = x_text
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x_text = nn.LayerNorm(dtype=jnp.float32,
                              name="norm1_text")(x_text).astype(self.dtype)
        x = x.reshape(B, H, W, C)
        Hp = int(_math.ceil(H / ws)) * ws
        Wp = int(_math.ceil(W / ws)) * ws
        x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(shifted_window_mask(Hp, Wp, ws, self.shift))
        else:
            mask = None
        windows = _window_partition(x, ws)
        windows, x_text = WindowAttentionVL(
            C, self.num_heads, ws, self.text_dim, self.max_text_len,
            self.dtype, name="attn")(windows, mask, x_text, mask_text)
        x = _window_reverse(windows, ws, B, Hp, Wp)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = x[:, :H, :W].reshape(B, L, C)
        x = shortcut + x
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        x = x + SwinMlp(C, int(C * self.mlp_ratio), self.dtype, name="mlp")(h)

        x_text = shortcut_text + x_text
        ht = nn.LayerNorm(dtype=jnp.float32,
                          name="norm2_text")(x_text).astype(self.dtype)
        x_text = x_text + SwinMlp(self.text_dim,
                                  int(self.text_dim * self.mlp_ratio),
                                  self.dtype, name="mlp_text")(ht)
        return x, x_text


class SwinTransformerVL(nn.Module):
    """Language-aware Swin tower (`swint_vl.py:499-737`): consumes the image
    and the language hidden states, returns (fpn outs, updated hidden)."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    out_stages: Sequence[int] = (2, 3, 4)
    text_dim: int = 768
    max_text_len: int = 256
    patch_size: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, text_hidden: jnp.ndarray,
                 text_mask: jnp.ndarray):
        """text_mask [B, Nt] with 1 = real token (converted to additive)."""
        B, H0, W0, _ = images.shape
        ph = (self.patch_size - H0 % self.patch_size) % self.patch_size
        pw = (self.patch_size - W0 % self.patch_size) % self.patch_size
        images = jnp.pad(images, ((0, 0), (0, ph), (0, pw), (0, 0)))
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size,) * 2, dtype=self.dtype,
                    name="patch_proj")(images.astype(self.dtype))
        B, H, W, C = x.shape
        x = nn.LayerNorm(dtype=jnp.float32, name="patch_norm")(
            x.reshape(B, H * W, C)).astype(self.dtype)
        # 0 keeps, -inf drops (`swint_vl.py:713-716`)
        add_mask = (1.0 - text_mask.astype(jnp.float32)) * -10000.0

        outs = []
        for s, depth in enumerate(self.depths):
            dim = self.embed_dim * (2 ** s)
            for b in range(depth):
                x, text_hidden = SwinBlockVL(
                    dim=dim, num_heads=self.num_heads[s],
                    text_dim=self.text_dim, max_text_len=self.max_text_len,
                    window_size=self.window_size,
                    shift=0 if b % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                    name=f"stage{s}_block{b}")(x, H, W, text_hidden, add_mask)
            if (s + 2) in self.out_stages:
                out = nn.LayerNorm(dtype=jnp.float32, name=f"out_norm{s}")(x)
                outs.append(out.reshape(B, H, W, dim).astype(self.dtype))
            if s < len(self.depths) - 1:
                x = PatchMerging(dim, self.dtype, name=f"downsample{s}")(x, H, W)
                H, W = (H + 1) // 2, (W + 1) // 2
        return outs, text_hidden

"""Swin Transformer (GLIP's visual tower) in Flax, block-steppable.

From-scratch implementation of the capabilities of the reference's
`maskrcnn_benchmark/modeling/backbone/swint.py` (stock GLIP Swin-T: window
attention with relative position bias, shifted windows, patch merging,
stages [2,2,6,2]).

TPU-first specifics:
* static input shapes — window padding amounts and the shifted-window
  attention masks are computed with numpy AT TRACE TIME per (H, W), so the
  compiled program has no dynamic shapes;
* the tower exposes `patch_embed` / `run_block` / `downsample` /
  `stage_norm` as separately callable methods so the fused dual-tower
  encoder (`lpi_tpu.models.glip.fused`) can interleave Swin blocks with BERT
  layers under one global block counter — the LPI schedule
  (`modeling_bert.py:693-883`);
* channel-last layouts; attention uses `jax.nn.dot_product_attention` with
  an additive bias (relative position + window mask).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nH*nW, ws*ws, C] (H, W divisible by ws)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def _window_reverse(windows: jnp.ndarray, ws: int, B: int, H: int, W: int) -> jnp.ndarray:
    C = windows.shape[-1]
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def relative_position_index(ws: int) -> np.ndarray:
    """[ws*ws, ws*ws] indices into the (2ws-1)^2 bias table (stock Swin)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def shifted_window_mask(Hp: int, Wp: int, ws: int, shift: int) -> np.ndarray:
    """Additive mask [nW, ws*ws, ws*ws] for shifted windows (0 / -100),
    identical to the reference's per-stage mask construction
    (`modeling_bert.py:718-736`)."""
    img_mask = np.zeros((Hp, Wp))
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[h, w] = cnt
            cnt += 1
    mw = img_mask.reshape(Hp // ws, ws, Wp // ws, ws).transpose(0, 2, 1, 3)
    mw = mw.reshape(-1, ws * ws)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        """x [nW*B, N, C]; mask [nW, N, N] additive or None."""
        Bn, N, C = x.shape
        H = self.num_heads
        ws = self.window_size
        table = self.param("relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02),
                           ((2 * ws - 1) ** 2, H))
        idx = jnp.asarray(relative_position_index(ws).reshape(-1))
        bias = jnp.take(table, idx, axis=0).reshape(N, N, H).transpose(2, 0, 1)

        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(Bn, N, H, C // H)
        k = k.reshape(Bn, N, H, C // H)
        v = v.reshape(Bn, N, H, C // H)

        full_bias = bias[None].astype(jnp.float32)  # [1, H, N, N]
        if mask is not None:
            nW = mask.shape[0]
            # [B, nW, H, N, N] flattened to match window-batched q/k/v
            full_bias = (full_bias[None] + mask[None, :, None].astype(jnp.float32))
            full_bias = jnp.broadcast_to(
                full_bias, (Bn // nW, nW, H, N, N)).reshape(Bn, H, N, N)
        out = jax.nn.dot_product_attention(q, k, v, bias=full_bias)
        out = out.reshape(Bn, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinMlp(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class SwinBlock(nn.Module):
    """One Swin block; (H, W) are static python ints at trace time."""

    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
        B, L, C = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = x.reshape(B, H, W, C)

        Hp = int(math.ceil(H / ws)) * ws
        Wp = int(math.ceil(W / ws)) * ws
        x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))

        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(shifted_window_mask(Hp, Wp, ws, self.shift))
        else:
            mask = None

        windows = _window_partition(x, ws)
        windows = WindowAttention(C, self.num_heads, ws, self.dtype,
                                  name="attn")(windows, mask)
        x = _window_reverse(windows, ws, B, Hp, Wp)

        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = x[:, :H, :W].reshape(B, L, C)
        x = shortcut + x
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        return x + SwinMlp(C, int(C * self.mlp_ratio), self.dtype, name="mlp")(h)


class PatchMerging(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = x.reshape(B, -1, 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Swin-T tower, steppable block-by-block for the fused LPI schedule.

    `__call__` runs the whole tower (standalone use / tests); the fused
    encoder instead drives `patch_embed` + `run_block` + `downsample` +
    `stage_norm` under its own loop.
    """

    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    out_stages: Sequence[int] = (2, 3, 4)  # 'stage{i+2}' naming like GLIP
    with_blocks: bool = True  # False: embed/downsample/norms only (the
    #                            fused encoder owns the blocks in its
    #                            scanned pair stacks)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.patch_proj = nn.Conv(self.embed_dim,
                                  (self.patch_size, self.patch_size),
                                  strides=(self.patch_size, self.patch_size),
                                  dtype=self.dtype, name="patch_proj")
        self.patch_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="patch_norm")
        blocks = []
        downsamples = []
        norms = []
        dims = []
        for s, depth in enumerate(self.depths):
            dim = self.embed_dim * (2 ** s)
            dims.append(dim)
            stage_blocks = [
                SwinBlock(dim=dim, num_heads=self.num_heads[s],
                          window_size=self.window_size,
                          shift=0 if b % 2 == 0 else self.window_size // 2,
                          mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                          name=f"stage{s}_block{b}")
                for b in range(depth)
            ] if self.with_blocks else []
            blocks.append(stage_blocks)
            if s < len(self.depths) - 1:
                downsamples.append(PatchMerging(dim, self.dtype, name=f"downsample{s}"))
            if (s + 2) in self.out_stages:
                # stage 0 ('stage2') gets nn.Identity under the RETINANET
                # arch (`swint.py:556-559`: `if i_layer == 0 and
                # backbone_arch.endswith("RETINANET"): nn.Identity()`), so
                # the GLIP checkpoint has norm1..3 only
                if s == 0:
                    norms.append("identity")
                else:
                    norms.append(nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                              name=f"out_norm{s}"))
            else:
                norms.append(None)
        self.blocks = blocks
        self.downsamples = downsamples
        self.out_norms = norms
        self.dims = tuple(dims)

    # -- steppable pieces -------------------------------------------------
    def embed(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, int, int]:
        """images [B, H, W, 3] -> (tokens [B, h*w, C], h, w)."""
        B, H, W, _ = images.shape
        ph = (self.patch_size - H % self.patch_size) % self.patch_size
        pw = (self.patch_size - W % self.patch_size) % self.patch_size
        images = jnp.pad(images, ((0, 0), (0, ph), (0, pw), (0, 0)))
        x = self.patch_proj(images.astype(self.dtype))
        B, h, w, C = x.shape
        x = self.patch_norm(x.reshape(B, h * w, C)).astype(self.dtype)
        return x, h, w

    def run_block(self, stage: int, block: int, x, H: int, W: int):
        return self.blocks[stage][block](x, H, W)

    def downsample(self, stage: int, x, H: int, W: int):
        x = self.downsamples[stage](x, H, W)
        return x, (H + 1) // 2, (W + 1) // 2

    def stage_norm(self, stage: int, x, H: int, W: int):
        """Per-stage output norm -> NHWC feature map (or None if unused)."""
        norm = self.out_norms[stage]
        if norm is None:
            return None
        out = x if norm == "identity" else norm(x)
        B = x.shape[0]
        return out.reshape(B, H, W, self.dims[stage]).astype(self.dtype)

    # -- standalone forward ----------------------------------------------
    def __call__(self, images: jnp.ndarray):
        x, H, W = self.embed(images)
        outs = []
        for s in range(len(self.depths)):
            for b in range(len(self.blocks[s])):
                x = self.run_block(s, b, x, H, W)
            out = self.stage_norm(s, x, H, W)
            if out is not None:
                outs.append(out)
            if s < len(self.depths) - 1:
                x, H, W = self.downsample(s, x, H, W)
        return outs

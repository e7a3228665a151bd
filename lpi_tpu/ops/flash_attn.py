"""Fused (flash) attention for the CLIP towers.

The reference computes attention through torch's nn.MultiheadAttention
(`retrieval/models/clip/model.py:58` / `:168-196`), which materializes the
full [B, H, S, S] logits matrix. On TPU the XLA lowering of the same math
also round-trips those logits through HBM (S=213 at ViT-B/16 + 16 prompt
tokens); this wrapper swaps in jax's Pallas TPU flash-attention kernel so
logits/softmax stay in VMEM tiles.

Kernel constraints handled here:
* sequence lengths must be block multiples — inputs are zero-padded to the
  next multiple of 128 and the output sliced back;
* padded KEY positions must not receive attention weight: for causal
  towers the causal mask already excludes them (all pad indices > every
  real query index); for bidirectional towers a SegmentIds mask separates
  real (1) from pad (0) positions. Padded QUERY rows compute garbage that
  the final slice discards, and the segment/causal mask zeroes their
  gradient contribution.

Opt in via `CLIPConfig.attn_impl = "flash"`; the default "xla" path keeps
`jax.nn.dot_product_attention`. CPU parity is tested under
`pltpu.force_tpu_interpret_mode()` (tests/test_flash_attn.py).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def flash_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              causal: bool = False) -> jnp.ndarray:
    """Multi-head attention via the Pallas TPU flash kernel.

    q, k, v: [B, S, H, Dh] (the layout `MultiheadAttention` produces).
    Returns [B, S, H, Dh] in q's dtype. Softmax scale is 1/sqrt(Dh), the
    convention `jax.nn.dot_product_attention` uses.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    B, S, H, Dh = q.shape
    Sp = _round_up(max(S, 128), 128)
    pad = Sp - S

    def prep(x):
        x = jnp.moveaxis(x, 2, 1)  # [B, H, S, Dh]
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x

    seg = None
    if pad and not causal:
        ids = jnp.broadcast_to(
            (jnp.arange(Sp) < S).astype(jnp.int32)[None], (B, Sp))
        seg = SegmentIds(q=ids, kv=ids)

    out = flash_attention(
        prep(q), prep(k), prep(v), segment_ids=seg, causal=causal,
        sm_scale=1.0 / math.sqrt(Dh),
        block_sizes=BlockSizes.get_default(B, H, Sp, Sp, Dh))
    return jnp.moveaxis(out[:, :, :S], 1, 2).astype(q.dtype)

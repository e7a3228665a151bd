"""CLIP ViT-B/16 dual encoder in Flax, with per-layer prompt injection hooks.

A from-scratch TPU-native implementation of the capabilities of the
reference's vendored OpenAI CLIP (`retrieval/models/clip/model.py`):

* Vision tower: patch conv → [CLS | prompt tokens | patches] → 12 pre-LN
  transformer blocks (QuickGELU MLP) → ln_post(CLS) @ proj
  (`model.py:210-259`).
* Text tower: token embeddings (+ CoOp ctx / textual-prompt splice done by
  the caller) → causal transformer → ln_final → EOT pooling @ text_projection
  (`model.py:343-361`, `prompt_learner.py:43-63`).

TPU-first design choices:
* The 12 blocks run as one `nn.scan` over stacked parameters — one trace,
  one compiled body, fast compile times.
* Per-layer prompt injection is a scan input: prompts `[L, B, P, D]` plus a
  per-layer gate. The reference's deep-injection branch is dead code
  (`model.py:190` — gate always false); here it actually works, and
  `injection_depth=1` (gates all zero) reproduces the reference's live
  input-level-only behavior.
* Compute in bfloat16 (params fp32), LayerNorms in fp32 — replaces the
  reference's fp16 `convert_weights` (`model.py:394-415`).
* Static shapes everywhere: 1 + P + 196 visual tokens, 77 text tokens.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lpi_tpu.core.config import CLIPConfig


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class MultiheadAttention(nn.Module):
    """Packed-QKV multi-head attention (matches torch nn.MultiheadAttention
    layout so OpenAI checkpoints convert 1:1).

    `attn_impl='bf16'` keeps the [B,H,S,S] score/prob tensors in the
    compute dtype (identical math to 'xla' under fp32). A Pallas
    flash-attention wrapper was measured 2x SLOWER than either at S=213
    (330 vs 621 samples/s on the b64 train step, r4 sweep — the generic
    kernel pads 213->256 and attention is only ~4%% of tower FLOPs) and
    deleted per the no-dead-kernels rule."""

    width: int
    heads: int
    causal: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, S, D = x.shape
        H = self.heads
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, H, D // H)
        k = k.reshape(B, S, H, D // H)
        v = v.reshape(B, S, H, D // H)
        if self.attn_impl == "bf16":
            # Hand-rolled attention that keeps the [B, H, S, S] score/prob
            # tensors in the compute dtype: `jax.nn.dot_product_attention`
            # materializes fp32 logits + fp32 softmax residuals, which at
            # S=213 doubles the attention HBM stream in fwd AND bwd — the
            # dominant non-matmul traffic of the train step (profile r4).
            # exp/normalize still run in fp32 (fused elementwise); with a
            # fp32 model dtype this path is numerically the xla path.
            scale = 1.0 / math.sqrt(D // H)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=self.dtype) * \
                jnp.asarray(scale, self.dtype)
            if self.causal:
                neg = jnp.asarray(jnp.finfo(jnp.float32).min, self.dtype)
                cmask = jnp.tril(jnp.ones((S, S), dtype=bool))[None, None]
                logits = jnp.where(cmask, logits, neg)
            mx = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp((logits - mx).astype(jnp.float32))
            probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        else:
            mask = None
            if self.causal:
                mask = jnp.tril(jnp.ones((S, S), dtype=bool))[None, None]
            out = jax.nn.dot_product_attention(q, k, v, mask=mask,
                                               is_causal=False)
        out = out.reshape(B, S, D)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block with QuickGELU MLP (`model.py:168-196`)."""

    width: int
    heads: int
    causal: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # block LNs stay fp32: running them in bf16 measured NO win
        # (761.8 vs 762.7 samples/s, r4 sweep) — XLA already fuses them
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x).astype(self.dtype)
        x = x + MultiheadAttention(self.width, self.heads, self.causal,
                                   self.dtype, self.attn_impl, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x).astype(self.dtype)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="mlp_c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="mlp_c_proj")(h)
        return x + h


def _remat_body(remat: str):
    """Block used by the tower scans, optionally remat-wrapped.

    'dots' saves every matmul result and recomputes elementwise chains
    (LN, softmax-from-logits, GELU) in backward; 'dots_nb' additionally
    drops batched-dot results (the [B,H,S,S] attention logits), trading a
    QK^T recompute for the lowest residual footprint."""
    if remat == "dots":
        return nn.remat(
            PromptedBlock, policy=jax.checkpoint_policies.dots_saveable)
    if remat == "dots_nb":
        return nn.remat(
            PromptedBlock,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    return PromptedBlock


class PromptedBlock(nn.Module):
    """Scan body: optionally add this layer's prompt at token slots
    [offset, offset+P) before running the block.

    Mirrors (and fixes) the reference's per-layer injection
    (`model.py:187-196`): `x[1:P+1] += prompt_l` gated per layer.
    """

    width: int
    heads: int
    causal: bool = False
    token_offset: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, scan_in):
        prompt_l, gate = scan_in  # [B, P, D], scalar {0,1}
        P = prompt_l.shape[1]
        o = self.token_offset
        patch = x[:, o:o + P] + gate * prompt_l.astype(x.dtype)
        x = jax.lax.dynamic_update_slice_in_dim(x, patch, o, axis=1)
        x = ResidualAttentionBlock(self.width, self.heads, self.causal,
                                   self.dtype, self.attn_impl, name="block")(x)
        return x, None


def _scan_tower(name: str, width: int, heads: int, layers: int, causal: bool,
                dtype, x: jnp.ndarray, prompts: jnp.ndarray, gates: jnp.ndarray,
                attn_impl: str = "xla", remat: str = "none",
                unroll: int = 1):
    """Run `layers` blocks as nn.scan with per-layer prompt injection.

    remat='dots' wraps the block in nn.remat with the `dots_saveable`
    policy: every matmul result is saved, elementwise chains (LayerNorm,
    softmax-from-logits, QuickGELU, casts) are recomputed in backward. On a
    memory-squeezed chip this replaces XLA's forced whole-block
    rematerialization (a full second forward, measured +35 ms on the
    retrieval step at b64 — scripts/diag_backward.py r4) with VPU-only
    recompute."""
    body = _remat_body(remat)
    tower = nn.scan(
        body,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        length=layers,
        in_axes=0,
        unroll=min(unroll, layers),
    )(width=width, heads=heads, causal=causal, dtype=dtype,
      attn_impl=attn_impl, name=name)
    x, _ = tower(x, (prompts, gates))
    return x


def _no_prompts(layers: int, batch: int, width: int, dtype) -> tuple:
    prompts = jnp.zeros((layers, batch, 1, width), dtype)
    gates = jnp.zeros((layers, 1, 1, 1), dtype)
    return prompts, gates


def prepare_layer_prompts(prompt: jnp.ndarray, batch: int, layers: int,
                          injection_depth: int, dtype) -> tuple:
    """Normalize a prompt stack to scan inputs ([L,B,P,D], gates [L,1,1,1]).

    `prompt` is `[Lp, P, D]` (shared across batch) or `[B, Lp, P, D]`
    (per-sample, eval-time task gather). Layer l>=1 receives prompt[l] when
    l < injection_depth; layer 0's prompt is consumed by the caller
    (concat/splice), so gate[0] = 0.
    """
    if prompt.ndim == 3:
        prompt = jnp.broadcast_to(prompt[None], (batch,) + prompt.shape)
    Lp = prompt.shape[1]
    stacked = jnp.moveaxis(prompt, 1, 0).astype(dtype)  # [Lp, B, P, D]
    if Lp < layers:
        pad = jnp.zeros((layers - Lp,) + stacked.shape[1:], dtype)
        stacked = jnp.concatenate([stacked, pad], axis=0)
    else:
        stacked = stacked[:layers]
    layer_ids = np.arange(layers)
    gates = ((layer_ids >= 1) & (layer_ids < injection_depth)).astype(np.float32)
    gates = jnp.asarray(gates, dtype).reshape(layers, 1, 1, 1)
    return stacked, gates


class VisionTransformer(nn.Module):
    """ViT tower with prompt-token concat after CLS (`model.py:227-259`).

    Split into `embed` (patches + CLS + pos) and `encode` (ln_pre -> blocks
    -> pooled projection) so alternative stem modifications — the L2P
    prompt-pool replacement (`model.py:232-233`) — can operate between them.
    """

    cfg: CLIPConfig
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        c = self.cfg
        scale = c.vision_width ** -0.5
        grid = c.image_resolution // c.patch_size
        self.conv1 = nn.Conv(c.vision_width, (c.patch_size, c.patch_size),
                             strides=(c.patch_size, c.patch_size), use_bias=False,
                             dtype=self.dtype, name="conv1")
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(scale), (c.vision_width,))
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(scale),
            (grid * grid + 1, c.vision_width))
        self.ln_pre = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")
        self.tower = nn.scan(
            _remat_body(c.remat),
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.vision_layers,
            in_axes=0,
            unroll=min(c.tower_unroll, c.vision_layers),
        )(width=c.vision_width, heads=c.vision_heads, causal=False,
          dtype=self.dtype, attn_impl=c.attn_impl, name="transformer")
        self.ln_post = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")
        self.proj = self.param("proj", nn.initializers.normal(scale),
                               (c.vision_width, c.embed_dim))

    def embed(self, images: jnp.ndarray) -> jnp.ndarray:
        """images [B, H, W, 3] -> [B, 1+grid^2, width] (CLS + pos applied)."""
        c = self.cfg
        B = images.shape[0]
        grid = c.image_resolution // c.patch_size
        x = self.conv1(images.astype(self.dtype))
        x = x.reshape(B, grid * grid, c.vision_width)
        x = jnp.concatenate(
            [jnp.broadcast_to(self.class_embedding.astype(self.dtype),
                              (B, 1, c.vision_width)), x], axis=1)
        return x + self.positional_embedding.astype(self.dtype)[None]

    def encode(self, x: jnp.ndarray,
               prompt: Optional[jnp.ndarray] = None,
               injection_depth: int = 1) -> jnp.ndarray:
        """Token stream -> pooled features [B, embed_dim] (unnormalized).

        `prompt`: `[Lp, P, Dv]` or `[B, Lp, P, Dv]`; layer-0 slice is
        concatenated after CLS (no positional embedding on prompt tokens),
        deeper slices are added at token slots 1..P+1 when
        `injection_depth > 1`.
        """
        c = self.cfg
        B = x.shape[0]
        if prompt is not None:
            if prompt.ndim == 3:
                p0 = jnp.broadcast_to(prompt[0][None], (B,) + prompt.shape[1:])
            else:
                p0 = prompt[:, 0]
            x = jnp.concatenate([x[:, :1], p0.astype(self.dtype), x[:, 1:]], axis=1)
            prompts, gates = prepare_layer_prompts(
                prompt, B, c.vision_layers, injection_depth, self.dtype)
        else:
            prompts, gates = _no_prompts(c.vision_layers, B, c.vision_width, self.dtype)

        x = self.ln_pre(x).astype(self.dtype)
        x, _ = self.tower(x, (prompts, gates))
        x = self.ln_post(x[:, 0])
        return (x.astype(self.dtype) @ self.proj.astype(self.dtype)).astype(jnp.float32)

    def __call__(self, images: jnp.ndarray,
                 prompt: Optional[jnp.ndarray] = None,
                 injection_depth: int = 1) -> jnp.ndarray:
        return self.encode(self.embed(images), prompt, injection_depth)


class TextTransformer(nn.Module):
    """Causal text tower with EOT pooling (`model.py:343-361`,
    `prompt_learner.py:43-63`).

    The caller supplies token *embeddings* (so CoOp-ctx / textual-prompt
    splicing happens outside, on-device, in the data-to-embedding step) plus
    the token ids for EOT pooling.
    """

    cfg: CLIPConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, token_embeddings: jnp.ndarray, token_ids: jnp.ndarray,
                 prompt: Optional[jnp.ndarray] = None,
                 injection_depth: int = 1) -> jnp.ndarray:
        c = self.cfg
        B, S, D = token_embeddings.shape
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01), (c.context_length, D))
        x = token_embeddings.astype(self.dtype) + pos[:S].astype(self.dtype)[None]

        if prompt is not None:
            prompts, gates = prepare_layer_prompts(
                prompt, B, c.text_layers, injection_depth, self.dtype)
        else:
            prompts, gates = _no_prompts(c.text_layers, B, D, self.dtype)

        x = _scan_tower("transformer", c.text_width, c.text_heads,
                        c.text_layers, True, self.dtype, x, prompts, gates,
                        attn_impl=c.attn_impl, remat=c.remat,
                        unroll=c.tower_unroll)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)

        eot = jnp.argmax(token_ids, axis=-1)  # EOT has the largest token id
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param("text_projection",
                          nn.initializers.normal(c.text_width ** -0.5),
                          (c.text_width, c.embed_dim))
        return (pooled.astype(self.dtype) @ proj.astype(self.dtype)).astype(jnp.float32)


class CLIP(nn.Module):
    """Dual encoder: vision + text towers + token embedding + logit scale."""

    cfg: CLIPConfig
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        c = self.cfg
        self.visual = VisionTransformer(c, self.dtype)
        self.text = TextTransformer(c, self.dtype)
        self.token_embedding = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (c.vocab_size, c.text_width))
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(c.logit_scale_init), ())

    def embed_tokens(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(self.token_embedding, token_ids, axis=0, mode="clip")

    def encode_image(self, images, prompt=None, injection_depth: int = 1):
        feats = self.visual(images, prompt, injection_depth)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def encode_text(self, token_ids, ctx=None, prompt=None, injection_depth: int = 1):
        """token_ids [B, 77]; `ctx` [P, D] or [B, P, D] replaces embedding
        slots 1..P+1 (the CoOp splice, `prompt_learner.py:152-163`)."""
        emb = self.embed_tokens(token_ids)
        if ctx is not None:
            if ctx.ndim == 2:
                ctx = jnp.broadcast_to(ctx[None], (emb.shape[0],) + ctx.shape)
            emb = jax.lax.dynamic_update_slice_in_dim(
                emb, ctx.astype(emb.dtype), 1, axis=1)
        feats = self.text(emb, token_ids, prompt, injection_depth)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def __call__(self, images, token_ids, visual_prompt=None, textual_ctx=None,
                 textual_prompt=None, injection_depth: int = 1):
        img = self.encode_image(images, visual_prompt, injection_depth)
        txt = self.encode_text(token_ids, textual_ctx, textual_prompt, injection_depth)
        return img, txt, jnp.exp(self.logit_scale)

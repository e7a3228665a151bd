"""BERT-base encoder pieces (GLIP's language tower) in Flax, layer-steppable.

Implements the HF BERT semantics the reference's forked `modeling_bert.py`
inherits (post-LayerNorm residual blocks, learned position + token-type
embeddings), exposing `BertLayer` individually so the fused dual-tower
encoder can interleave them with Swin blocks (SURVEY §2.2 G3).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lpi_tpu.core.config import BertConfig


class BertEmbeddings(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        we = self.param("word_embeddings", nn.initializers.normal(0.02),
                        (c.vocab_size, c.hidden_size))
        pe = self.param("position_embeddings", nn.initializers.normal(0.02),
                        (c.max_position_embeddings, c.hidden_size))
        te = self.param("token_type_embeddings", nn.initializers.normal(0.02),
                        (2, c.hidden_size))
        S = input_ids.shape[1]
        # clip: out-of-range ids must not poison the batch (jnp.take's
        # default out-of-bounds fill is NaN under jit)
        x = jnp.take(we, input_ids, axis=0, mode="clip") + pe[None, :S] + te[0][None, None]
        return nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="norm")(x).astype(self.dtype)


class BertSelfAttention(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attention_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        c = self.cfg
        B, S, D = x.shape
        H = c.num_heads
        q = nn.Dense(D, dtype=self.dtype, name="query")(x).reshape(B, S, H, D // H)
        k = nn.Dense(D, dtype=self.dtype, name="key")(x).reshape(B, S, H, D // H)
        v = nn.Dense(D, dtype=self.dtype, name="value")(x).reshape(B, S, H, D // H)
        bias = None
        if attention_mask is not None:
            # [B, S] 1/0 -> additive [B, 1, 1, S]
            bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -10000.0
        out = jax.nn.dot_product_attention(q, k, v, bias=bias)
        return out.reshape(B, S, D)


class BertLayer(nn.Module):
    """Post-LN transformer layer (HF BertLayer semantics)."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attention_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        c = self.cfg
        D = c.hidden_size
        attn = BertSelfAttention(c, self.dtype, name="attention")(x, attention_mask)
        attn = nn.Dense(D, dtype=self.dtype, name="attention_output")(attn)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                         name="attention_norm")(x + attn).astype(self.dtype)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(D, dtype=self.dtype, name="output")(h)
        return nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                            name="output_norm")(x + h).astype(self.dtype)

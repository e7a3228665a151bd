"""The fused dual-tower encoder — LPI's core grounding mechanism.

TPU-native re-design of the reference's forked `BertEncoder.forward`
(`maskrcnn_benchmark/modeling/bert/modeling_bert.py:664-883`), which inlines
the whole Swin forward inside BERT and runs ONE global block counter `i`
over Swin-T's 12 blocks (stages 2+2+6+2) in lockstep with BERT's 12 layers.
Per block, in order:

  (a) visual prompt injection (i < prompt_depth): the layer-i prompt
      [16, 96] is reinterpreted at the current stage width C as 16*96/C
      tokens in an ~square patch (4x4 @ 96, 2x4 @ 192, 2x2 @ 384, 1x2 @ 768)
      and added (replaced for maple) into the top-left corner of the feature
      map (`modeling_bert.py:744-763`);
  (b) textual prompt injection: added into BERT hidden positions 0..15
      (`:767-772`);
  (c) cross-modal interaction (0 < i < interact_depth): the 16 corner tokens
      and 16 text tokens pass through the task's InteractModule — a low-rank
      CP-factorized affine both ways, residual blend a=0.1 + LayerNorm
      (`:557-651, :776-819`);
  (d) the Swin block, then (e) the BERT layer.

Known reference quirk NOT reproduced: the interact write-back there reshapes
with (W, H) swapped vs the read (`modeling_bert.py:813-814`), scrambling the
corner when H != W; here read and write use the same (H, W) layout
(SURVEY §5 latent-bug list).

The whole schedule is one jitted trace with static shapes; stage geometry
(token counts, corner sizes, window masks) is resolved at trace time.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lpi_tpu.core.config import BertConfig, LPIPromptConfig, SwinConfig
from lpi_tpu.models.glip.bert import BertEmbeddings, BertLayer
from lpi_tpu.models.glip.swin import SwinTransformer


def _kaiming_uniform(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)
    return lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound)


class InteractModulePool(nn.Module):
    """Task-indexed pool of low-rank cross-modal interaction modules.

    Reference: `InteractModule` (`modeling_bert.py:557-651`) — per direction
    a CP-factorized stack of per-layer affine maps
    `M = mean_r(d1[L,r] ⊙ d2[Din+1,r] ⊙ d3[Dout,r])`, applied as
    `y = x @ M[l][:Din] + M[l][Din:]`, blended `(1-a)x + a y` with a = 0.1
    and LayerNorm'd. One module per task (`interactModuleList`, indexed by
    task id, `:661,:799`) — here one pool with a leading [num_tasks] axis.
    """

    num_tasks: int
    layer_num: int = 12
    visual_dim: int = 96
    textual_dim: int = 768
    rank: int = 4
    alpha: float = 0.1

    def setup(self):
        T, L, r = self.num_tasks, self.layer_num, self.rank
        Dv, Dt = self.visual_dim, self.textual_dim
        ini = _kaiming_uniform(r)
        self.d1_v2t = self.param("d1_v2t", ini, (T, L, r))
        self.d2_v2t = self.param("d2_v2t", ini, (T, Dv + 1, r))
        self.d3_v2t = self.param("d3_v2t", ini, (T, Dt, r))
        self.d1_t2v = self.param("d1_t2v", ini, (T, L, r))
        self.d2_t2v = self.param("d2_t2v", ini, (T, Dt + 1, r))
        self.d3_t2v = self.param("d3_t2v", ini, (T, Dv, r))
        self.visual_norm_scale = self.param("visual_norm_scale",
                                            nn.initializers.ones, (T, Dv))
        self.visual_norm_bias = self.param("visual_norm_bias",
                                           nn.initializers.zeros, (T, Dv))
        self.textual_norm_scale = self.param("textual_norm_scale",
                                             nn.initializers.ones, (T, Dt))
        self.textual_norm_bias = self.param("textual_norm_bias",
                                            nn.initializers.zeros, (T, Dt))

    @staticmethod
    def _layer_map(d1, d2, d3, task_id, layer_id, rank):
        """Affine map for one (task, layer): [Din+1, Dout]."""
        a = jnp.take(d1, task_id, axis=0)[layer_id]  # [r]
        b = jnp.take(d2, task_id, axis=0)  # [Din+1, r]
        c = jnp.take(d3, task_id, axis=0)  # [Dout, r]
        return jnp.einsum("r,dr,er->de", a, b, c) / rank

    @staticmethod
    def _ln(x, scale, bias, eps=1e-5):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias

    def __call__(self, task_id, visual16: jnp.ndarray, textual16: jnp.ndarray,
                 layer_id: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """visual16 [B, P, Dv], textual16 [B, P, Dt] -> updated pair."""
        Dv, Dt = self.visual_dim, self.textual_dim
        f32 = jnp.float32
        v = visual16.astype(f32)
        t = textual16.astype(f32)
        m_v2t = self._layer_map(self.d1_v2t, self.d2_v2t, self.d3_v2t,
                                task_id, layer_id, self.rank)
        new_t = v @ m_v2t[:Dv] + m_v2t[Dv:]
        m_t2v = self._layer_map(self.d1_t2v, self.d2_t2v, self.d3_t2v,
                                task_id, layer_id, self.rank)
        new_v = t @ m_t2v[:Dt] + m_t2v[Dt:]
        a = self.alpha
        vs = jnp.take(self.visual_norm_scale, task_id, axis=0)
        vb = jnp.take(self.visual_norm_bias, task_id, axis=0)
        ts = jnp.take(self.textual_norm_scale, task_id, axis=0)
        tb = jnp.take(self.textual_norm_bias, task_id, axis=0)
        v_out = self._ln((1 - a) * v + a * new_v, vs, vb)
        t_out = self._ln((1 - a) * t + a * new_t, ts, tb)
        return v_out.astype(visual16.dtype), t_out.astype(textual16.dtype)


def _corner_geometry(prompt_tokens: int, prompt_dim: int, stage_dim: int):
    """Token count + corner (h, w) for a prompt reinterpreted at stage width
    (`modeling_bert.py:750-760`): n = P*Dp/C, h = int(sqrt(n)), w = n // h."""
    n = prompt_tokens * prompt_dim // stage_dim
    h = int(math.sqrt(n))
    w = n // h
    return n, h, w


class FusedDualEncoder(nn.Module):
    """Swin-T + BERT-base run in lockstep with prompt injection + interaction."""

    swin_cfg: SwinConfig
    bert_cfg: BertConfig
    lpi_cfg: LPIPromptConfig
    num_tasks: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        s = self.swin_cfg
        self.swin = SwinTransformer(
            patch_size=s.patch_size, embed_dim=s.embed_dim, depths=s.depths,
            num_heads=s.num_heads, window_size=s.window_size,
            mlp_ratio=s.mlp_ratio, out_stages=(2, 3, 4, 5), dtype=self.dtype)
        self.embeddings = BertEmbeddings(self.bert_cfg, self.dtype)
        self.bert_layers = [
            BertLayer(self.bert_cfg, self.dtype, name=f"layer{i}")
            for i in range(self.bert_cfg.num_layers)
        ]
        if self.lpi_cfg.interact:
            self.interact = InteractModulePool(
                num_tasks=self.num_tasks,
                layer_num=self.bert_cfg.num_layers,
                visual_dim=self.swin_cfg.embed_dim,
                textual_dim=self.bert_cfg.hidden_size,
                rank=self.lpi_cfg.interact_rank)

    def __call__(
        self,
        images: jnp.ndarray,  # [B, H, W, 3]
        input_ids: jnp.ndarray,  # [B, S]
        attention_mask: jnp.ndarray,  # [B, S]
        visual_prompt: Optional[jnp.ndarray] = None,  # [L,P,96] or [B,L,P,96]
        textual_prompt: Optional[jnp.ndarray] = None,  # [L,P,768] or [B,L,P,768]
        task_id=0,
        num_pooled_layers: int = 1,
    ):
        lpi = self.lpi_cfg
        B = images.shape[0]
        P = lpi.prompt_length
        pv = self.swin_cfg.embed_dim  # prompt visual dim (96)

        def batched(p):
            if p is None:
                return None
            if p.ndim == 3:
                return jnp.broadcast_to(p[None], (B,) + p.shape)
            return p

        visual_prompt = batched(visual_prompt)
        textual_prompt = batched(textual_prompt)

        x, Wh, Ww = self.swin.embed(images)
        hidden = self.embeddings(input_ids)
        hidden_states = []

        maple = lpi.interact_type == "maple"
        i = 0
        outs = []
        for s in range(len(self.swin_cfg.depths)):
            C = self.swin_cfg.embed_dim * (2 ** s)
            for b in range(self.swin_cfg.depths[s]):
                # (a) visual prompt at the stage-width corner
                if visual_prompt is not None and i < lpi.prompt_depth:
                    n, ch, cw = _corner_geometry(P, pv, C)
                    cur = visual_prompt[:, i].reshape(B, n, C).reshape(B, ch, cw, C)
                    xm = x.reshape(B, Wh, Ww, C)
                    corner = cur.astype(xm.dtype) if maple else xm[:, :ch, :cw] + cur.astype(xm.dtype)
                    xm = jax.lax.dynamic_update_slice(xm, corner, (0, 0, 0, 0))
                    x = xm.reshape(B, Wh * Ww, C)
                # (b) textual prompt at token slots 0..P
                if textual_prompt is not None and i < lpi.prompt_depth:
                    tp = textual_prompt[:, i].astype(hidden.dtype)
                    first = tp if maple else hidden[:, :P] + tp
                    hidden = jax.lax.dynamic_update_slice(hidden, first, (0, 0, 0))
                # (c) cross-modal interaction on corner + first-P tokens
                if (lpi.interact and visual_prompt is not None
                        and 0 < i < lpi.interact_depth):
                    n, ch, cw = _corner_geometry(P, pv, C)
                    xm = x.reshape(B, Wh, Ww, C)
                    vis16 = xm[:, :ch, :cw].reshape(B, P, pv)
                    txt16 = hidden[:, :P]
                    vis16, txt16 = self.interact(task_id, vis16, txt16, i)
                    corner = vis16.reshape(B, ch, cw, C).astype(xm.dtype)
                    xm = jax.lax.dynamic_update_slice(xm, corner, (0, 0, 0, 0))
                    x = xm.reshape(B, Wh * Ww, C)
                    hidden = jax.lax.dynamic_update_slice(
                        hidden, txt16.astype(hidden.dtype), (0, 0, 0))
                # (d) Swin block, (e) BERT layer
                x = self.swin.run_block(s, b, x, Wh, Ww)
                hidden = self.bert_layers[i](hidden, attention_mask)
                hidden_states.append(hidden)
                i += 1
            out = self.swin.stage_norm(s, x, Wh, Ww)
            if out is not None:
                outs.append(out)
            if s < len(self.swin_cfg.depths) - 1:
                x, Wh, Ww = self.swin.downsample(s, x, Wh, Ww)

        # language dict features (`prompt/prompt.py:154-193`), including the
        # reference's extra /N division (a no-op at N=1)
        N = num_pooled_layers
        feats = jnp.mean(jnp.stack(hidden_states[-N:], axis=1), axis=1) / N
        mask_f = attention_mask[..., None].astype(feats.dtype)
        embedded = feats * mask_f
        aggregate = embedded.sum(1) / jnp.maximum(
            attention_mask.sum(-1, keepdims=True).astype(feats.dtype), 1.0)
        language = {
            "aggregate": aggregate,
            "embedded": embedded,
            "masks": attention_mask,
            "hidden": hidden_states[-1],
        }
        return language, outs

"""GroundedVLModel — the LPI grounding meta-architecture.

TPU-native equivalent of the reference's modified `GeneralizedVLRCNN`
(`maskrcnn_benchmark/modeling/detector/generalized_vl_rcnn.py:71-513`):
frozen GLIP-T(A) (Swin-T + BERT-base via the fused LPI schedule + FPN +
VLDyHead) with 12-task pools of DecomposedPrompts and InteractModules.

Composition (train path, SURVEY §3.2):
  prompts[task]  ->  FusedDualEncoder (inject + interact)  ->  FPN P3..P7
                 ->  tunable_linear on text embeddings
                 ->  VLDyHead (DyConv tower + dot-product token head)
                 ->  ATSS losses (x0.8) + 0.1 x alignment + 0.1 x task loss

Grounding-flavor auxiliary losses differ from the retrieval half:
alignment uses L2-normalized channel-means scaled by 100
(`generalized_vl_rcnn.py:408-428`) and the inter-task nt_bxent temperature
is 0.01 (`:505`), vs /0.01 scaling and 0.001 in retrieval.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lpi_tpu.core.config import GroundingConfig
from lpi_tpu.losses import clip_loss, task_prompt_loss_masked
from lpi_tpu.models.glip.anchors import concat_anchors
from lpi_tpu.models.glip.fpn import FPN
from lpi_tpu.models.glip.fused import FusedDualEncoder
from lpi_tpu.models.glip.vldyhead import TunableLinear, VLDyHead
from lpi_tpu.prompts.pools import (
    DecomposedPromptPool,
    MaPLePromptPool,
    NormalPromptPool,
)


class GroundedVLModel(nn.Module):
    cfg: GroundingConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        self.encoder = FusedDualEncoder(
            swin_cfg=c.swin, bert_cfg=c.bert, lpi_cfg=c.lpi,
            num_tasks=c.total_tasks, dtype=dtype,
            scan_unroll=c.fused_scan_unroll)
        self.fpn = FPN(out_channels=c.dyhead.channels, use_gn=c.fpn_use_gn,
                       dtype=dtype)
        self.head = VLDyHead(c.dyhead, lang_dim=c.bert.hidden_size,
                             num_anchors=1, dtype=dtype,
                             bert_cfg=c.bert if c.dyhead.early_fuse else None)
        if c.dyhead.add_linear_layer:
            self.tunable_linear = TunableLinear(dim=c.bert.hidden_size)
        # prompt-pool flavor (`generalized_vl_rcnn.py:114-142`): PROMPT_LORA
        # -> DecomposedPrompt; else MaPLe / S-Prompts dense per INTERACT_TYPE
        if c.lpi.prompt_type in ("lpi", "linear"):
            self.prompts = DecomposedPromptPool(
                num_tasks=c.total_tasks, layer_num=c.lpi.prompt_depth,
                prompt_num=c.lpi.prompt_length, visual_dim=c.swin.embed_dim,
                textual_dim=c.bert.hidden_size, rank=c.lpi.prompt_rank)
        elif c.lpi.prompt_type == "maple" or c.lpi.interact_type == "maple":
            self.prompts = MaPLePromptPool(
                num_tasks=c.total_tasks, layer_num=c.lpi.prompt_depth,
                prompt_num=c.lpi.prompt_length, visual_dim=c.swin.embed_dim,
                textual_dim=c.bert.hidden_size)
        elif c.lpi.prompt_type == "sprompts":
            self.prompts = NormalPromptPool(
                num_tasks=c.total_tasks, layer_num=c.lpi.prompt_depth,
                prompt_num=c.lpi.prompt_length, visual_dim=c.swin.embed_dim,
                textual_dim=c.bert.hidden_size)
        else:
            raise ValueError(f"unsupported grounding prompt_type {c.lpi.prompt_type!r}")

    # ------------------------------------------------------------------
    def _head_flat(self, feats, embedded, masks, hidden, B):
        """FPN features + language features -> flat head outputs + anchors."""
        c = self.cfg
        if c.dyhead.add_linear_layer:
            embedded = self.tunable_linear(embedded)
        head_out = self.head(feats, embedded, masks,
                             hidden if c.dyhead.early_fuse else None)
        shapes = tuple((f.shape[1], f.shape[2]) for f in feats)
        anchors_np, counts = concat_anchors(
            shapes, strides=c.atss.anchor_strides, sizes=c.atss.anchor_sizes,
            aspect_ratios=c.atss.aspect_ratios)
        return {
            "bbox_pred": jnp.concatenate(
                [p.reshape(B, -1, 4) for p in head_out["bbox_pred"]], axis=1),
            "centerness": jnp.concatenate(
                [p.reshape(B, -1) for p in head_out["centerness"]], axis=1),
            "dot_logits": jnp.concatenate(head_out["dot_logits"], axis=1),
            "anchors": jnp.asarray(anchors_np),
            "level_counts": counts,
        }

    def _run(self, images, input_ids, attention_mask, vis_p, txt_p, task_id):
        c = self.cfg
        language, outs = self.encoder(images, input_ids, attention_mask,
                                      vis_p, txt_p, task_id,
                                      num_pooled_layers=c.bert.num_pooled_layers)
        feats = self.fpn(outs)
        hidden = language["hidden"] if c.dyhead.early_fuse else None
        flat = self._head_flat(feats, language["embedded"], attention_mask,
                               hidden, images.shape[0])
        return flat, language

    def __call__(self, images, input_ids, attention_mask, task_id=0):
        """Train-path forward with the current task's prompts.

        Returns (head outputs dict, language dict, visual_prompt,
        textual_prompt)."""
        vis_p, txt_p = self.prompts(task_id)
        flat, language = self._run(images, input_ids, attention_mask,
                                   vis_p, txt_p, task_id)
        return flat, language, vis_p, txt_p

    def forward_tasks(self, images, input_ids, attention_mask, task_ids):
        """Eval-path forward: per-sample prompts gathered by inferred task
        ids; the interact module follows the first sample's task
        (`generalized_vl_rcnn.py:269-278` + `modeling_bert.py:799` behavior)."""
        vis_all, txt_all = self.prompts.all_prompts()
        vis_b = jnp.take(vis_all, task_ids, axis=0)
        txt_b = jnp.take(txt_all, task_ids, axis=0)
        flat, language = self._run(images, input_ids, attention_mask,
                                   vis_b, txt_b, task_ids[0])
        return flat, language

    def forward_knowledge(self, images, class_input_ids, class_attention_mask,
                          agg_type: str = "first"):
        """GLIPKNOW parallel-language detection forward
        (`generalized_vl_rcnn.py:516-660`, PARALLEL_LANGUAGE_INPUT).

        `class_input_ids`/`class_attention_mask` [N_cls+1, L] tokenize the
        knowledge-augmented per-class captions (last row = the empty [NoObj]
        caption, `:599-600`); they are encoded ONCE — not per image — and
        aggregated to one vector per class ('first' = CLS token, 'mean' =
        mask-weighted mean, `:588-601`). The class axis then plays the token
        axis in the dot-product head, with the [NoObj] slot masked out of
        the attention mask (`:653-658`).

        The promptless fused encoder IS a plain BERT pass for the language
        stream: injection and interaction are statically gated off without
        prompts, so no visual information leaks into the caption encodings
        (the dummy image batch only satisfies the lockstep signature).
        """
        c = self.cfg
        N = class_input_ids.shape[0]
        B = images.shape[0]
        Dt = c.bert.hidden_size
        dummy_img = jnp.zeros((N, 64, 64, 3), images.dtype)
        lang, _ = self.encoder(dummy_img, class_input_ids,
                               class_attention_mask, None, None, 0,
                               num_pooled_layers=c.bert.num_pooled_layers)
        if agg_type == "first":
            agg_emb = lang["embedded"][:, 0]
            agg_hid = lang["hidden"][:, 0]
        elif agg_type == "mean":
            m = class_attention_mask[..., None].astype(lang["hidden"].dtype)
            denom = jnp.maximum(m.sum(1), 1.0)
            agg_emb = lang["aggregate"]  # already the masked mean of embedded
            agg_hid = (lang["hidden"] * m).sum(1) / denom
        else:
            raise ValueError(
                f"unsupported lan_feature_agg_type {agg_type!r}")

        embedded = jnp.broadcast_to(agg_emb[None], (B, N, Dt))
        hidden = jnp.broadcast_to(agg_hid[None], (B, N, Dt))
        masks = jnp.ones((B, N), class_attention_mask.dtype)
        masks = masks.at[:, -1].set(0)  # [NoObj] masked out (`:653-658`)

        dummy_ids = jnp.zeros((B, 4), jnp.int32)
        dummy_mask = jnp.ones((B, 4))
        _, outs = self.encoder(images, dummy_ids, dummy_mask, None, None, 0)
        feats = self.fpn(outs)
        flat = self._head_flat(feats, embedded, masks, hidden, B)
        language = {"aggregate": None, "embedded": embedded,
                    "masks": masks, "hidden": hidden}
        return flat, language

    def extract_features(self, images) -> jnp.ndarray:
        """Frozen-backbone features for task-key clustering
        (`generalized_vl_rcnn.py:446-472`): promptless forward, last FPN
        level (P7) flattened and L2-normalized."""
        dummy_ids = jnp.zeros((images.shape[0], 4), jnp.int32)
        dummy_mask = jnp.ones((images.shape[0], 4))
        _, outs = self.encoder(images, dummy_ids, dummy_mask, None, None, 0)
        feats = self.fpn(outs)
        last = feats[-1]
        flat = last.reshape(last.shape[0], -1).astype(jnp.float32)
        return flat * jax.lax.rsqrt(jnp.sum(flat * flat, -1, keepdims=True) + 1e-12)

    def all_task_prompts(self):
        return self.prompts.all_prompts()


def grounding_aux_losses(vis_p: jnp.ndarray, txt_p: jnp.ndarray,
                         vis_all: jnp.ndarray, txt_all: jnp.ndarray,
                         task_id, task_relation: jnp.ndarray,
                         cfg: GroundingConfig) -> dict:
    """Alignment + inter-task losses, grounding flavor
    (`generalized_vl_rcnn.py:400-513`). `task_id` may be traced — the
    inter-task loss masks to tasks 0..task_id and vanishes at task 0, so one
    compiled train step serves every session."""
    losses = {}
    lpi = cfg.lpi
    if lpi.layer_alignment:
        v = jnp.mean(vis_p.astype(jnp.float32), -1)
        t = jnp.mean(txt_p.astype(jnp.float32), -1)
        v = v * jax.lax.rsqrt(jnp.sum(v * v, -1, keepdims=True) + 1e-12)
        t = t * jax.lax.rsqrt(jnp.sum(t * t, -1, keepdims=True) + 1e-12)
        losses["alignment_loss"] = 0.1 * clip_loss(100.0 * v @ t.T)
    if lpi.task_alignment:
        T = vis_all.shape[0]
        losses["task_loss"] = 0.1 * task_prompt_loss_masked(
            vis_all.reshape(T, -1), txt_all.reshape(T, -1),
            task_relation, task_id, 0.01)
    return losses

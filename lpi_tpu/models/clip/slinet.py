"""SliNet: the prompted CLIP dual encoder with task-wise pools.

TPU-native equivalent of the reference's `retrieval/models/slinet.py`:
frozen CLIP ViT-B/16 + a DecomposedPrompt pool (one CP-factorized prompt per
continual task) + a CoOp-context pool (one learnable ctx per task,
`slinet.py:51-54`). Differences by design:

* Task pools are arrays with a leading [num_tasks] axis; selecting a task is
  a gather (see `lpi_tpu.prompts.pools`).
* Eval-time per-sample task selection (`visual_interface`/`textual_interface`,
  `slinet.py:185-220`) is a batched gather + one forward — no Python loop.
* Tokenization happens in the data pipeline; forward takes token ids.
* Loss assembly lives in `lpi_tpu.continual.learner` as a pure function.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from lpi_tpu.core.config import RetrievalConfig
from lpi_tpu.models.clip.model import CLIP
from lpi_tpu.prompts.pools import DecomposedPromptPool, L2pPrompt, NormalPromptPool


class SliNet(nn.Module):
    """Prompted CLIP with task-indexed prompt + context pools."""

    cfg: RetrievalConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        self.clip = CLIP(c.clip, dtype)
        lpi = c.lpi
        if lpi.prompt_type == "lpi":
            self.prompts = DecomposedPromptPool(
                num_tasks=c.total_sessions, layer_num=lpi.prompt_depth,
                prompt_num=lpi.prompt_length, visual_dim=c.visual_dim,
                textual_dim=c.textual_dim, rank=lpi.prompt_rank)
        elif lpi.prompt_type == "sprompts":
            self.prompts = NormalPromptPool(
                num_tasks=c.total_sessions, layer_num=1,
                prompt_num=lpi.prompt_length, visual_dim=c.visual_dim,
                textual_dim=c.textual_dim)
        elif lpi.prompt_type == "clip":
            # zero-shot CLIP baseline: no prompt pool at all
            # (`_evaluate_retrieval` clip branch, sprompt.py:460-483)
            self.prompts = None
        elif lpi.prompt_type == "l2p":
            # L2P baseline (`slinet.py:41-43`): one shared prompt pool with
            # key matching, injected by replacing leading patch tokens. The
            # reference instantiates it at embed_dim=96 (incompatible with
            # its own ViT width — a broken baseline config); here the pool
            # lives at the vision width so the path actually runs.
            self.prompts = L2pPrompt(pool_size=c.total_sessions,
                                     length=lpi.l2p_length,
                                     embed_dim=c.visual_dim,
                                     top_k=lpi.l2p_top_k,
                                     batchwise_prompt=True)
        else:
            raise ValueError(f"unsupported prompt_type {lpi.prompt_type!r}")
        # CoOp context pool (classifier_pool, slinet.py:51-54). Unused when a
        # textual prompt overrides ctx, but kept for the sprompts/no-prompt
        # paths and checkpoint parity.
        self.ctx_pool = self.param(
            "ctx_pool", nn.initializers.normal(0.02),
            (c.total_sessions, c.clip.n_ctx, c.clip.text_width))

    # ---- prompt access -------------------------------------------------
    def task_prompts(self, task_id) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.prompts(task_id)

    def all_task_prompts(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.prompts.all_prompts()

    # ---- training forward ---------------------------------------------
    def __call__(self, images, token_ids, task_id):
        """Train-path forward for one session.

        Returns (image_features, text_features, visual_prompt,
        textual_prompt, logit_scale); features are L2-normalized, prompts are
        the composed `[L, P, D]` stacks used by the alignment loss (zeros +
        aux reduce_sim for the l2p baseline).
        """
        if self.cfg.lpi.prompt_type == "clip":
            img = self.clip.encode_image(images)
            txt = self.clip.encode_text(token_ids)
            zeros_v = jnp.zeros((1, 1, self.cfg.visual_dim))
            zeros_t = jnp.zeros((1, 1, self.cfg.textual_dim))
            return img, txt, zeros_v, zeros_t, jnp.exp(self.clip.logit_scale)
        if self.cfg.lpi.prompt_type == "l2p":
            img, _ = self.encode_image_l2p(images)
            ctx = jnp.take(self.ctx_pool, task_id, axis=0)
            txt = self.clip.encode_text(token_ids, ctx=ctx)
            zeros_v = jnp.zeros((1, 1, self.cfg.visual_dim))
            zeros_t = jnp.zeros((1, 1, self.cfg.textual_dim))
            return img, txt, zeros_v, zeros_t, jnp.exp(self.clip.logit_scale)
        depth = self.cfg.lpi.injection_depth
        vis_p, txt_p = self.prompts(task_id)
        img = self.clip.encode_image(images, vis_p, depth)
        txt = self.clip.encode_text(token_ids, ctx=txt_p[0], prompt=txt_p,
                                    injection_depth=depth)
        return img, txt, vis_p, txt_p, jnp.exp(self.clip.logit_scale)

    def encode_image_l2p(self, images):
        """L2P path: key-matched pool prompts replace leading patch tokens
        between the patch stem and the transformer (`model.py:232-233`
        behavior made dimension-consistent). Returns (features, reduce_sim)."""
        x = self.clip.visual.embed(images)
        out = self.prompts(x)
        feats = self.clip.visual.encode(out["prompted_embedding"])
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats, out["reduce_sim"]

    # ---- eval-time per-sample task selection ---------------------------
    def encode_image_tasks(self, images, task_ids):
        """Per-sample prompts chosen by inferred task ids
        (`visual_interface`, slinet.py:212-220)."""
        vis_all, _ = self.prompts.all_prompts()
        vis_b = jnp.take(vis_all, task_ids, axis=0)  # [B, L, P, Dv]
        return self.clip.encode_image(images, vis_b, self.cfg.lpi.injection_depth)

    def encode_text_tasks(self, token_ids, task_ids):
        """Per-sample textual prompts — the batched-gather fix for the
        reference's per-sample loop (`textual_interface`, slinet.py:185-210)."""
        _, txt_all = self.prompts.all_prompts()
        txt_b = jnp.take(txt_all, task_ids, axis=0)  # [B, L, P, Dt]
        return self.clip.encode_text(token_ids, ctx=txt_b[:, 0], prompt=txt_b,
                                     injection_depth=self.cfg.lpi.injection_depth)

    # ---- frozen-backbone features (task-key clustering) ----------------
    def extract_visual(self, images):
        return self.clip.encode_image(images, prompt=None)

    def extract_textual(self, token_ids):
        return self.clip.encode_text(token_ids, ctx=None, prompt=None)

    def logit_scale(self):
        return jnp.exp(self.clip.logit_scale)

"""Task-wise prompt pools as single arrays with a leading [num_tasks] axis.

The reference keeps one `nn.Module` per continual task in an `nn.ModuleList`
(`retrieval/models/slinet.py:44-47`) and freezes/unfreezes via requires_grad
(`retrieval/methods/sprompt.py:197-245`). The TPU design stores each factor
as one array with a leading task axis:

* selecting the active task is `jnp.take` (a gather — jit-friendly),
* eval-time per-sample prompt selection is a single batched gather instead of
  the reference's per-sample Python loop (`slinet.py:193-207`),
* "only task t is trainable" is a gradient mask over the leading axis
  (`lpi_tpu.continual.freeze`), not parameter-flag mutation.

Prompt math (DecomposedPrompt, `retrieval/models/prompts/prompts.py:4-57`;
grounding twin at `generalized_vl_rcnn.py:679-748`):

    prompt[l, p, d] = mean_r( d1_share[l, r] * d2[p, r] * d3[d, r] )

with a per-layer factor shared across modalities and separate per-token /
per-channel factors per modality. All factors init ~ N(0, 0.5).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _normal(std: float):
    return nn.initializers.normal(stddev=std)


def compose_cp(d1: jnp.ndarray, d2: jnp.ndarray, d3: jnp.ndarray) -> jnp.ndarray:
    """CP product with mean over the rank dim.

    d1 [..., L, r], d2 [..., P, r], d3 [..., D, r] -> [..., L, P, D].
    Equivalent to the reference's broadcast-multiply + mean
    (`prompts.py:38-57`), expressed as one einsum so XLA lowers it onto the
    MXU when D is large.
    """
    r = d1.shape[-1]
    return jnp.einsum("...lr,...pr,...dr->...lpd", d1, d2, d3) / r


class DecomposedPromptPool(nn.Module):
    """Rank-r CP-factorized prompts for all tasks at once.

    Attributes mirror the reference constructor
    `DecomposedPrompt(layer_num, prompt_num, visual_dim, textual_dim, r)`
    (`slinet.py:46` instantiates layer_num=9, prompt_num=16, 768/512, r=4).
    """

    num_tasks: int
    layer_num: int
    prompt_num: int
    visual_dim: int
    textual_dim: int
    rank: int = 4
    init_std: float = 0.5

    def setup(self):
        T, L, P, r = self.num_tasks, self.layer_num, self.prompt_num, self.rank
        ini = _normal(self.init_std)
        self.d1_share = self.param("d1_share", ini, (T, L, r))
        self.d2_visual = self.param("d2_visual", ini, (T, P, r))
        self.d2_textual = self.param("d2_textual", ini, (T, P, r))
        self.d3_visual = self.param("d3_visual", ini, (T, self.visual_dim, r))
        self.d3_textual = self.param("d3_textual", ini, (T, self.textual_dim, r))

    def __call__(self, task_id) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Prompts for one task: ([L, P, Dv], [L, P, Dt])."""
        d1 = jnp.take(self.d1_share, task_id, axis=0)
        vis = compose_cp(d1, jnp.take(self.d2_visual, task_id, axis=0),
                         jnp.take(self.d3_visual, task_id, axis=0))
        txt = compose_cp(d1, jnp.take(self.d2_textual, task_id, axis=0),
                         jnp.take(self.d3_textual, task_id, axis=0))
        return vis, txt

    def all_prompts(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Full stacks: ([T, L, P, Dv], [T, L, P, Dt])."""
        vis = compose_cp(self.d1_share, self.d2_visual, self.d3_visual)
        txt = compose_cp(self.d1_share, self.d2_textual, self.d3_textual)
        return vis, txt

    def gather(self, task_ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-sample prompts: task_ids [B] -> ([B,L,P,Dv], [B,L,P,Dt]).

        Replaces the reference's eval-time per-sample loop
        (`slinet.py:193-207`) with compose-all + one gather (T is small).
        """
        vis, txt = self.all_prompts()
        return jnp.take(vis, task_ids, axis=0), jnp.take(txt, task_ids, axis=0)


class NormalPromptPool(nn.Module):
    """Dense per-task prompts (the S-Prompts baseline, `prompts.py:60-70`)."""

    num_tasks: int
    layer_num: int
    prompt_num: int
    visual_dim: int
    textual_dim: int
    init_std: float = 0.02

    def setup(self):
        T, L, P = self.num_tasks, self.layer_num, self.prompt_num
        ini = _normal(self.init_std)
        self.visual_prompt = self.param("visual_prompt", ini, (T, L, P, self.visual_dim))
        self.textual_prompt = self.param("textual_prompt", ini, (T, L, P, self.textual_dim))

    def __call__(self, task_id) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return (jnp.take(self.visual_prompt, task_id, axis=0),
                jnp.take(self.textual_prompt, task_id, axis=0))

    def all_prompts(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.visual_prompt, self.textual_prompt

    def gather(self, task_ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return (jnp.take(self.visual_prompt, task_ids, axis=0),
                jnp.take(self.textual_prompt, task_ids, axis=0))


class MaPLePromptPool(nn.Module):
    """MaPLe-style coupled prompts, task-indexed.

    Reference `MaPLePrompt` (`generalized_vl_rcnn.py:753-787`): learned
    textual prompts `[L, P, Dt]` (std 0.02) and per-layer linear projections
    producing the visual prompts `[L, P, Dv]` from them. In maple mode the
    fused encoder REPLACES tokens instead of adding (interact_type='maple').
    """

    num_tasks: int
    layer_num: int
    prompt_num: int
    visual_dim: int
    textual_dim: int

    def setup(self):
        T, L, P = self.num_tasks, self.layer_num, self.prompt_num
        self.textual = self.param("textual", _normal(0.02),
                                  (T, L, P, self.textual_dim))
        bound = 1.0 / (self.textual_dim ** 0.5)
        self.proj_kernel = self.param(
            "proj_kernel",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (T, L, self.textual_dim, self.visual_dim))
        self.proj_bias = self.param(
            "proj_bias",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (T, L, self.visual_dim))

    def _project(self, textual, kernel, bias):
        # [L,P,Dt] @ [L,Dt,Dv] + [L,1,Dv]
        return jnp.einsum("lpt,ltv->lpv", textual, kernel) + bias[:, None, :]

    def __call__(self, task_id) -> Tuple[jnp.ndarray, jnp.ndarray]:
        t = jnp.take(self.textual, task_id, axis=0)
        k = jnp.take(self.proj_kernel, task_id, axis=0)
        b = jnp.take(self.proj_bias, task_id, axis=0)
        return self._project(t, k, b), t

    def all_prompts(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        vis = jnp.einsum("alpt,altv->alpv", self.textual, self.proj_kernel)
        vis = vis + self.proj_bias[:, :, None, :]
        return vis, self.textual

    def gather(self, task_ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        vis, txt = self.all_prompts()
        return jnp.take(vis, task_ids, axis=0), jnp.take(txt, task_ids, axis=0)


class L2pPrompt(nn.Module):
    """L2P prompt pool with key matching (`prompts.py:73-193`).

    Static-shape port: top-k pool selection per sample (batchwise majority
    voting optional), prompts overwrite the first `top_k * length` token
    embeddings, and the pull-constraint `reduce_sim` is returned for the
    loss. The reference's dynamic `torch.unique` voting is reformulated as a
    fixed-size bincount — same selection, static shapes.
    """

    pool_size: int = 12
    length: int = 4
    embed_dim: int = 96
    top_k: int = 4
    batchwise_prompt: bool = True
    embedding_key: str = "mean"

    def setup(self):
        self.prompt = self.param(
            "prompt", lambda k, s: jax.random.uniform(k, s, jnp.float32, -1.0, 1.0),
            (self.pool_size, self.length, self.embed_dim))
        self.prompt_key = self.param(
            "prompt_key", lambda k, s: jax.random.uniform(k, s, jnp.float32, -1.0, 1.0),
            (self.pool_size, self.embed_dim))

    @staticmethod
    def _l2_normalize(x, axis=-1, epsilon=1e-12):
        sq = jnp.sum(x * x, axis=axis, keepdims=True)
        return x * jax.lax.rsqrt(jnp.maximum(sq, epsilon))

    def __call__(self, x_embed: jnp.ndarray):
        """x_embed [B, N, D] -> dict with prompted_embedding, reduce_sim, idx."""
        if self.embedding_key == "mean":
            feat = jnp.mean(x_embed, axis=1)
        elif self.embedding_key == "max":
            feat = jnp.max(x_embed, axis=1)
        elif self.embedding_key == "mean_max":
            feat = jnp.max(x_embed, axis=1) + 2.0 * jnp.mean(x_embed, axis=1)
        else:
            raise NotImplementedError(self.embedding_key)

        key_norm = self._l2_normalize(self.prompt_key, axis=1)  # [S, D]
        feat_norm = self._l2_normalize(feat, axis=1)  # [B, D]
        similarity = feat_norm @ key_norm.T  # [B, S]
        top_k = min(self.top_k, self.pool_size)
        _, idx = jax.lax.top_k(similarity, top_k)  # [B, top_k]

        if self.batchwise_prompt:
            counts = jnp.bincount(idx.reshape(-1), length=self.pool_size)
            _, major = jax.lax.top_k(counts, top_k)  # [top_k]
            idx = jnp.broadcast_to(major[None, :], (x_embed.shape[0], top_k))

        batched = jnp.take(self.prompt, idx, axis=0)  # [B, top_k, length, D]
        b = batched.reshape(x_embed.shape[0], top_k * self.length, self.embed_dim)

        selected_key = jnp.take(key_norm, idx, axis=0)  # [B, top_k, D]
        reduce_sim = jnp.sum(selected_key * feat_norm[:, None, :]) / x_embed.shape[0]

        total_len = top_k * self.length
        prompted = x_embed.at[:, :total_len].set(b.astype(x_embed.dtype))
        return {
            "prompted_embedding": prompted,
            "prompt_idx": idx,
            "similarity": similarity,
            "reduce_sim": reduce_sim,
            "total_prompt_len": total_len,
        }


def build_prompt_pool(prompt_type: str, num_tasks: int, layer_num: int,
                      prompt_num: int, visual_dim: int, textual_dim: int,
                      rank: int = 4) -> nn.Module:
    """Factory mirroring the reference's prompt_type switch (`slinet.py:32-47`)."""
    if prompt_type == "lpi":
        return DecomposedPromptPool(
            num_tasks=num_tasks, layer_num=layer_num, prompt_num=prompt_num,
            visual_dim=visual_dim, textual_dim=textual_dim, rank=rank)
    if prompt_type == "sprompts":
        return NormalPromptPool(
            num_tasks=num_tasks, layer_num=1, prompt_num=prompt_num,
            visual_dim=visual_dim, textual_dim=textual_dim)
    if prompt_type == "l2p":
        return L2pPrompt(pool_size=num_tasks, embed_dim=visual_dim)
    raise ValueError(f"unknown prompt_type {prompt_type!r}")

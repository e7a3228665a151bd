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

TPU-first structure: each stage's (no-shift, shift) block pairs are run
under ONE `nn.scan` (`FusedPair` with a leading [n_pairs] parameter axis),
so the compiled program contains each stage's pair body once instead of
unrolling all 12 blocks — stage 3's six blocks fold 3x. Per-layer prompt
slices, interaction maps, and depth masks ride the scan as `xs`; the
"inject only below prompt_depth / interact only in (0, interact_depth)"
conditions become masked selects inside the scan body. The whole schedule
stays one jitted trace with static shapes; stage geometry (token counts,
corner sizes, window masks) is resolved at trace time.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lpi_tpu.core.config import BertConfig, LPIPromptConfig, SwinConfig
from lpi_tpu.models.glip.bert import BertEmbeddings, BertLayer
from lpi_tpu.models.glip.swin import SwinBlock, SwinTransformer


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

    def layer_maps(self, task_id):
        """All layers' affine maps + LN params for one task — the form the
        scanned fused schedule consumes as per-step `xs`.

        -> (m_v2t [L, Dv+1, Dt], m_t2v [L, Dt+1, Dv],
            (vis_scale, vis_bias, txt_scale, txt_bias))."""
        d1v = jnp.take(self.d1_v2t, task_id, axis=0)
        m_v2t = jnp.einsum("lr,dr,er->lde", d1v,
                           jnp.take(self.d2_v2t, task_id, axis=0),
                           jnp.take(self.d3_v2t, task_id, axis=0)) / self.rank
        d1t = jnp.take(self.d1_t2v, task_id, axis=0)
        m_t2v = jnp.einsum("lr,dr,er->lde", d1t,
                           jnp.take(self.d2_t2v, task_id, axis=0),
                           jnp.take(self.d3_t2v, task_id, axis=0)) / self.rank
        ln = (jnp.take(self.visual_norm_scale, task_id, axis=0),
              jnp.take(self.visual_norm_bias, task_id, axis=0),
              jnp.take(self.textual_norm_scale, task_id, axis=0),
              jnp.take(self.textual_norm_bias, task_id, axis=0))
        return m_v2t, m_t2v, ln

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
    if n == 0:  # prompt payload narrower than the stage width: no injection
        return 0, 0, 0
    h = int(math.sqrt(n))
    w = n // h
    return h * w, h, w


class FusedPair(nn.Module):
    """Scan body: one (no-shift, shift) Swin block pair + two BERT layers,
    with prompt injection and masked cross-modal interaction before each.

    Scanned with `variable_axes={"params": 0}` so all its parameters carry a
    leading [n_pairs] axis; per-layer inputs arrive stacked [2, ...] in `xs`.
    """

    dim: int  # stage width C
    num_heads: int
    window_size: int
    mlp_ratio: float
    bert_cfg: BertConfig
    grid: Tuple[int, int]  # static (H, W) token grid of this stage
    corner: Tuple[int, int, int]  # (n, ch, cw) corner geometry
    prompt_len: int
    prompt_vdim: int  # 96
    maple: bool
    active: bool = True  # statically False when no layer of this stage
    #                      injects or interacts (or the prompt payload does
    #                      not fit the stage width) — skips (a)-(c) entirely
    alpha: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, xs, consts):
        x, hidden = carry
        attention_mask, (vis_s, vis_b, txt_s, txt_b) = consts
        H, W = self.grid
        n, ch, cw = self.corner
        P, pv = self.prompt_len, self.prompt_vdim
        C = self.dim
        Dt = self.bert_cfg.hidden_size
        B = x.shape[0]

        ys = []
        for j in range(2):
            if self.active:
                vis_p = xs["vis"][j]  # [B, P, pv]
                txt_p = xs["txt"][j]  # [B, P, Dt]
                inject_m = xs["inject"][j]  # scalar 0/1
                inter_m = xs["interact"][j]  # scalar 0/1
                m_v2t = xs["m_v2t"][j]  # [pv+1, Dt]
                m_t2v = xs["m_t2v"][j]  # [Dt+1, pv]

                # (a) visual prompt at the stage-width corner
                xm = x.reshape(B, H, W, C)
                cur = vis_p.reshape(B, -1)[:, :n * C].reshape(
                    B, ch, cw, C).astype(jnp.float32)
                old = xm[:, :ch, :cw].astype(jnp.float32)
                injected = cur if self.maple else old + cur
                corner = jnp.where(inject_m > 0, injected, old)
                # (b) textual prompt at token slots 0..P
                tfirst = hidden[:, :P].astype(jnp.float32)
                t_injected = txt_p.astype(jnp.float32) if self.maple \
                    else tfirst + txt_p.astype(jnp.float32)
                tfirst = jnp.where(inject_m > 0, t_injected, tfirst)

                # (c) cross-modal interaction on corner + first-P tokens
                v16 = corner.reshape(B, P, pv)
                new_t = v16 @ m_v2t[:pv] + m_v2t[pv:]
                new_v = tfirst @ m_t2v[:Dt] + m_t2v[Dt:]
                a = self.alpha
                v2 = InteractModulePool._ln((1 - a) * v16 + a * new_v, vis_s, vis_b)
                t2 = InteractModulePool._ln((1 - a) * tfirst + a * new_t, txt_s, txt_b)
                v16 = jnp.where(inter_m > 0, v2, v16)
                tfirst = jnp.where(inter_m > 0, t2, tfirst)

                xm = jax.lax.dynamic_update_slice(
                    xm, v16.reshape(B, ch, cw, C).astype(xm.dtype), (0, 0, 0, 0))
                x = xm.reshape(B, H * W, C)
                hidden = jax.lax.dynamic_update_slice(
                    hidden, tfirst.astype(hidden.dtype), (0, 0, 0))

            # (d) Swin block, (e) BERT layer
            x = SwinBlock(dim=C, num_heads=self.num_heads,
                          window_size=self.window_size,
                          shift=0 if j == 0 else self.window_size // 2,
                          mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                          name=f"vblock{j}")(x, H, W)
            hidden = BertLayer(self.bert_cfg, self.dtype,
                               name=f"tlayer{j}")(hidden, attention_mask)
            ys.append(hidden)
        return (x, hidden), jnp.stack(ys)


class FusedDualEncoder(nn.Module):
    """Swin-T + BERT-base run in lockstep with prompt injection + interaction."""

    swin_cfg: SwinConfig
    bert_cfg: BertConfig
    lpi_cfg: LPIPromptConfig
    num_tasks: int
    dtype: jnp.dtype = jnp.float32
    scan_unroll: int = 1  # lax.scan unroll factor: 1 = smallest program
    #                       (parity-scale TPU compiles); >= n_pairs = fully
    #                       unrolled body (fastest small-shape CPU compiles).
    #                       The stacked param layout is identical either way.

    def setup(self):
        s = self.swin_cfg
        if any(d % 2 for d in s.depths):
            raise ValueError(f"fused schedule needs even stage depths, got {s.depths}")
        if sum(s.depths) != self.bert_cfg.num_layers:
            raise ValueError(
                f"fused schedule needs sum(swin depths) == bert layers: "
                f"{sum(s.depths)} vs {self.bert_cfg.num_layers}")
        # patch embed / downsample / per-stage out-norms only; the blocks
        # live in the scanned FusedPair stacks below
        self.swin = SwinTransformer(
            patch_size=s.patch_size, embed_dim=s.embed_dim, depths=s.depths,
            num_heads=s.num_heads, window_size=s.window_size,
            mlp_ratio=s.mlp_ratio, out_stages=(2, 3, 4, 5), with_blocks=False,
            dtype=self.dtype)
        self.embeddings = BertEmbeddings(self.bert_cfg, self.dtype)
        if self.lpi_cfg.interact:
            self.interact = InteractModulePool(
                num_tasks=self.num_tasks,
                layer_num=self.bert_cfg.num_layers,
                visual_dim=self.swin_cfg.embed_dim,
                textual_dim=self.bert_cfg.hidden_size,
                rank=self.lpi_cfg.interact_rank)

    @nn.compact
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
        Dt = self.bert_cfg.hidden_size
        L_total = self.bert_cfg.num_layers
        have_prompts = visual_prompt is not None
        # A single inject mask covers both modalities; supplying only one
        # prompt would zero-pad the other and (in maple replace-mode)
        # overwrite real activations with zeros. Require both or neither.
        if have_prompts != (textual_prompt is not None):
            raise ValueError(
                "visual_prompt and textual_prompt must be provided together "
                "(got visual=%s, textual=%s)" % (
                    visual_prompt is not None, textual_prompt is not None))

        def batched_padded(p, dim):
            """-> [B, L_total, P, dim] (zeros when absent / beyond depth)."""
            if p is None:
                return jnp.zeros((B, L_total, P, dim), jnp.float32)
            if p.ndim == 3:
                p = jnp.broadcast_to(p[None], (B,) + p.shape)
            pad = L_total - p.shape[1]
            if pad > 0:
                p = jnp.concatenate(
                    [p, jnp.zeros((B, pad) + p.shape[2:], p.dtype)], axis=1)
            return p.astype(jnp.float32)

        vis_pad = batched_padded(visual_prompt, pv)
        txt_pad = batched_padded(textual_prompt, Dt)

        # static per-layer masks: inject for i < prompt_depth, interact for
        # 0 < i < interact_depth (`modeling_bert.py:744,776`)
        li = np.arange(L_total)
        inject_mask = ((li < lpi.prompt_depth) & have_prompts).astype(np.float32)
        inter_mask = ((li > 0) & (li < lpi.interact_depth)
                      & bool(lpi.interact) & have_prompts).astype(np.float32)

        if lpi.interact:
            m_v2t, m_t2v, ln = self.interact.layer_maps(task_id)
        else:
            m_v2t = jnp.zeros((L_total, pv + 1, Dt), jnp.float32)
            m_t2v = jnp.zeros((L_total, Dt + 1, pv), jnp.float32)
            ln = (jnp.ones((pv,)), jnp.zeros((pv,)),
                  jnp.ones((Dt,)), jnp.zeros((Dt,)))

        x, Wh, Ww = self.swin.embed(images)
        hidden = self.embeddings(input_ids)
        consts = (attention_mask, ln)

        maple = lpi.interact_type == "maple"
        hidden_chunks = []
        outs = []
        off = 0
        for s in range(len(self.swin_cfg.depths)):
            depth = self.swin_cfg.depths[s]
            n_pairs = depth // 2
            C = self.swin_cfg.embed_dim * (2 ** s)
            n, ch, cw = _corner_geometry(P, pv, C)
            active = bool(n > 0 and (inject_mask[off:off + depth].any()
                                     or inter_mask[off:off + depth].any()))

            def stack_pairs(arr, batch_axes):
                """[.., depth-slice, ..] -> leading [n_pairs, 2, ...]."""
                sl = arr[..., off:off + depth, :, :] if batch_axes else arr[off:off + depth]
                if batch_axes:  # [B, depth, P, D] -> [n_pairs, 2, B, P, D]
                    sl = jnp.moveaxis(sl, 1, 0)
                return sl.reshape((n_pairs, 2) + sl.shape[1:])

            xs = {
                "vis": stack_pairs(vis_pad, True),
                "txt": stack_pairs(txt_pad, True),
                "inject": jnp.asarray(inject_mask[off:off + depth]).reshape(n_pairs, 2),
                "interact": jnp.asarray(inter_mask[off:off + depth]).reshape(n_pairs, 2),
                "m_v2t": stack_pairs(m_v2t, False),
                "m_t2v": stack_pairs(m_t2v, False),
            }

            Scanned = nn.scan(
                FusedPair,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(0, nn.broadcast),
                out_axes=0,
                length=n_pairs,
                unroll=min(self.scan_unroll, n_pairs))
            pair = Scanned(
                dim=C, num_heads=self.swin_cfg.num_heads[s],
                window_size=self.swin_cfg.window_size,
                mlp_ratio=self.swin_cfg.mlp_ratio, bert_cfg=self.bert_cfg,
                grid=(Wh, Ww), corner=(n, ch, cw),
                prompt_len=P, prompt_vdim=pv, maple=maple, active=active,
                dtype=self.dtype, name=f"stage{s}")
            (x, hidden), ys = pair((x, hidden), xs, consts)
            # ys [n_pairs, 2, B, S, D] -> per-layer list entries
            hidden_chunks.append(ys.reshape((depth,) + ys.shape[2:]))

            out = self.swin.stage_norm(s, x, Wh, Ww)
            if out is not None:
                outs.append(out)
            if s < len(self.swin_cfg.depths) - 1:
                x, Wh, Ww = self.swin.downsample(s, x, Wh, Ww)
            off += depth

        all_hidden = jnp.concatenate(hidden_chunks, axis=0)  # [12, B, S, D]

        # language dict features (`prompt/prompt.py:154-193`), including the
        # reference's extra /N division (a no-op at N=1)
        N = num_pooled_layers
        feats = jnp.mean(all_hidden[-N:], axis=0) / N
        mask_f = attention_mask[..., None].astype(feats.dtype)
        embedded = feats * mask_f
        aggregate = embedded.sum(1) / jnp.maximum(
            attention_mask.sum(-1, keepdims=True).astype(feats.dtype), 1.0)
        language = {
            "aggregate": aggregate,
            "embedded": embedded,
            "masks": attention_mask,
            "hidden": all_hidden[-1],
        }
        return language, outs

"""END-TO-END numerical parity of the COMPOSED models against torch oracles.

Block-level parity (tests/test_glip_parity.py, tests/test_clip_convert.py)
pins each tower's math; these tests pin the composed SEMANTICS:

* the full fused 12-step schedule — inject -> interact -> swin -> bert
  ordering across all four stage widths, corner geometry per stage, the
  inject/interact depth boundaries, patch merging, stage norms, and the /N
  language pooling (`modeling_bert.py:693-883` + `prompt/prompt.py:154-193`)
  — minus the two documented deviations (the H/W-swapped interact
  write-back, `modeling_bert.py:813-814`, and batched eval gather);
* the full SliNet forward — CLS-then-prompt concat order, CoOp ctx splice,
  EOT pooling, logit scale (`retrieval/models/clip/model.py:227-259` +
  `clip/prompt_learner.py:128-218`).

The torch oracles are written here from the published math, composed in the
reference's exact order, and fed the Flax modules' converted weights. A
scheduling bug (e.g. inject-after-block instead of before) fails these
tests while passing every block-level one.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# NOT in the `-m fast` lane: torch-oracle parity tests compile both a JAX
# and a torch model per case (compile-bound, minutes on this 1-core box).
# They run in the default (`not slow`) suite.
import torch
import torch.nn.functional as F

from lpi_tpu.core.config import BertConfig, LPIPromptConfig, SwinConfig
from lpi_tpu.models.glip.fused import FusedDualEncoder, _corner_geometry
from lpi_tpu.models.glip.swin import shifted_window_mask
from tests.test_glip_parity import (
    _torchify,
    torch_bert_layer,
    torch_swin_block,
)

# Tiny config chosen so ALL FOUR stage widths have an active, differently
# shaped corner: P*pv/C = 8 (2x4), 4 (2x2), 2 (1x2), 1 (1x1).
SWIN = SwinConfig(patch_size=4, embed_dim=8, depths=(2, 2, 6, 2),
                  num_heads=(1, 2, 2, 2), window_size=4)
BERT = BertConfig(vocab_size=64, hidden_size=16, num_layers=12, num_heads=2,
                  intermediate_size=32, max_position_embeddings=32,
                  max_query_len=20)


def _slice_tree(tree, i):
    return jax.tree.map(lambda v: v[i], tree)


def _assert_close(ours, theirs, rel=1e-4, atol=3e-3):
    """Composed-output closeness: relative Frobenius error <= `rel` (the
    VERDICT bar) plus an absolute per-element cap. Elementwise rtol is the
    wrong criterion after 12 accumulating layers — near-zero elements show
    O(1e-2) relative float noise while the tensors agree to 1e-5 overall."""
    ours = np.asarray(ours, np.float64)
    theirs = np.asarray(theirs, np.float64)
    denom = max(np.linalg.norm(theirs), 1e-6)
    frob = np.linalg.norm(ours - theirs) / denom
    assert frob <= rel, f"relative Frobenius error {frob:.3e} > {rel}"
    np.testing.assert_allclose(ours, theirs, atol=atol, rtol=0)


def torch_patch_embed(images, p, patch):
    """Conv stride-patch + LN over flattened tokens (swint.py PatchEmbed)."""
    x = torch.tensor(np.asarray(images)).permute(0, 3, 1, 2)
    w = p["patch_proj.kernel"].permute(3, 2, 0, 1)
    x = F.conv2d(x, w, p["patch_proj.bias"], stride=patch)
    B, C, h, w_ = x.shape
    x = x.flatten(2).transpose(1, 2)  # [B, h*w, C]
    x = F.layer_norm(x, (C,), p["patch_norm.scale"], p["patch_norm.bias"])
    return x, h, w_


def torch_bert_embeddings(input_ids, p):
    ids = torch.tensor(np.asarray(input_ids))
    S = ids.shape[1]
    x = (p["word_embeddings"][ids] + p["position_embeddings"][:S][None]
         + p["token_type_embeddings"][0][None, None])
    D = x.shape[-1]
    return F.layer_norm(x, (D,), p["norm.scale"], p["norm.bias"], eps=1e-12)


def torch_patch_merging(x, H, W, p):
    """swint.py PatchMerging: 2x2 gather -> LN -> linear (no bias)."""
    B, L, C = x.shape
    x = x.view(B, H, W, C)
    x = F.pad(x, (0, 0, 0, W % 2, 0, H % 2))
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = torch.cat([x0, x1, x2, x3], dim=-1).reshape(B, -1, 4 * C)
    x = F.layer_norm(x, (4 * C,), p["norm.scale"], p["norm.bias"])
    return x @ p["reduction.kernel"]


def torch_interact(v16, t16, m_v2t, m_t2v, ln, alpha=0.1):
    """InteractModule (`modeling_bert.py:557-651`): low-rank affine both
    ways, residual blend a=0.1, LayerNorm (per-task params)."""
    pv = v16.shape[-1]
    Dt = t16.shape[-1]
    new_t = v16 @ m_v2t[:pv] + m_v2t[pv:]
    new_v = t16 @ m_t2v[:Dt] + m_t2v[Dt:]
    vs, vb, ts, tb = ln
    v_out = F.layer_norm((1 - alpha) * v16 + alpha * new_v, (pv,), vs, vb)
    t_out = F.layer_norm((1 - alpha) * t16 + alpha * new_t, (Dt,), ts, tb)
    return v_out, t_out


def torch_fused_forward(images, input_ids, attention_mask, vis_prompt,
                        txt_prompt, params, lpi, maple, task_id,
                        num_pooled_layers):
    """The reference's full fused loop (`modeling_bert.py:693-883`) at tiny
    shapes: one global block counter i over sum(depths) Swin blocks in
    lockstep with the BERT layers, per block (a) visual corner inject,
    (b) textual inject, (c) interact, (d) swin block, (e) bert layer; stage
    norms + patch merging between stages; then the PromptEncoder's language
    pooling (`prompt/prompt.py:154-193`) including the extra /N."""
    P = lpi.prompt_length
    pv = SWIN.embed_dim
    Dt = BERT.hidden_size
    sw = _torchify(params["swin"])
    x, H, W = torch_patch_embed(images, sw, SWIN.patch_size)
    hidden = torch_bert_embeddings(input_ids, _torchify(params["embeddings"]))
    mask_t = torch.tensor(np.asarray(attention_mask, np.float32))
    B = x.shape[0]

    # per-(task, layer) interact maps: M = einsum(d1[l], d2, d3) / rank
    ip = _torchify(params["interact"])
    L_total = BERT.num_layers
    m_v2t = torch.einsum("lr,dr,er->lde", ip["d1_v2t"][task_id],
                         ip["d2_v2t"][task_id], ip["d3_v2t"][task_id]) / lpi.interact_rank
    m_t2v = torch.einsum("lr,dr,er->lde", ip["d1_t2v"][task_id],
                         ip["d2_t2v"][task_id], ip["d3_t2v"][task_id]) / lpi.interact_rank
    ln = (ip["visual_norm_scale"][task_id], ip["visual_norm_bias"][task_id],
          ip["textual_norm_scale"][task_id], ip["textual_norm_bias"][task_id])

    vis_prompt = torch.tensor(np.asarray(vis_prompt, np.float32))
    txt_prompt = torch.tensor(np.asarray(txt_prompt, np.float32))
    if vis_prompt.dim() == 3:  # shared -> batched
        vis_prompt = vis_prompt[None].expand(B, -1, -1, -1)
        txt_prompt = txt_prompt[None].expand(B, -1, -1, -1)

    encoded_layers = []  # ours collects POST-layer hiddens
    outs = []
    i = 0
    ws = SWIN.window_size
    for s, depth in enumerate(SWIN.depths):
        C = SWIN.embed_dim * (2 ** s)
        n, ch, cw = _corner_geometry(P, pv, C)
        Hp = int(math.ceil(H / ws)) * ws
        Wp = int(math.ceil(W / ws)) * ws
        shift_mask = shifted_window_mask(Hp, Wp, ws, ws // 2)
        for j in range(depth):
            # (a) visual prompt at the stage-width corner (:744-763)
            if i < lpi.prompt_depth and n > 0:
                cur = vis_prompt[:, i].reshape(B, -1)[:, :n * C].reshape(
                    B, ch, cw, C)
                xm = x.view(B, H, W, C)
                if maple:
                    xm[:, :ch, :cw] = cur
                else:
                    xm[:, :ch, :cw] += cur
                x = xm.reshape(B, H * W, C)
                # (b) textual prompt at token slots 0..P (:767-772).
                # clone: the pre-inject tensor is already stored in
                # encoded_layers (ours collects post-layer states)
                hidden = hidden.clone()
                if maple:
                    hidden[:, :P] = txt_prompt[:, i]
                else:
                    hidden[:, :P] = hidden[:, :P] + txt_prompt[:, i]
            # (c) interaction on corner + first-P tokens (:776-819),
            # minus the reference's H/W-swapped write-back
            if 0 < i < lpi.interact_depth and n > 0:
                xm = x.view(B, H, W, C)
                v16 = xm[:, :ch, :cw].reshape(B, P, pv)
                t16 = hidden[:, :P]
                v2, t2 = torch_interact(v16, t16, m_v2t[i], m_t2v[i], ln)
                xm[:, :ch, :cw] = v2.reshape(B, ch, cw, C)
                x = xm.reshape(B, H * W, C)
                hidden = hidden.clone()
                hidden[:, :P] = t2
            # (d) swin block, (e) bert layer
            pair = i % 2  # (no-shift, shift) alternation within the stage
            blk = _torchify(_slice_tree(params[f"stage{s}"], j // 2))
            bp = {k[len(f"vblock{pair}."):]: v for k, v in blk.items()
                  if k.startswith(f"vblock{pair}.")}
            tp = {k[len(f"tlayer{pair}."):]: v for k, v in blk.items()
                  if k.startswith(f"tlayer{pair}.")}
            shift = 0 if pair == 0 else ws // 2
            x = torch_swin_block(x, H, W, bp, SWIN.num_heads[s], ws, shift,
                                 shift_mask if shift else None)
            hidden = torch_bert_layer(hidden, mask_t, tp)
            encoded_layers.append(hidden)
            i += 1
        # stage norm -> NHWC out, then downsample (:851-883); stage 0 is
        # nn.Identity under RETINANET (`swint.py:556-559`) so has no params
        norm = {k[len(f"out_norm{s}."):]: v for k, v in sw.items()
                if k.startswith(f"out_norm{s}.")}
        out = F.layer_norm(x, (C,), norm["scale"], norm["bias"]) if norm else x
        outs.append(out.view(B, H, W, C))
        if s < len(SWIN.depths) - 1:
            dsp = {k[len(f"downsample{s}."):]: v for k, v in sw.items()
                   if k.startswith(f"downsample{s}.")}
            x = torch_patch_merging(x, H, W, dsp)
            H, W = (H + 1) // 2, (W + 1) // 2

    # language pooling (`prompt/prompt.py:157-166`) incl. the extra /N
    N = num_pooled_layers
    feats = torch.stack(encoded_layers[-N:], 0).mean(0) / N
    embedded = feats * mask_t[..., None]
    aggregate = embedded.sum(1) / mask_t.sum(-1, keepdim=True)
    return {
        "aggregate": aggregate.detach().numpy(),
        "embedded": embedded.detach().numpy(),
        "hidden": encoded_layers[-1].detach().numpy(),
    }, [o.detach().numpy() for o in outs]


# ---------------------------------------------------------------------------
# Part B: full SliNet (prompted CLIP) forward vs torch oracle
# ---------------------------------------------------------------------------

def torch_clip_block(x, p, heads, causal):
    """Pre-LN CLIP block with QuickGELU (`clip/model.py:168-196`)."""
    B, S, D = x.shape
    h = F.layer_norm(x, (D,), p["block.ln_1.scale"], p["block.ln_1.bias"])
    qkv = F.linear(h, p["block.attn.in_proj.kernel"].T,
                   p["block.attn.in_proj.bias"])
    q, k, v = qkv.chunk(3, dim=-1)

    def split(t):
        return t.view(B, S, heads, D // heads).permute(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    attn = (q @ k.transpose(-2, -1)) / (D // heads) ** 0.5
    if causal:
        mask = torch.tril(torch.ones(S, S, dtype=torch.bool))
        attn = attn.masked_fill(~mask, float("-inf"))
    out = attn.softmax(-1) @ v
    out = out.permute(0, 2, 1, 3).reshape(B, S, D)
    out = F.linear(out, p["block.attn.out_proj.kernel"].T,
                   p["block.attn.out_proj.bias"])
    x = x + out
    h = F.layer_norm(x, (D,), p["block.ln_2.scale"], p["block.ln_2.bias"])
    h = F.linear(h, p["block.mlp_c_fc.kernel"].T, p["block.mlp_c_fc.bias"])
    h = h * torch.sigmoid(1.702 * h)
    h = F.linear(h, p["block.mlp_c_proj.kernel"].T, p["block.mlp_c_proj.bias"])
    return x + h


def torch_slinet_forward(images, token_ids, params, cfg, task_id):
    """The reference's full SliNet forward at tiny shapes:

    * CP prompt composition (`prompts.py:38-57`, mean over rank);
    * vision: conv stem -> [CLS | patches] + pos -> CONCAT prompt[0] after
      CLS (no pos on prompt tokens) -> ln_pre -> blocks -> ln_post(CLS) @
      proj (`clip/model.py:227-259`);
    * text: token embeddings -> CoOp splice of prompt[0] into ctx slots
      1..P+1 -> + pos -> causal blocks -> ln_final -> EOT(argmax) pooling @
      text_projection (`prompt_learner.py:128-218`, TextEncoder :43-63);
    * L2 normalize both, logit_scale.exp().

    Deep per-layer injection (slots 1..P+1, layers 1..depth-1) follows the
    repo's documented working extension of the reference's dead branch
    (`clip/model.py:187-196`); at injection_depth=1 it is inert and the
    oracle is exactly the reference's live input-only behavior.
    """
    c = cfg.clip
    depth = cfg.lpi.injection_depth
    P = cfg.lpi.prompt_length
    sp = _torchify(params["prompts"])
    d1 = sp["d1_share"][task_id]
    vis_p = torch.einsum("lr,pr,dr->lpd", d1, sp["d2_visual"][task_id],
                         sp["d3_visual"][task_id]) / cfg.lpi.prompt_rank
    txt_p = torch.einsum("lr,pr,dr->lpd", d1, sp["d2_textual"][task_id],
                         sp["d3_textual"][task_id]) / cfg.lpi.prompt_rank

    cp = _torchify(params["clip"])
    B = images.shape[0]
    grid = c.image_resolution // c.patch_size

    # vision tower
    x = torch.tensor(np.asarray(images)).permute(0, 3, 1, 2)
    w = cp["visual.conv1.kernel"].permute(3, 2, 0, 1)
    x = F.conv2d(x, w, None, stride=c.patch_size)
    x = x.reshape(B, c.vision_width, grid * grid).transpose(1, 2)
    cls = cp["visual.class_embedding"][None, None].expand(B, 1, -1)
    x = torch.cat([cls, x], dim=1) + cp["visual.positional_embedding"][None]
    x = torch.cat([x[:, :1], vis_p[0][None].expand(B, -1, -1), x[:, 1:]], dim=1)
    x = F.layer_norm(x, (c.vision_width,), cp["visual.ln_pre.scale"],
                     cp["visual.ln_pre.bias"])
    for l in range(c.vision_layers):
        if 1 <= l < depth:
            x = x.clone()
            x[:, 1:P + 1] += vis_p[l]
        blk = {k[len("visual.transformer."):]: v[l] for k, v in cp.items()
               if k.startswith("visual.transformer.")}
        x = torch_clip_block(x, blk, c.vision_heads, causal=False)
    pooled = F.layer_norm(x[:, 0], (c.vision_width,),
                          cp["visual.ln_post.scale"], cp["visual.ln_post.bias"])
    img = pooled @ cp["visual.proj"]
    img = img / img.norm(dim=-1, keepdim=True)

    # text tower
    ids = torch.tensor(np.asarray(token_ids))
    S = ids.shape[1]
    t = cp["token_embedding"][ids]
    t = t.clone()
    t[:, 1:P + 1] = txt_p[0][None]  # CoOp ctx splice
    t = t + cp["text.positional_embedding"][:S][None]
    for l in range(c.text_layers):
        if 1 <= l < depth:
            t = t.clone()
            t[:, 1:P + 1] += txt_p[l]
        blk = {k[len("text.transformer."):]: v[l] for k, v in cp.items()
               if k.startswith("text.transformer.")}
        t = torch_clip_block(t, blk, c.text_heads, causal=True)
    t = F.layer_norm(t, (c.text_width,), cp["text.ln_final.scale"],
                     cp["text.ln_final.bias"])
    eot = ids.argmax(dim=-1)
    pooled_t = t[torch.arange(B), eot]
    txt = pooled_t @ cp["text.text_projection"]
    txt = txt / txt.norm(dim=-1, keepdim=True)

    scale = float(np.exp(np.asarray(params["clip"]["logit_scale"])))
    return (img.detach().numpy(), txt.detach().numpy(),
            vis_p.detach().numpy(), txt_p.detach().numpy(), scale)


class TestSliNetComposedParity:
    """VERDICT r2 item #1: the full SliNet forward vs a torch oracle."""

    @pytest.mark.parametrize("injection_depth", [1, 3])
    def test_matches_torch(self, rng, injection_depth):
        from lpi_tpu.core.config import CLIPConfig, RetrievalConfig
        from lpi_tpu.models.clip import SliNet

        cfg = RetrievalConfig(
            clip=CLIPConfig(
                image_resolution=32, patch_size=16, vision_width=64,
                vision_layers=4, vision_heads=4, text_width=32, text_layers=4,
                text_heads=4, vocab_size=512, context_length=16, embed_dim=24,
                n_ctx=4),
            lpi=LPIPromptConfig(prompt_length=4, prompt_depth=3,
                                prompt_rank=2,
                                injection_depth=injection_depth),
            total_sessions=3, visual_dim=64, textual_dim=32,
            num_key_clusters=2, dtype="float32")
        model = SliNet(cfg)
        B = 3
        images = rng.randn(B, 32, 32, 3).astype(np.float32)
        ids = rng.randint(1, 400, size=(B, 16)).astype(np.int32)
        ids[:, 0] = 401
        for b in range(B):  # EOT (max id) at a per-sample position
            ids[b, 9 + b] = 511
            ids[b, 10 + b:] = 0
        task_id = 2

        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(images),
                               jnp.asarray(ids), task_id)
        img, txt, vis_p, txt_p, scale = model.apply(
            variables, jnp.asarray(images), jnp.asarray(ids), task_id)

        r_img, r_txt, r_visp, r_txtp, r_scale = torch_slinet_forward(
            images, ids, variables["params"], cfg, task_id)

        np.testing.assert_allclose(np.asarray(vis_p), r_visp, rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(txt_p), r_txtp, rtol=1e-4,
                                   atol=1e-5)
        _assert_close(img, r_img)
        _assert_close(txt, r_txt)
        assert float(scale) == pytest.approx(r_scale, rel=1e-5)


class TestFusedScheduleParity:
    """VERDICT r2 item #1: the composed 12-step schedule vs a torch oracle."""

    @pytest.mark.parametrize("maple,depth_cfg,pooled", [
        (False, (9, 9), 1),   # the LPI paper config shape
        (True, (9, 9), 1),    # maple replace-mode injection
        (False, (12, 12), 3),  # full-depth boundaries + multi-layer pooling
        (False, (2, 5), 1),   # inject/interact depths crossing stage bounds
    ])
    def test_matches_torch(self, rng, maple, depth_cfg, pooled):
        prompt_depth, interact_depth = depth_cfg
        lpi = LPIPromptConfig(
            prompt_length=8, prompt_depth=prompt_depth, prompt_rank=2,
            interact_rank=2, interact_depth=interact_depth,
            interact_type="maple" if maple else "dcp")
        enc = FusedDualEncoder(swin_cfg=SWIN, bert_cfg=BERT, lpi_cfg=lpi,
                               num_tasks=3, scan_unroll=99)
        B, S = 2, 20
        images = rng.randn(B, 32, 48, 3).astype(np.float32)
        ids = rng.randint(1, 64, size=(B, S)).astype(np.int32)
        mask = np.ones((B, S), np.float32)
        mask[1, 14:] = 0.0
        L = BERT.num_layers
        visp = (0.1 * rng.randn(L, lpi.prompt_length, SWIN.embed_dim)
                ).astype(np.float32)
        txtp = (0.1 * rng.randn(L, lpi.prompt_length, BERT.hidden_size)
                ).astype(np.float32)
        task_id = 1

        variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(images),
                             jnp.asarray(ids), jnp.asarray(mask),
                             jnp.asarray(visp), jnp.asarray(txtp), task_id)
        language, outs = enc.apply(
            variables, jnp.asarray(images), jnp.asarray(ids),
            jnp.asarray(mask), jnp.asarray(visp), jnp.asarray(txtp), task_id,
            num_pooled_layers=pooled)

        ref_lang, ref_outs = torch_fused_forward(
            images, ids, mask, visp, txtp, variables["params"], lpi, maple,
            task_id, pooled)

        assert len(outs) == len(ref_outs) == 4
        for ours, theirs in zip(outs, ref_outs):
            _assert_close(ours, theirs)
        for key in ("aggregate", "embedded", "hidden"):
            _assert_close(language[key], ref_lang[key])

    def test_no_prompts_equals_plain_towers(self, rng):
        """With no prompts the schedule must reduce to independent towers."""
        lpi = LPIPromptConfig(prompt_length=8, prompt_depth=9, prompt_rank=2,
                              interact_rank=2, interact_depth=9)
        enc = FusedDualEncoder(swin_cfg=SWIN, bert_cfg=BERT, lpi_cfg=lpi,
                               num_tasks=3, scan_unroll=99)
        B, S = 2, 20
        images = rng.randn(B, 32, 48, 3).astype(np.float32)
        ids = rng.randint(1, 64, size=(B, S)).astype(np.int32)
        mask = np.ones((B, S), np.float32)
        variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(images),
                             jnp.asarray(ids), jnp.asarray(mask))
        language, outs = enc.apply(variables, jnp.asarray(images),
                                   jnp.asarray(ids), jnp.asarray(mask))
        # oracle with zero prompts and inject/interact disabled via depth 0
        lpi0 = LPIPromptConfig(prompt_length=8, prompt_depth=0, prompt_rank=2,
                               interact_rank=2, interact_depth=0)
        zeros_v = np.zeros((BERT.num_layers, 8, SWIN.embed_dim), np.float32)
        zeros_t = np.zeros((BERT.num_layers, 8, BERT.hidden_size), np.float32)
        ref_lang, ref_outs = torch_fused_forward(
            images, ids, mask, zeros_v, zeros_t, variables["params"], lpi0,
            False, 0, 1)
        for ours, theirs in zip(outs, ref_outs):
            _assert_close(ours, theirs)
        _assert_close(language["aggregate"], ref_lang["aggregate"])

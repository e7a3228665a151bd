"""GLIP-T checkpoint -> lpi_tpu grounding param-tree converter.

Maps a maskrcnn_benchmark GLIP state dict (as loaded by
`DetectronCheckpointer._load_file/_load_model`, `utils/checkpoint.py:59-170`,
incl. the `module.` DDP prefix) into `GroundedVLModel`'s Flax layout:

* `backbone.body.*`           -> encoder/swin/* (patch embed, downsamples,
                                 out-norms; HWIO conv transposes) and
                                 encoder/stage{s}/vblock{j}/* (block weights
                                 stacked over the scanned pair axis)
* `language_backbone.body.model.*` -> encoder/embeddings +
                                 encoder/stage{s}/tlayer{j}/* (stacked over
                                 pairs, interleaved with Swin stages)
* `backbone.fpn.*`            -> fpn/* (GN conv pairs, p6/p7)
* `rpn.head.dyhead_tower.*`   -> head/tower{i} (DyConv triplet: torch list
                                 index 0=conv_up, 1=conv_same, 2=conv_down)
* `rpn.head.{cls_logits,bbox_pred,centerness,dot_product_projection_text,
   log_scale,bias_lang,bias0,scales}` -> head/*
* `rpn.tunable_linear.weight` / `rpn.head.tunable_linear.weight`
* LPI pools when present: `prompts.{t}.dim_*` and
  `interactModuleList.{t}.*` stacked over the task axis.

Partial loading mirrors the reference's behavior: unmatched checkpoint keys
are reported, model params without a source keep their init.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import numpy as np


def _f32(x):
    return np.asarray(x, np.float32)


def _conv(x):  # torch OIHW -> flax HWIO
    return _f32(x).transpose(2, 3, 1, 0)


def _lin(x):  # torch [out, in] -> flax [in, out]
    return _f32(x).T


def convert_glip(sd: Mapping[str, np.ndarray],
                 num_tasks: int = 12) -> Tuple[Dict, list]:
    """-> (flat params {tuple_path: array}, unmapped_checkpoint_keys)."""
    sd = {re.sub(r"^module\.", "", k): np.asarray(v) for k, v in sd.items()}
    out: Dict[tuple, np.ndarray] = {}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    def put(path: str, value):
        out[tuple(path.split("/"))] = value

    # ---- Swin body -----------------------------------------------------
    # Block weights go to the fused encoder's scanned pair stacks:
    # `encoder/stage{s}/vblock{j}/...` with a leading [n_pairs] axis
    # (block b of stage s = pair b//2, sub-block j = b%2).
    B = "backbone.body."
    if B + "patch_embed.proj.weight" in sd:
        put("encoder/swin/patch_proj/kernel", _conv(take(B + "patch_embed.proj.weight")))
        put("encoder/swin/patch_proj/bias", _f32(take(B + "patch_embed.proj.bias")))
        put("encoder/swin/patch_norm/scale", _f32(take(B + "patch_embed.norm.weight")))
        put("encoder/swin/patch_norm/bias", _f32(take(B + "patch_embed.norm.bias")))
    pend_swin: Dict[tuple, Dict[int, np.ndarray]] = {}  # (s, j, suffix) -> {pair: arr}
    for key in list(sd):
        m = re.match(rf"{re.escape(B)}layers\.(\d+)\.blocks\.(\d+)\.(.+)", key)
        if not m:
            continue
        s, b, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        table = {
            "norm1.weight": ("norm1/scale", _f32),
            "norm1.bias": ("norm1/bias", _f32),
            "norm2.weight": ("norm2/scale", _f32),
            "norm2.bias": ("norm2/bias", _f32),
            "attn.relative_position_bias_table":
                ("attn/relative_position_bias_table", _f32),
            "attn.qkv.weight": ("attn/qkv/kernel", _lin),
            "attn.qkv.bias": ("attn/qkv/bias", _f32),
            "attn.proj.weight": ("attn/proj/kernel", _lin),
            "attn.proj.bias": ("attn/proj/bias", _f32),
            "mlp.fc1.weight": ("mlp/fc1/kernel", _lin),
            "mlp.fc1.bias": ("mlp/fc1/bias", _f32),
            "mlp.fc2.weight": ("mlp/fc2/kernel", _lin),
            "mlp.fc2.bias": ("mlp/fc2/bias", _f32),
        }
        if rest in table:
            suffix, fn = table[rest]
            pend_swin.setdefault((s, b % 2, suffix), {})[b // 2] = fn(take(key))
        elif rest == "attn.relative_position_index":
            used.add(key)  # recomputed at trace time
    for (s, j, suffix), pairs in pend_swin.items():
        stacked = np.stack([pairs[p] for p in range(max(pairs) + 1)])
        put(f"encoder/stage{s}/vblock{j}/{suffix}", stacked)
    for key in list(sd):
        m = re.match(rf"{re.escape(B)}layers\.(\d+)\.downsample\.(.+)", key)
        if m:
            s, rest = int(m.group(1)), m.group(2)
            if rest == "norm.weight":
                put(f"encoder/swin/downsample{s}/norm/scale", _f32(take(key)))
            elif rest == "norm.bias":
                put(f"encoder/swin/downsample{s}/norm/bias", _f32(take(key)))
            elif rest == "reduction.weight":
                put(f"encoder/swin/downsample{s}/reduction/kernel", _lin(take(key)))
        m = re.match(rf"{re.escape(B)}norm(\d+)\.(weight|bias)", key)
        if m:
            s, wb = int(m.group(1)), m.group(2)
            put(f"encoder/swin/out_norm{s}/{'scale' if wb == 'weight' else 'bias'}",
                _f32(take(key)))

    # ---- BERT ----------------------------------------------------------
    L = "language_backbone.body.model."
    emb_map = {
        "embeddings.word_embeddings.weight": "encoder/embeddings/word_embeddings",
        "embeddings.position_embeddings.weight": "encoder/embeddings/position_embeddings",
        "embeddings.token_type_embeddings.weight": "encoder/embeddings/token_type_embeddings",
        "embeddings.LayerNorm.weight": "encoder/embeddings/norm/scale",
        "embeddings.LayerNorm.bias": "encoder/embeddings/norm/bias",
    }
    for src, dst in emb_map.items():
        if L + src in sd:
            put(dst, _f32(take(L + src)))
    # BERT layers interleave with Swin in the fused schedule: global layer i
    # belongs to the stage covering i under the cumulative Swin depths, at
    # `encoder/stage{s}/tlayer{i%2}` stacked over that stage's pairs.
    depths = []
    for s in range(16):
        blocks = {int(m.group(1)) for k in sd
                  if (m := re.match(rf"{re.escape(B)}layers\.{s}\.blocks\.(\d+)\.norm1\.weight", k))}
        if not blocks:
            break
        depths.append(max(blocks) + 1)
    offsets = np.cumsum([0] + depths)

    def bert_slot(i: int):
        """global layer index -> (stage, pair, sub) under the fused layout."""
        for s in range(len(depths)):
            if i < offsets[s + 1]:
                local = i - offsets[s]
                return s, local // 2, local % 2
        return None  # checkpoint has more BERT layers than Swin blocks

    pend_bert: Dict[tuple, Dict[int, np.ndarray]] = {}  # (s, j, suffix) -> {pair: arr}
    bert_table = {
        "attention.self.query.weight": ("attention/query/kernel", _lin),
        "attention.self.query.bias": ("attention/query/bias", _f32),
        "attention.self.key.weight": ("attention/key/kernel", _lin),
        "attention.self.key.bias": ("attention/key/bias", _f32),
        "attention.self.value.weight": ("attention/value/kernel", _lin),
        "attention.self.value.bias": ("attention/value/bias", _f32),
        "attention.output.dense.weight": ("attention_output/kernel", _lin),
        "attention.output.dense.bias": ("attention_output/bias", _f32),
        "attention.output.LayerNorm.weight": ("attention_norm/scale", _f32),
        "attention.output.LayerNorm.bias": ("attention_norm/bias", _f32),
        "intermediate.dense.weight": ("intermediate/kernel", _lin),
        "intermediate.dense.bias": ("intermediate/bias", _f32),
        "output.dense.weight": ("output/kernel", _lin),
        "output.dense.bias": ("output/bias", _f32),
        "output.LayerNorm.weight": ("output_norm/scale", _f32),
        "output.LayerNorm.bias": ("output_norm/bias", _f32),
    }
    for key in list(sd):
        m = re.match(rf"{re.escape(L)}encoder\.layer\.(\d+)\.(.+)", key)
        if not m:
            continue
        i, rest = int(m.group(1)), m.group(2)
        if rest in bert_table and (slot := bert_slot(i)) is not None:
            s, p, j = slot
            suffix, fn = bert_table[rest]
            pend_bert.setdefault((s, j, suffix), {})[p] = fn(take(key))
    for (s, j, suffix), pairs in pend_bert.items():
        stacked = np.stack([pairs[p] for p in range(max(pairs) + 1)])
        put(f"encoder/stage{s}/tlayer{j}/{suffix}", stacked)

    # ---- FPN -----------------------------------------------------------
    F = "backbone.fpn."
    for key in list(sd):
        # plain conv + bias (USE_GN False, the LPI configs' layout):
        # `fpn_inner2.weight` / `.bias` directly on the conv
        m = re.match(rf"{re.escape(F)}fpn_(inner|layer)(\d+)\.(weight|bias)$", key)
        if m:
            kind, idx, wb = m.group(1), int(m.group(2)), m.group(3)
            i = idx - 2  # reference indexes inner2..4; ours 0..2
            if wb == "weight":
                put(f"fpn/{kind}{i}_conv/kernel", _conv(take(key)))
            else:
                put(f"fpn/{kind}{i}_conv/bias", _f32(take(key)))
            continue
        # Sequential conv+GN (USE_GN True surface): `.0.weight` conv,
        # `.1.{weight,bias}` group norm
        m = re.match(rf"{re.escape(F)}fpn_(inner|layer)(\d+)\.(\d+)\.(weight|bias)", key)
        if m:
            kind, idx, sub, wb = m.group(1), int(m.group(2)), int(m.group(3)), m.group(4)
            i = idx - 2
            if sub == 0:
                put(f"fpn/{kind}{i}_conv/kernel", _conv(take(key)))
            else:
                put(f"fpn/{kind}{i}_gn/{'scale' if wb == 'weight' else 'bias'}",
                    _f32(take(key)))
    for p in ("p6", "p7"):
        if F + f"top_blocks.{p}.weight" in sd:
            put(f"fpn/{p}/kernel", _conv(take(F + f"top_blocks.{p}.weight")))
            put(f"fpn/{p}/bias", _f32(take(F + f"top_blocks.{p}.bias")))

    # ---- VLDyHead ------------------------------------------------------
    H = "rpn.head."
    dy_names = {0: "conv_up", 1: "conv_same", 2: "conv_down"}
    for key in list(sd):
        m = re.match(rf"{re.escape(H)}dyhead_tower\.(\d+)\.(.+)", key)
        if not m:
            continue
        i, rest = int(m.group(1)), m.group(2)
        base = f"head/tower{i}"
        m2 = re.match(r"DyConv\.(\d)\.conv\.(weight|bias)", rest)
        if m2:
            name = dy_names[int(m2.group(1))]
            if m2.group(2) == "weight":
                put(f"{base}/{name}/kernel", _conv(take(key)))
            else:
                put(f"{base}/{name}/bias", _f32(take(key)))
            continue
        m2 = re.match(r"DyConv\.(\d)\.bn\.(weight|bias)", rest)
        if m2:
            name = dy_names[int(m2.group(1))]
            put(f"{base}/{name}/gn/{'scale' if m2.group(2) == 'weight' else 'bias'}",
                _f32(take(key)))
            continue
        if rest == "offset.weight":
            put(f"{base}/offset/kernel", _conv(take(key)))
        elif rest == "offset.bias":
            put(f"{base}/offset/bias", _f32(take(key)))
        elif rest == "AttnConv.1.weight":
            put(f"{base}/attn/kernel", _conv(take(key)))
        elif rest == "AttnConv.1.bias":
            put(f"{base}/attn/bias", _f32(take(key)))
        elif rest == "relu.fc.0.weight":
            put(f"{base}/dyrelu/fc1/kernel", _lin(take(key)))
        elif rest == "relu.fc.0.bias":
            put(f"{base}/dyrelu/fc1/bias", _f32(take(key)))
        elif rest == "relu.fc.2.weight":
            put(f"{base}/dyrelu/fc2/kernel", _lin(take(key)))
        elif rest == "relu.fc.2.bias":
            put(f"{base}/dyrelu/fc2/bias", _f32(take(key)))

    simple = {
        H + "cls_logits.weight": ("head/cls_logits/kernel", _conv),
        H + "cls_logits.bias": ("head/cls_logits/bias", _f32),
        H + "bbox_pred.weight": ("head/bbox_pred/kernel", _conv),
        H + "bbox_pred.bias": ("head/bbox_pred/bias", _f32),
        H + "centerness.weight": ("head/centerness/kernel", _conv),
        H + "centerness.bias": ("head/centerness/bias", _f32),
        H + "dot_product_projection_text.weight":
            ("head/dot_product_projection_text/kernel", _lin),
        H + "dot_product_projection_text.bias":
            ("head/dot_product_projection_text/bias", _f32),
        H + "log_scale": ("head/log_scale", lambda x: _f32(x).reshape(1)),
        H + "bias_lang": ("head/bias_lang", _f32),
        H + "bias0": ("head/bias0", lambda x: _f32(x).reshape(1)),
    }
    for src, (dst, fn) in simple.items():
        if src in sd:
            put(dst, fn(take(src)))
    scales = sorted(k for k in sd if re.match(rf"{re.escape(H)}scales\.\d+\.scale", k))
    if scales:
        put("head/scales", np.concatenate([_f32(take(k)).reshape(1) for k in scales]))
    for tl in ("rpn.tunable_linear.weight", H + "tunable_linear.weight"):
        if tl in sd:
            put("tunable_linear/weight", _f32(take(tl)))

    # ---- LPI pools (present in LPI-trained checkpoints) ----------------
    def stack_pool(pattern, path, fn=_f32):
        keys = {}
        for k in sd:
            m = re.match(pattern, k)
            if m:
                keys[int(m.group(1))] = k
        if keys:
            n = max(keys) + 1
            arrs = [fn(take(keys[t])) for t in range(n)]
            put(path, np.stack(arrs))

    stack_pool(r"prompts\.(\d+)\.dim_1_share", "prompts/d1_share")
    stack_pool(r"prompts\.(\d+)\.dim_2_visual", "prompts/d2_visual")
    stack_pool(r"prompts\.(\d+)\.dim_2_textual", "prompts/d2_textual")
    stack_pool(r"prompts\.(\d+)\.dim_3_visual", "prompts/d3_visual")
    stack_pool(r"prompts\.(\d+)\.dim_3_textual", "prompts/d3_textual")
    I = r"language_backbone\.body\.model\.encoder\.interactModuleList\."
    for short, mine in (("dim_1_v2t", "d1_v2t"), ("dim_2_v2t", "d2_v2t"),
                        ("dim_3_v2t", "d3_v2t"), ("dim_1_t2v", "d1_t2v"),
                        ("dim_2_t2v", "d2_t2v"), ("dim_3_t2v", "d3_t2v")):
        stack_pool(I + rf"(\d+)\.{short}", f"encoder/interact/{mine}")
    stack_pool(I + r"(\d+)\.visual_norm\.weight", "encoder/interact/visual_norm_scale")
    stack_pool(I + r"(\d+)\.visual_norm\.bias", "encoder/interact/visual_norm_bias")
    stack_pool(I + r"(\d+)\.textual_norm\.weight", "encoder/interact/textual_norm_scale")
    stack_pool(I + r"(\d+)\.textual_norm\.bias", "encoder/interact/textual_norm_bias")

    unmapped = [k for k in sd if k not in used]
    return out, unmapped


def merge_into_params(params: Dict, flat_converted: Dict[tuple, np.ndarray],
                      strict_shapes: bool = True) -> Dict:
    """Overlay converted leaves onto an initialized param tree
    (`model_serialization.load_state_dict` partial-match behavior)."""
    from flax import traverse_util
    from flax.core import unfreeze

    flat = traverse_util.flatten_dict(unfreeze(params))
    loaded, skipped = 0, []
    for k, v in flat_converted.items():
        if k in flat:
            if flat[k].shape != v.shape:
                if strict_shapes:
                    raise ValueError(f"shape mismatch at {'/'.join(k)}: "
                                     f"{flat[k].shape} vs {v.shape}")
                skipped.append(k)
                continue
            flat[k] = v
            loaded += 1
        else:
            skipped.append(k)
    return traverse_util.unflatten_dict(flat)

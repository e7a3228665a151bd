"""Structural tests for the GLIP checkpoint converter: a synthetic
maskrcnn-style state dict must map onto every matching leaf of the Flax
grounding model, and the merged model must run."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util
from flax.core import unfreeze

from lpi_tpu.models.glip.convert import convert_glip, merge_into_params
from lpi_tpu.models.glip.grounding import GroundedVLModel
from tests.test_grounding import TINY as _TINY_BASE

import dataclasses

# this suite's synthetic state dict uses the GN-FPN layout and a 1-channel
# cls head, exercising the USE_GN converter surface; the plain conv+bias
# layout (the LPI configs' actual one) is covered against the REAL
# checkpoint namespace by tests/test_manifest_coverage.py
TINY = dataclasses.replace(
    _TINY_BASE, fpn_use_gn=True,
    dyhead=dataclasses.replace(_TINY_BASE.dyhead, num_classes=2))


def synthetic_glip_sd(cfg, rng):
    """Correctly-shaped torch-style GLIP-T state dict for the tiny config."""
    sd = {}
    C0 = cfg.swin.embed_dim
    sd["module.backbone.body.patch_embed.proj.weight"] = rng.randn(C0, 3, 4, 4)
    sd["module.backbone.body.patch_embed.proj.bias"] = rng.randn(C0)
    sd["module.backbone.body.patch_embed.norm.weight"] = rng.randn(C0)
    sd["module.backbone.body.patch_embed.norm.bias"] = rng.randn(C0)
    for s, depth in enumerate(cfg.swin.depths):
        C = C0 * 2 ** s
        ws = cfg.swin.window_size
        for b in range(depth):
            p = f"module.backbone.body.layers.{s}.blocks.{b}."
            sd[p + "norm1.weight"] = rng.randn(C)
            sd[p + "norm1.bias"] = rng.randn(C)
            sd[p + "norm2.weight"] = rng.randn(C)
            sd[p + "norm2.bias"] = rng.randn(C)
            sd[p + "attn.relative_position_bias_table"] = rng.randn(
                (2 * ws - 1) ** 2, cfg.swin.num_heads[s])
            sd[p + "attn.relative_position_index"] = np.zeros((ws * ws, ws * ws))
            sd[p + "attn.qkv.weight"] = rng.randn(3 * C, C)
            sd[p + "attn.qkv.bias"] = rng.randn(3 * C)
            sd[p + "attn.proj.weight"] = rng.randn(C, C)
            sd[p + "attn.proj.bias"] = rng.randn(C)
            sd[p + "mlp.fc1.weight"] = rng.randn(4 * C, C)
            sd[p + "mlp.fc1.bias"] = rng.randn(4 * C)
            sd[p + "mlp.fc2.weight"] = rng.randn(C, 4 * C)
            sd[p + "mlp.fc2.bias"] = rng.randn(C)
        if s < len(cfg.swin.depths) - 1:
            p = f"module.backbone.body.layers.{s}.downsample."
            sd[p + "norm.weight"] = rng.randn(4 * C)
            sd[p + "norm.bias"] = rng.randn(4 * C)
            sd[p + "reduction.weight"] = rng.randn(2 * C, 4 * C)
        if s > 0:  # stage 0's out norm is nn.Identity under RETINANET
            sd[f"module.backbone.body.norm{s}.weight"] = rng.randn(C)
            sd[f"module.backbone.body.norm{s}.bias"] = rng.randn(C)

    D = cfg.bert.hidden_size
    L = "module.language_backbone.body.model."
    sd[L + "embeddings.word_embeddings.weight"] = rng.randn(cfg.bert.vocab_size, D)
    sd[L + "embeddings.position_embeddings.weight"] = rng.randn(
        cfg.bert.max_position_embeddings, D)
    sd[L + "embeddings.token_type_embeddings.weight"] = rng.randn(2, D)
    sd[L + "embeddings.LayerNorm.weight"] = rng.randn(D)
    sd[L + "embeddings.LayerNorm.bias"] = rng.randn(D)
    for i in range(cfg.bert.num_layers):
        p = L + f"encoder.layer.{i}."
        for qkv in ("query", "key", "value"):
            sd[p + f"attention.self.{qkv}.weight"] = rng.randn(D, D)
            sd[p + f"attention.self.{qkv}.bias"] = rng.randn(D)
        sd[p + "attention.output.dense.weight"] = rng.randn(D, D)
        sd[p + "attention.output.dense.bias"] = rng.randn(D)
        sd[p + "attention.output.LayerNorm.weight"] = rng.randn(D)
        sd[p + "attention.output.LayerNorm.bias"] = rng.randn(D)
        sd[p + "intermediate.dense.weight"] = rng.randn(cfg.bert.intermediate_size, D)
        sd[p + "intermediate.dense.bias"] = rng.randn(cfg.bert.intermediate_size)
        sd[p + "output.dense.weight"] = rng.randn(D, cfg.bert.intermediate_size)
        sd[p + "output.dense.bias"] = rng.randn(D)
        sd[p + "output.LayerNorm.weight"] = rng.randn(D)
        sd[p + "output.LayerNorm.bias"] = rng.randn(D)

    ch = cfg.dyhead.channels
    ins = [C0 * 2, C0 * 4, C0 * 8]
    for idx, cin in zip((2, 3, 4), ins):
        sd[f"module.backbone.fpn.fpn_inner{idx}.0.weight"] = rng.randn(ch, cin, 1, 1)
        sd[f"module.backbone.fpn.fpn_inner{idx}.1.weight"] = rng.randn(ch)
        sd[f"module.backbone.fpn.fpn_inner{idx}.1.bias"] = rng.randn(ch)
        sd[f"module.backbone.fpn.fpn_layer{idx}.0.weight"] = rng.randn(ch, ch, 3, 3)
        sd[f"module.backbone.fpn.fpn_layer{idx}.1.weight"] = rng.randn(ch)
        sd[f"module.backbone.fpn.fpn_layer{idx}.1.bias"] = rng.randn(ch)
    sd["module.backbone.fpn.top_blocks.p6.weight"] = rng.randn(ch, ch, 3, 3)
    sd["module.backbone.fpn.top_blocks.p6.bias"] = rng.randn(ch)
    sd["module.backbone.fpn.top_blocks.p7.weight"] = rng.randn(ch, ch, 3, 3)
    sd["module.backbone.fpn.top_blocks.p7.bias"] = rng.randn(ch)

    H = "module.rpn.head."
    for i in range(cfg.dyhead.num_convs):
        cin = ch
        p = H + f"dyhead_tower.{i}."
        for j in range(3):
            sd[p + f"DyConv.{j}.conv.weight"] = rng.randn(ch, cin, 3, 3)
            sd[p + f"DyConv.{j}.conv.bias"] = rng.randn(ch)
            sd[p + f"DyConv.{j}.bn.weight"] = rng.randn(ch)
            sd[p + f"DyConv.{j}.bn.bias"] = rng.randn(ch)
        sd[p + "offset.weight"] = rng.randn(27, cin, 3, 3)
        sd[p + "offset.bias"] = rng.randn(27)
        sd[p + "AttnConv.1.weight"] = rng.randn(1, cin, 1, 1)
        sd[p + "AttnConv.1.bias"] = rng.randn(1)
        sd[p + "relu.fc.0.weight"] = rng.randn(ch // 4, cin)
        sd[p + "relu.fc.0.bias"] = rng.randn(ch // 4)
        sd[p + "relu.fc.2.weight"] = rng.randn(4 * ch, ch // 4)
        sd[p + "relu.fc.2.bias"] = rng.randn(4 * ch)
    sd[H + "cls_logits.weight"] = rng.randn(1, ch, 1, 1)
    sd[H + "cls_logits.bias"] = rng.randn(1)
    sd[H + "bbox_pred.weight"] = rng.randn(4, ch, 1, 1)
    sd[H + "bbox_pred.bias"] = rng.randn(4)
    sd[H + "centerness.weight"] = rng.randn(1, ch, 1, 1)
    sd[H + "centerness.bias"] = rng.randn(1)
    for l in range(5):
        sd[H + f"scales.{l}.scale"] = rng.randn(1)
    sd[H + "dot_product_projection_text.weight"] = rng.randn(ch, D)
    sd[H + "dot_product_projection_text.bias"] = rng.randn(ch)
    sd[H + "log_scale"] = rng.randn(1)
    sd[H + "bias_lang"] = rng.randn(D)
    sd[H + "bias0"] = rng.randn(1)
    sd["module.rpn.tunable_linear.weight"] = rng.randn(1000, D)
    return {k: v.astype(np.float32) for k, v in sd.items()}


class TestGlipConvert:
    @pytest.fixture(scope="class")
    def converted(self):
        rng = np.random.RandomState(0)
        sd = synthetic_glip_sd(TINY, rng)
        flat, unmapped = convert_glip(sd)
        return sd, flat, unmapped

    def test_everything_mapped(self, converted):
        _, flat, unmapped = converted
        assert unmapped == [], unmapped[:10]
        assert len(flat) > 100

    def test_covers_model_backbone_leaves(self, converted):
        _, flat, _ = converted
        model = GroundedVLModel(TINY)
        shapes = jax.eval_shape(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16)), 0))
        model_flat = traverse_util.flatten_dict(unfreeze(shapes["params"]))
        missing_shape = []
        for k, v in flat.items():
            assert k in model_flat, f"converted key not in model: {'/'.join(k)}"
            if tuple(model_flat[k].shape) != tuple(v.shape):
                missing_shape.append(("/".join(k), model_flat[k].shape, v.shape))
        assert not missing_shape, missing_shape[:5]
        # every frozen-tower leaf must have a source (prompts/interact excluded)
        uncovered = [
            "/".join(k) for k in model_flat
            if k not in flat
            and not any(s in "/".join(k) for s in ("prompts", "interact"))
        ]
        assert uncovered == [], uncovered[:10]

    @pytest.mark.slow  # full tiny-GLIP init + forward compile
    def test_merged_model_runs(self, converted):
        _, flat, _ = converted
        model = GroundedVLModel(TINY)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                               jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16)), 0)
        params = merge_into_params(variables["params"], flat)
        out, language, vis_p, txt_p = model.apply(
            {"params": params}, jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16)), 0)
        assert np.isfinite(np.asarray(out["bbox_pred"])).all()

    def test_lpi_pools_stacked(self):
        rng = np.random.RandomState(1)
        sd = {
            "prompts.0.dim_1_share": rng.randn(9, 4).astype(np.float32),
            "prompts.1.dim_1_share": rng.randn(9, 4).astype(np.float32),
        }
        flat, unmapped = convert_glip(sd)
        assert flat[("prompts", "d1_share")].shape == (2, 9, 4)
        assert unmapped == []

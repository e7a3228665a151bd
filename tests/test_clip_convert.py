"""Numerical parity: Flax CLIP with converted weights vs a torch oracle.

The oracle is an independent minimal torch implementation of OpenAI CLIP's
published forward math, fed the same (synthetic, correctly-shaped) state
dict. Catches conversion transposes, LayerNorm placement, attention-layout
and EOT-pooling mistakes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lpi_tpu.core.config import CLIPConfig
from lpi_tpu.models.clip import CLIP
from lpi_tpu.models.clip.convert import convert_openai_clip, synthetic_state_dict

CFG = CLIPConfig(
    image_resolution=32, patch_size=16, vision_width=64, vision_layers=2,
    vision_heads=4, text_width=32, text_layers=2, text_heads=4,
    vocab_size=96, context_length=12, embed_dim=24, n_ctx=4)


def torch_block(x, sd, p, heads, causal):
    """One pre-LN resblock, [S, B, D] layout like the reference."""
    S, B, D = x.shape
    h = F.layer_norm(x, (D,), sd[f"{p}.ln_1.weight"], sd[f"{p}.ln_1.bias"])
    qkv = F.linear(h, sd[f"{p}.attn.in_proj_weight"], sd[f"{p}.attn.in_proj_bias"])
    q, k, v = qkv.chunk(3, dim=-1)

    def split(t):  # [S,B,D] -> [B*H, S, hd]
        return t.contiguous().view(S, B * heads, D // heads).transpose(0, 1)

    q, k, v = split(q), split(k), split(v)
    attn = (q @ k.transpose(-2, -1)) / (D // heads) ** 0.5
    if causal:
        mask = torch.full((S, S), float("-inf")).triu(1)
        attn = attn + mask
    out = attn.softmax(-1) @ v  # [B*H, S, hd]
    out = out.transpose(0, 1).contiguous().view(S, B, D)
    out = F.linear(out, sd[f"{p}.attn.out_proj.weight"], sd[f"{p}.attn.out_proj.bias"])
    x = x + out
    h = F.layer_norm(x, (D,), sd[f"{p}.ln_2.weight"], sd[f"{p}.ln_2.bias"])
    h = F.linear(h, sd[f"{p}.mlp.c_fc.weight"], sd[f"{p}.mlp.c_fc.bias"])
    h = h * torch.sigmoid(1.702 * h)
    h = F.linear(h, sd[f"{p}.mlp.c_proj.weight"], sd[f"{p}.mlp.c_proj.bias"])
    return x + h


def torch_encode_image(images_nchw, sd, cfg):
    x = F.conv2d(images_nchw, sd["visual.conv1.weight"], stride=cfg.patch_size)
    B, D, g, _ = x.shape
    x = x.reshape(B, D, g * g).permute(0, 2, 1)
    cls = sd["visual.class_embedding"].expand(B, 1, D)
    x = torch.cat([cls, x], dim=1) + sd["visual.positional_embedding"]
    x = F.layer_norm(x, (D,), sd["visual.ln_pre.weight"], sd["visual.ln_pre.bias"])
    x = x.permute(1, 0, 2)
    for i in range(cfg.vision_layers):
        x = torch_block(x, sd, f"visual.transformer.resblocks.{i}", cfg.vision_heads, False)
    x = x.permute(1, 0, 2)
    x = F.layer_norm(x[:, 0], (D,), sd["visual.ln_post.weight"], sd["visual.ln_post.bias"])
    return x @ sd["visual.proj"]


def torch_encode_text(ids, sd, cfg):
    x = sd["token_embedding.weight"][ids] + sd["positional_embedding"][: ids.shape[1]]
    x = x.permute(1, 0, 2)
    for i in range(cfg.text_layers):
        x = torch_block(x, sd, f"transformer.resblocks.{i}", cfg.text_heads, True)
    x = x.permute(1, 0, 2)
    D = x.shape[-1]
    x = F.layer_norm(x, (D,), sd["ln_final.weight"], sd["ln_final.bias"])
    eot = ids.argmax(dim=-1)
    pooled = x[torch.arange(x.shape[0]), eot]
    return pooled @ sd["text_projection"]


@pytest.fixture(scope="module")
def setup():
    sd_np = synthetic_state_dict(CFG, seed=3)
    sd_t = {k: torch.tensor(np.asarray(v, np.float32)) for k, v in sd_np.items()}
    params = convert_openai_clip(sd_np)
    model = CLIP(CFG, jnp.float32)
    return model, params, sd_t


class TestConversionParity:
    def test_image_features_match(self, setup, rng):
        model, params, sd_t = setup
        images = rng.randn(3, 32, 32, 3).astype(np.float32)
        ours = model.apply({"params": params}, jnp.asarray(images),
                           method=model.encode_image)
        theirs = torch_encode_image(
            torch.tensor(images).permute(0, 3, 1, 2), sd_t, CFG)
        theirs = theirs / theirs.norm(dim=-1, keepdim=True)
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), atol=2e-3, rtol=1e-2)

    def test_text_features_match(self, setup, rng):
        model, params, sd_t = setup
        ids = rng.randint(1, 90, size=(3, 12)).astype(np.int32)
        ids[:, 0] = 1
        ids[:, 6] = 95  # EOT mid-sequence exercises argmax pooling
        ours = model.apply({"params": params}, jnp.asarray(ids),
                           method=model.encode_text)
        theirs = torch_encode_text(torch.tensor(ids, dtype=torch.long), sd_t, CFG)
        theirs = theirs / theirs.norm(dim=-1, keepdim=True)
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), atol=2e-3, rtol=1e-2)

    def test_logit_scale_roundtrip(self, setup):
        _, params, _ = setup
        assert float(params["logit_scale"]) == pytest.approx(4.6052, rel=1e-4)

    def test_rejects_garbage_keys(self):
        with pytest.raises((KeyError, ValueError)):
            convert_openai_clip({"visual.transformer.resblocks.0.attn.in_proj_weight":
                                 np.zeros((3, 3))})

"""Numerical parity of the Flax Swin block / BERT layer against independent
torch oracles implementing the published math, fed converted weights.

Complements tests/test_clip_convert.py: together they pin every tower's
numerics, so a real GLIP/CLIP checkpoint conversion is trustworthy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lpi_tpu.core.config import BertConfig
from lpi_tpu.models.glip.bert import BertLayer
from lpi_tpu.models.glip.swin import SwinBlock, relative_position_index


def torch_window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def torch_window_reverse(w, ws, B, H, W):
    C = w.shape[-1]
    x = w.view(B, H // ws, W // ws, ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def torch_swin_block(x, H, W, p, heads, ws, shift, mask_np):
    """Stock Swin block math (swint.py:145-248) on [B, H*W, C]."""
    B, L, C = x.shape
    shortcut = x
    x = F.layer_norm(x, (C,), p["norm1.scale"], p["norm1.bias"])
    x = x.view(B, H, W, C)
    Hp = (H + ws - 1) // ws * ws
    Wp = (W + ws - 1) // ws * ws
    x = F.pad(x, (0, 0, 0, Wp - W, 0, Hp - H))
    if shift:
        x = torch.roll(x, (-shift, -shift), dims=(1, 2))
    windows = torch_window_partition(x, ws)  # [nW*B, N, C]
    N = ws * ws
    qkv = F.linear(windows, p["attn.qkv.kernel"].T, p["attn.qkv.bias"])
    q, k, v = qkv.chunk(3, dim=-1)

    def split(t):
        return t.view(-1, N, heads, C // heads).permute(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    attn = (q @ k.transpose(-2, -1)) / (C // heads) ** 0.5
    idx = torch.tensor(relative_position_index(ws).reshape(-1))
    bias = p["attn.relative_position_bias_table"][idx].view(N, N, heads)
    attn = attn + bias.permute(2, 0, 1)[None]
    if mask_np is not None:
        nW = mask_np.shape[0]
        m = torch.tensor(mask_np)
        attn = attn.view(-1, nW, heads, N, N) + m[None, :, None]
        attn = attn.view(-1, heads, N, N)
    out = attn.softmax(-1) @ v
    out = out.permute(0, 2, 1, 3).reshape(-1, N, C)
    out = F.linear(out, p["attn.proj.kernel"].T, p["attn.proj.bias"])
    x = torch_window_reverse(out, ws, B, Hp, Wp)
    if shift:
        x = torch.roll(x, (shift, shift), dims=(1, 2))
    x = x[:, :H, :W].reshape(B, L, C)
    x = shortcut + x
    h = F.layer_norm(x, (C,), p["norm2.scale"], p["norm2.bias"])
    h = F.linear(h, p["mlp.fc1.kernel"].T, p["mlp.fc1.bias"])
    h = F.gelu(h)
    h = F.linear(h, p["mlp.fc2.kernel"].T, p["mlp.fc2.bias"])
    return x + h


def _torchify(params, prefix=""):
    out = {}
    for k, v in params.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            out.update(_torchify(v, key))
        else:
            out[key] = torch.tensor(np.asarray(v, np.float32))
    return out


class TestSwinBlockParity:
    @pytest.mark.parametrize("shift,H,W", [(0, 8, 8), (2, 8, 12), (2, 10, 6)])
    def test_matches_torch(self, rng, shift, H, W):
        C, heads, ws = 16, 2, 4
        block = SwinBlock(dim=C, num_heads=heads, window_size=ws, shift=shift)
        x = jnp.asarray(rng.randn(2, H * W, C).astype(np.float32))
        variables = block.init(jax.random.PRNGKey(0), x, H, W)
        ours = np.asarray(block.apply(variables, x, H, W))

        p = _torchify(variables["params"])
        from lpi_tpu.models.glip.swin import shifted_window_mask

        Hp = (H + ws - 1) // ws * ws
        Wp = (W + ws - 1) // ws * ws
        mask = shifted_window_mask(Hp, Wp, ws, shift) if shift else None
        theirs = torch_swin_block(torch.tensor(np.asarray(x)), H, W, p,
                                  heads, ws, shift, mask).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-4)


def torch_bert_layer(x, mask, p):
    """HF post-LN BertLayer math."""
    B, S, D = x.shape
    heads = 2

    def lin(name, t):
        return F.linear(t, p[f"{name}.kernel"].T, p[f"{name}.bias"])

    q = lin("attention.query", x).view(B, S, heads, D // heads).permute(0, 2, 1, 3)
    k = lin("attention.key", x).view(B, S, heads, D // heads).permute(0, 2, 1, 3)
    v = lin("attention.value", x).view(B, S, heads, D // heads).permute(0, 2, 1, 3)
    attn = (q @ k.transpose(-2, -1)) / (D // heads) ** 0.5
    attn = attn + (1 - mask[:, None, None, :]) * -10000.0
    out = attn.softmax(-1) @ v
    out = out.permute(0, 2, 1, 3).reshape(B, S, D)
    out = lin("attention_output", out)
    x = F.layer_norm(x + out, (D,), p["attention_norm.scale"],
                     p["attention_norm.bias"], eps=1e-12)
    h = F.gelu(lin("intermediate", x))
    h = lin("output", h)
    return F.layer_norm(x + h, (D,), p["output_norm.scale"],
                        p["output_norm.bias"], eps=1e-12)


class TestBertLayerParity:
    def test_matches_torch(self, rng):
        cfg = BertConfig(vocab_size=64, hidden_size=16, num_layers=1,
                         num_heads=2, intermediate_size=32,
                         max_position_embeddings=32)
        layer = BertLayer(cfg)
        x = jnp.asarray(rng.randn(2, 10, 16).astype(np.float32))
        mask_np = np.ones((2, 10), np.float32)
        mask_np[1, 6:] = 0
        variables = layer.init(jax.random.PRNGKey(0), x, jnp.asarray(mask_np))
        ours = np.asarray(layer.apply(variables, x, jnp.asarray(mask_np)))
        p = _torchify(variables["params"])
        theirs = torch_bert_layer(torch.tensor(np.asarray(x)),
                                  torch.tensor(mask_np), p).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-4)

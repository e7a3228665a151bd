"""OpenAI CLIP checkpoint -> lpi_tpu param-tree converter.

Maps a torch CLIP state dict (the format produced by
`torch.jit.load(...).state_dict()` / `torch.load`, as consumed by the
reference's `load_clip_to_cpu`, `retrieval/models/clip/prompt_learner.py:10`
and `clip/model.py:418 build_model`) into this framework's Flax layout:

* per-layer resblock weights are STACKED along a leading layer axis (our
  towers run as one `nn.scan`);
* torch Linear weights `[out, in]` transpose to Flax kernels `[in, out]`;
* the patch conv `[out, in, kh, kw]` permutes to HWIO;
* fp16 weights are upcast to fp32 (compute casts to bf16 at apply time,
  replacing the reference's `convert_weights` fp16 policy, model.py:394-415).

Works from an in-memory `{name: np.ndarray}` dict so tests can use synthetic
state dicts; `load_torch_clip` wraps torch.load for real checkpoints.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _f32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _stack_blocks(sd: Mapping[str, np.ndarray], prefix: str, layers: int) -> Dict:
    """Stack resblock params across layers for the scanned tower."""

    def get(i, name):
        return _f32(sd[f"{prefix}.resblocks.{i}.{name}"])

    block = {
        "attn": {
            "in_proj": {
                "kernel": np.stack([get(i, "attn.in_proj_weight").T for i in range(layers)]),
                "bias": np.stack([get(i, "attn.in_proj_bias") for i in range(layers)]),
            },
            "out_proj": {
                "kernel": np.stack([get(i, "attn.out_proj.weight").T for i in range(layers)]),
                "bias": np.stack([get(i, "attn.out_proj.bias") for i in range(layers)]),
            },
        },
        "ln_1": {
            "scale": np.stack([get(i, "ln_1.weight") for i in range(layers)]),
            "bias": np.stack([get(i, "ln_1.bias") for i in range(layers)]),
        },
        "ln_2": {
            "scale": np.stack([get(i, "ln_2.weight") for i in range(layers)]),
            "bias": np.stack([get(i, "ln_2.bias") for i in range(layers)]),
        },
        "mlp_c_fc": {
            "kernel": np.stack([get(i, "mlp.c_fc.weight").T for i in range(layers)]),
            "bias": np.stack([get(i, "mlp.c_fc.bias") for i in range(layers)]),
        },
        "mlp_c_proj": {
            "kernel": np.stack([get(i, "mlp.c_proj.weight").T for i in range(layers)]),
            "bias": np.stack([get(i, "mlp.c_proj.bias") for i in range(layers)]),
        },
    }
    return {"block": block}


def convert_openai_clip(sd: Mapping[str, np.ndarray]) -> Dict:
    """Convert a torch CLIP state dict to the `CLIP` module's param tree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    vision_layers = 1 + max(
        int(k.split(".")[3]) for k in sd if k.startswith("visual.transformer.resblocks."))
    text_layers = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("transformer.resblocks."))

    params = {
        "visual": {
            "conv1": {"kernel": _f32(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)},
            "class_embedding": _f32(sd["visual.class_embedding"]),
            "positional_embedding": _f32(sd["visual.positional_embedding"]),
            "ln_pre": {
                "scale": _f32(sd["visual.ln_pre.weight"]),
                "bias": _f32(sd["visual.ln_pre.bias"]),
            },
            "transformer": _stack_blocks(sd, "visual.transformer", vision_layers),
            "ln_post": {
                "scale": _f32(sd["visual.ln_post.weight"]),
                "bias": _f32(sd["visual.ln_post.bias"]),
            },
            "proj": _f32(sd["visual.proj"]),
        },
        "text": {
            "positional_embedding": _f32(sd["positional_embedding"]),
            "transformer": _stack_blocks(sd, "transformer", text_layers),
            "ln_final": {
                "scale": _f32(sd["ln_final.weight"]),
                "bias": _f32(sd["ln_final.bias"]),
            },
            "text_projection": _f32(sd["text_projection"]),
        },
        "token_embedding": _f32(sd["token_embedding.weight"]),
        "logit_scale": _f32(sd["logit_scale"]),
    }
    return params


def load_torch_clip(path: str) -> Dict:
    """Load a CLIP .pt checkpoint (jit archive or plain state dict)."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    return convert_openai_clip({k: v.numpy() for k, v in sd.items()})


def synthetic_state_dict(cfg, seed: int = 0) -> Dict[str, np.ndarray]:
    """A correctly-shaped fake OpenAI state dict (tests / offline runs)."""
    r = np.random.RandomState(seed)
    c = cfg
    grid = c.image_resolution // c.patch_size
    sd = {
        "visual.conv1.weight": r.randn(c.vision_width, 3, c.patch_size, c.patch_size),
        "visual.class_embedding": r.randn(c.vision_width),
        "visual.positional_embedding": r.randn(grid * grid + 1, c.vision_width),
        "visual.ln_pre.weight": np.ones(c.vision_width),
        "visual.ln_pre.bias": np.zeros(c.vision_width),
        "visual.ln_post.weight": np.ones(c.vision_width),
        "visual.ln_post.bias": np.zeros(c.vision_width),
        "visual.proj": r.randn(c.vision_width, c.embed_dim),
        "positional_embedding": r.randn(c.context_length, c.text_width),
        "ln_final.weight": np.ones(c.text_width),
        "ln_final.bias": np.zeros(c.text_width),
        "text_projection": r.randn(c.text_width, c.embed_dim),
        "token_embedding.weight": r.randn(c.vocab_size, c.text_width),
        "logit_scale": np.asarray(4.6052),
    }
    for prefix, layers, width in (
        ("visual.transformer", c.vision_layers, c.vision_width),
        ("transformer", c.text_layers, c.text_width),
    ):
        for i in range(layers):
            p = f"{prefix}.resblocks.{i}"
            sd[f"{p}.attn.in_proj_weight"] = r.randn(3 * width, width) * 0.02
            sd[f"{p}.attn.in_proj_bias"] = np.zeros(3 * width)
            sd[f"{p}.attn.out_proj.weight"] = r.randn(width, width) * 0.02
            sd[f"{p}.attn.out_proj.bias"] = np.zeros(width)
            sd[f"{p}.ln_1.weight"] = np.ones(width)
            sd[f"{p}.ln_1.bias"] = np.zeros(width)
            sd[f"{p}.ln_2.weight"] = np.ones(width)
            sd[f"{p}.ln_2.bias"] = np.zeros(width)
            sd[f"{p}.mlp.c_fc.weight"] = r.randn(4 * width, width) * 0.02
            sd[f"{p}.mlp.c_fc.bias"] = np.zeros(4 * width)
            sd[f"{p}.mlp.c_proj.weight"] = r.randn(width, 4 * width) * 0.02
            sd[f"{p}.mlp.c_proj.bias"] = np.zeros(width)
    return {k: v.astype(np.float16) for k, v in sd.items()}

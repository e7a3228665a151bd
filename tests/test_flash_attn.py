"""Flash-attention parity: `ops/flash_attn.flash_mha` (Pallas TPU kernel,
run here under `pltpu.force_tpu_interpret_mode()`) must match the model's
default XLA path (`jax.nn.dot_product_attention`) in values AND gradients,
including the seq-padding + segment-mask handling for non-multiple-of-128
sequence lengths (the ViT's 213-token stream)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpi_tpu.ops.flash_attn import flash_mha

pytestmark = pytest.mark.fast


def _xla_ref(q, k, v, causal):
    mask = None
    if causal:
        S = q.shape[1]
        mask = jnp.tril(jnp.ones((S, S), dtype=bool))[None, None]
    return jax.nn.dot_product_attention(q, k, v, mask=mask, is_causal=False)


def _rand_qkv(rng, B, S, H, Dh):
    return tuple(jnp.asarray(rng.randn(B, S, H, Dh), jnp.float32)
                 for _ in range(3))


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("S", [13, 77])
def test_forward_parity(causal, S):
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    q, k, v = _rand_qkv(rng, 2, S, 2, 64)
    ref = _xla_ref(q, k, v, causal)
    with pltpu.force_tpu_interpret_mode():
        out = flash_mha(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradient_parity():
    """Padded-position handling must not leak into gradients."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(1)
    q, k, v = _rand_qkv(rng, 1, 13, 2, 64)
    w = jnp.asarray(rng.randn(1, 13, 2, 64), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_ref(q, k, v, False) * w)

    def loss_flash(q, k, v):
        return jnp.sum(flash_mha(q, k, v, causal=False) * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_model_path_uses_flash():
    """CLIPConfig.attn_impl='flash' must produce the same features as the
    default XLA path on an identical tiny tower (interpret mode)."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    from lpi_tpu.core.config import CLIPConfig
    from lpi_tpu.models.clip.model import CLIP

    base = CLIPConfig(image_resolution=32, patch_size=16, vision_width=64,
                      vision_layers=2, vision_heads=1, text_width=64,
                      text_layers=2, text_heads=1, vocab_size=128,
                      context_length=16, embed_dim=32, n_ctx=4)
    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    ids = jnp.asarray(rng.randint(1, 100, size=(2, 16)), jnp.int32)
    ids = ids.at[:, -1].set(127)

    model_x = CLIP(base, dtype=jnp.float32)
    params = model_x.init(jax.random.PRNGKey(0), images, ids)["params"]
    img_x, txt_x, _ = model_x.apply({"params": params}, images, ids)

    model_f = CLIP(dataclasses.replace(base, attn_impl="flash"),
                   dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        img_f, txt_f, _ = model_f.apply({"params": params}, images, ids)
    np.testing.assert_allclose(np.asarray(img_f), np.asarray(img_x),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(txt_f), np.asarray(txt_x),
                               rtol=2e-4, atol=2e-4)

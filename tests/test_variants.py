"""Prompt-variant coverage: MaPLe / S-Prompts grounding, maple replace
semantics in the fused encoder."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_grounding import TINY
from lpi_tpu.models.glip.grounding import GroundedVLModel
from lpi_tpu.prompts.pools import MaPLePromptPool


class TestMaPLePool:
    def test_visual_projected_from_textual(self, rng):
        m = MaPLePromptPool(num_tasks=2, layer_num=3, prompt_num=4,
                            visual_dim=8, textual_dim=16)
        v = m.init(jax.random.PRNGKey(0), 0)
        vis, txt = m.apply(v, 1)
        assert vis.shape == (3, 4, 8) and txt.shape == (3, 4, 16)
        p = v["params"]
        expected = np.einsum("lpt,ltv->lpv", p["textual"][1], p["proj_kernel"][1])
        expected = expected + np.asarray(p["proj_bias"][1])[:, None, :]
        np.testing.assert_allclose(np.asarray(vis), expected, atol=1e-5)

    def test_all_prompts_consistent(self, rng):
        m = MaPLePromptPool(num_tasks=3, layer_num=2, prompt_num=4,
                            visual_dim=8, textual_dim=16)
        v = m.init(jax.random.PRNGKey(1), 0)
        all_vis, all_txt = m.apply(v, method=m.all_prompts)
        vis2, txt2 = m.apply(v, 2)
        np.testing.assert_allclose(np.asarray(all_vis[2]), np.asarray(vis2), atol=1e-5)


@pytest.mark.slow  # two full tiny-GLIP init+forward compiles
@pytest.mark.parametrize("variant", ["maple", "sprompts"])
def test_grounding_model_variant_forward(variant, rng):
    cfg = dataclasses.replace(
        TINY, lpi=dataclasses.replace(
            TINY.lpi, prompt_type=variant,
            interact_type="maple" if variant == "maple" else "linear",
            interact=False))
    m = GroundedVLModel(cfg)
    images = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    ids = jnp.asarray(rng.randint(1, 500, size=(1, 16)).astype(np.int32))
    mask = jnp.ones((1, 16))
    variables = m.init(jax.random.PRNGKey(0), images, ids, mask, 0)
    flat, language, vis_p, txt_p = m.apply(variables, images, ids, mask, 0)
    assert np.isfinite(np.asarray(flat["dot_logits"])).all()
    assert vis_p.shape == (9, 4, 8)


class TestMlmMasking:
    def test_random_word_policy(self):
        from lpi_tpu.data.mlm import IGNORE_INDEX, random_word

        rng = np.random.RandomState(0)
        ids = np.asarray([[101] + list(range(200, 260)) + [102]])
        masked, labels = random_word(ids, rng, mask_token_id=103, vocab_size=512)
        assert masked.shape == ids.shape
        # specials untouched
        assert masked[0, 0] == 101 and masked[0, -1] == 102
        assert labels[0, 0] == IGNORE_INDEX
        sel = labels[0] != IGNORE_INDEX
        assert 0 < sel.sum() < ids.shape[1]  # ~15% masked
        np.testing.assert_array_equal(labels[0][sel], ids[0][sel])
        assert (masked[0][sel] == 103).sum() > 0  # most become [MASK]

    def test_deterministic_under_seed(self):
        from lpi_tpu.data.mlm import random_word

        ids = np.arange(200, 232).reshape(1, -1)
        a = random_word(ids, np.random.RandomState(7), 103, 512)
        b = random_word(ids, np.random.RandomState(7), 103, 512)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])


class TestVLFuse:
    def test_biattention_shapes_and_mask(self, rng):
        from lpi_tpu.models.glip.vlfuse import BiAttentionBlock

        m = BiAttentionBlock(v_dim=16, l_dim=16, embed_dim=32, num_heads=4)
        v = jnp.asarray(rng.randn(2, 20, 16).astype(np.float32))
        l = jnp.asarray(rng.randn(2, 8, 16).astype(np.float32))
        mask = np.ones((2, 8), np.float32)
        mask[0, 5:] = 0
        variables = m.init(jax.random.PRNGKey(0), v, l, jnp.asarray(mask))
        vo, lo = m.apply(variables, v, l, jnp.asarray(mask))
        assert vo.shape == v.shape and lo.shape == l.shape
        # padded language tokens cannot influence the visual stream
        l2 = l.at[0, 6].set(50.0)
        vo2, _ = m.apply(variables, v, l2, jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(vo[0]), np.asarray(vo2[0]), atol=1e-5)

    def test_vlfuse_roundtrip_levels(self, rng):
        from lpi_tpu.models.glip.vlfuse import VLFuse

        m = VLFuse(v_dim=16, l_dim=16, embed_dim=32, num_heads=4)
        feats = [jnp.asarray(rng.randn(2, 4, 4, 16).astype(np.float32)),
                 jnp.asarray(rng.randn(2, 2, 2, 16).astype(np.float32))]
        hidden = jnp.asarray(rng.randn(2, 8, 16).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), feats, hidden)
        outs, new_hidden = m.apply(variables, feats, hidden)
        assert outs[0].shape == (2, 4, 4, 16)
        assert outs[1].shape == (2, 2, 2, 16)
        assert new_hidden.shape == hidden.shape
        assert not np.allclose(np.asarray(outs[0]), np.asarray(feats[0]), atol=1e-5)

    @pytest.mark.slow  # full tiny-GLIP init+forward compile
    def test_early_fuse_grounding_forward(self, rng):
        cfg = dataclasses.replace(
            TINY, dyhead=dataclasses.replace(TINY.dyhead, early_fuse=True,
                                             fuse_embed_dim=32, fuse_heads=4))
        m = GroundedVLModel(cfg)
        images = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        ids = jnp.asarray(rng.randint(1, 500, size=(1, 16)).astype(np.int32))
        mask = jnp.ones((1, 16))
        variables = m.init(jax.random.PRNGKey(0), images, ids, mask, 0)
        flat, *_ = m.apply(variables, images, ids, mask, 0)
        assert np.isfinite(np.asarray(flat["dot_logits"])).all()
        # fuse params exist in the tree
        assert any("fuse0" in "/".join(k) for k in
                   __import__("flax").traverse_util.flatten_dict(variables["params"]))

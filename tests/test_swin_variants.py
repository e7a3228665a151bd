"""Swin v2 (conv stem) and VL (language-aware) variant backbones."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpi_tpu.models.glip.swin_variants import (
    ConvEmbed,
    SwinTransformerV2,
    SwinTransformerVL,
)


class TestConvEmbed:
    def test_overlapping_stride4(self, rng):
        m = ConvEmbed(embed_dim=8)
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        out, h, w = m.apply(v, x)
        assert (h, w) == (16, 16)
        assert out.shape == (1, 256, 8)


class TestSwinV2:
    def test_stage_shapes(self, rng):
        m = SwinTransformerV2(embed_dim=8, depths=(2, 2), num_heads=(1, 2),
                              window_size=4, out_stages=(2, 3))
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(v, x)
        assert outs[0].shape == (1, 16, 16, 8)
        assert outs[1].shape == (1, 8, 8, 16)


class TestSwinVL:
    @pytest.fixture(scope="class")
    def built(self):
        m = SwinTransformerVL(embed_dim=8, depths=(2, 2), num_heads=(1, 2),
                              window_size=4, out_stages=(2, 3),
                              text_dim=16, max_text_len=8)
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
        txt = jnp.asarray(rng.randn(2, 8, 16).astype(np.float32))
        mask = jnp.ones((2, 8))
        v = m.init(jax.random.PRNGKey(0), img, txt, mask)
        return m, v, img, txt, mask

    def test_shapes_and_text_update(self, built):
        m, v, img, txt, mask = built
        outs, new_txt = m.apply(v, img, txt, mask)
        assert outs[0].shape == (2, 8, 8, 8)
        assert new_txt.shape == txt.shape
        assert not np.allclose(np.asarray(new_txt), np.asarray(txt))

    def test_text_changes_visual_features(self, built):
        """Language-aware windows: different text -> different image feats."""
        m, v, img, txt, mask = built
        outs1, _ = m.apply(v, img, txt, mask)
        outs2, _ = m.apply(v, img, txt * 2.0 + 1.0, mask)
        assert not np.allclose(np.asarray(outs1[0]), np.asarray(outs2[0]),
                               atol=1e-5)

    def test_text_mask_blocks_padding(self, built):
        """Masked text positions must not influence image features."""
        m, v, img, txt, mask = built
        mask2 = np.ones((2, 8), np.float32)
        mask2[:, 4:] = 0.0
        outs1, _ = m.apply(v, img, txt, jnp.asarray(mask2))
        txt2 = np.asarray(txt).copy()
        txt2[:, 6] = 99.0  # perturb a masked position
        outs2, _ = m.apply(v, img, jnp.asarray(txt2), jnp.asarray(mask2))
        np.testing.assert_allclose(np.asarray(outs1[0]), np.asarray(outs2[0]),
                                   atol=1e-5)

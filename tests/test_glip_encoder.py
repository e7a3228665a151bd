"""Tests for Swin, BERT, FPN, and the fused dual-tower encoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpi_tpu.core.config import BertConfig, LPIPromptConfig, SwinConfig
from lpi_tpu.models.glip.bert import BertEmbeddings, BertLayer
from lpi_tpu.models.glip.fpn import FPN
from lpi_tpu.models.glip.fused import (
    FusedDualEncoder,
    InteractModulePool,
    _corner_geometry,
)
from lpi_tpu.models.glip.swin import SwinTransformer, shifted_window_mask

SWIN = SwinConfig(patch_size=4, embed_dim=8, depths=(2, 2, 6, 2),
                  num_heads=(1, 2, 2, 2), window_size=4)
BERT = BertConfig(vocab_size=64, hidden_size=16, num_layers=12, num_heads=2,
                  intermediate_size=32, max_position_embeddings=32,
                  max_query_len=20)
LPI = LPIPromptConfig(prompt_length=4, prompt_depth=9, prompt_rank=2,
                      interact_rank=2, interact_depth=9)


class TestSwin:
    def test_window_mask_values(self):
        m = shifted_window_mask(8, 8, 4, 2)
        assert m.shape == (4, 16, 16)
        assert set(np.unique(m)) <= {0.0, -100.0}
        # top-left window has no cross-region pairs
        np.testing.assert_array_equal(m[0], 0)

    def test_full_tower_shapes(self, rng):
        m = SwinTransformer(patch_size=4, embed_dim=8, depths=(2, 2, 6, 2),
                            num_heads=(1, 2, 2, 2), window_size=4,
                            out_stages=(2, 3, 4, 5))
        x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(variables, x)
        assert len(outs) == 4
        assert outs[0].shape == (2, 16, 24, 8)    # stride 4
        assert outs[1].shape == (2, 8, 12, 16)    # stride 8
        assert outs[2].shape == (2, 4, 6, 32)     # stride 16
        assert outs[3].shape == (2, 2, 3, 64)     # stride 32

    def test_nonsquare_and_odd_sizes(self, rng):
        m = SwinTransformer(patch_size=4, embed_dim=8, depths=(2, 2),
                            num_heads=(1, 2), window_size=4, out_stages=(2, 3))
        x = jnp.asarray(rng.randn(1, 52, 36, 3).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(variables, x)
        assert outs[0].shape == (1, 13, 9, 8)
        assert outs[1].shape == (1, 7, 5, 16)


class TestBert:
    def test_layer_and_embeddings(self, rng):
        emb = BertEmbeddings(BERT)
        ids = jnp.asarray(rng.randint(0, 64, size=(2, 20)).astype(np.int32))
        ev = emb.init(jax.random.PRNGKey(0), ids)
        x = emb.apply(ev, ids)
        assert x.shape == (2, 20, 16)
        layer = BertLayer(BERT)
        mask = jnp.ones((2, 20))
        lv = layer.init(jax.random.PRNGKey(1), x, mask)
        y = layer.apply(lv, x, mask)
        assert y.shape == x.shape

    def test_attention_mask_blocks_padding(self, rng):
        layer = BertLayer(BERT)
        x = jnp.asarray(rng.randn(1, 20, 16).astype(np.float32))
        mask = np.ones((1, 20), np.float32)
        mask[0, 10:] = 0
        lv = layer.init(jax.random.PRNGKey(1), x, jnp.asarray(mask))
        y1 = layer.apply(lv, x, jnp.asarray(mask))
        x2 = x.at[:, 15].set(99.0)  # perturb masked position
        y2 = layer.apply(lv, x2, jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(y1[:, :10]), np.asarray(y2[:, :10]),
                                   atol=1e-5)


class TestFPN:
    def test_levels_and_shapes(self, rng):
        fpn = FPN(out_channels=16)
        feats = [
            jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32)),
            jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32)),
            jnp.asarray(rng.randn(2, 4, 4, 32).astype(np.float32)),
            jnp.asarray(rng.randn(2, 2, 2, 64).astype(np.float32)),
        ]
        variables = fpn.init(jax.random.PRNGKey(0), feats)
        outs = fpn.apply(variables, feats)
        assert len(outs) == 5  # P3..P7 (skips the 96ch stage)
        assert outs[0].shape == (2, 8, 8, 16)
        assert outs[1].shape == (2, 4, 4, 16)
        assert outs[2].shape == (2, 2, 2, 16)
        assert outs[3].shape == (2, 1, 1, 16)
        assert outs[4].shape == (2, 1, 1, 16)


class TestCornerGeometry:
    def test_reference_stage_shapes(self):
        # modeling_bert.py: 16 tokens @ 96ch -> 4x4 @96, 2x4 @192, 2x2 @384, 1x2 @768
        assert _corner_geometry(16, 96, 96) == (16, 4, 4)
        assert _corner_geometry(16, 96, 192) == (8, 2, 4)
        assert _corner_geometry(16, 96, 384) == (4, 2, 2)
        assert _corner_geometry(16, 96, 768) == (2, 1, 2)


class TestInteractPool:
    @pytest.fixture(scope="class")
    def pool(self):
        m = InteractModulePool(num_tasks=3, layer_num=12, visual_dim=8,
                               textual_dim=16, rank=2)
        v = jnp.zeros((2, 4, 8))
        t = jnp.zeros((2, 4, 16))
        variables = m.init(jax.random.PRNGKey(0), 0, v, t, 1)
        return m, variables

    def test_shapes_preserved(self, pool, rng):
        m, variables = pool
        v = jnp.asarray(rng.randn(2, 4, 8).astype(np.float32))
        t = jnp.asarray(rng.randn(2, 4, 16).astype(np.float32))
        vo, to = m.apply(variables, 1, v, t, 3)
        assert vo.shape == v.shape and to.shape == t.shape
        assert not np.allclose(np.asarray(vo), np.asarray(v))

    def test_task_and_layer_selectivity(self, pool, rng):
        m, variables = pool
        v = jnp.asarray(rng.randn(1, 4, 8).astype(np.float32))
        t = jnp.asarray(rng.randn(1, 4, 16).astype(np.float32))
        a = m.apply(variables, 0, v, t, 2)[0]
        b = m.apply(variables, 2, v, t, 2)[0]
        c = m.apply(variables, 0, v, t, 5)[0]
        assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        assert not np.allclose(np.asarray(a), np.asarray(c), atol=1e-5)

    def test_residual_blend_math(self, pool, rng):
        """Output = LN(0.9*x + 0.1*affine(other)) — check against manual."""
        m, variables = pool
        p = variables["params"]
        v = rng.randn(1, 4, 8).astype(np.float32)
        t = rng.randn(1, 4, 16).astype(np.float32)
        task, layer = 1, 4
        m_t2v = np.einsum("r,dr,er->de", p["d1_t2v"][task, layer],
                          p["d2_t2v"][task], p["d3_t2v"][task]) / 2
        new_v = t @ m_t2v[:16] + m_t2v[16:]
        pre = 0.9 * v + 0.1 * new_v
        mu = pre.mean(-1, keepdims=True)
        var = pre.var(-1, keepdims=True)
        expected = ((pre - mu) / np.sqrt(var + 1e-5) * p["visual_norm_scale"][task]
                    + p["visual_norm_bias"][task])
        got, _ = m.apply(variables, task, jnp.asarray(v), jnp.asarray(t), layer)
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)


class TestFusedEncoder:
    @pytest.fixture(scope="class")
    def encoder(self):
        m = FusedDualEncoder(swin_cfg=SWIN, bert_cfg=BERT, lpi_cfg=LPI, num_tasks=3)
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
        ids = jnp.asarray(rng.randint(1, 60, size=(2, 20)).astype(np.int32))
        mask = jnp.ones((2, 20))
        vis_p = jnp.asarray(rng.randn(9, 4, 8).astype(np.float32))
        txt_p = jnp.asarray(rng.randn(9, 4, 16).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), images, ids, mask,
                           vis_p, txt_p, 0)
        return m, variables, (images, ids, mask, vis_p, txt_p)

    def test_output_shapes(self, encoder):
        m, variables, (images, ids, mask, vis_p, txt_p) = encoder
        language, outs = m.apply(variables, images, ids, mask, vis_p, txt_p, 0)
        assert np.isfinite(np.asarray(language["aggregate"])).all()
        for o in outs:
            assert np.isfinite(np.asarray(o)).all()
        assert language["aggregate"].shape == (2, 16)
        assert language["embedded"].shape == (2, 20, 16)
        assert language["hidden"].shape == (2, 20, 16)
        assert len(outs) == 4
        assert outs[0].shape == (2, 16, 24, 8)
        assert outs[3].shape == (2, 2, 3, 64)

    def test_prompts_change_outputs(self, encoder):
        m, variables, (images, ids, mask, vis_p, txt_p) = encoder
        with_p, _ = m.apply(variables, images, ids, mask, vis_p, txt_p, 0)
        without, _ = m.apply(variables, images, ids, mask, None, None, 0)
        assert not np.allclose(np.asarray(with_p["aggregate"]),
                               np.asarray(without["aggregate"]), atol=1e-4)

    def test_task_changes_outputs(self, encoder):
        """Interact modules differ per task -> features differ."""
        m, variables, (images, ids, mask, vis_p, txt_p) = encoder
        a, _ = m.apply(variables, images, ids, mask, vis_p, txt_p, 0)
        b, _ = m.apply(variables, images, ids, mask, vis_p, txt_p, 2)
        assert not np.allclose(np.asarray(a["aggregate"]),
                               np.asarray(b["aggregate"]), atol=1e-5)

    def test_per_sample_prompts(self, encoder, rng):
        m, variables, (images, ids, mask, vis_p, txt_p) = encoder
        vb = jnp.broadcast_to(vis_p[None], (2,) + vis_p.shape)
        tb = jnp.broadcast_to(txt_p[None], (2,) + txt_p.shape)
        a, _ = m.apply(variables, images, ids, mask, vis_p, txt_p, 0)
        b, _ = m.apply(variables, images, ids, mask, vb, tb, 0)
        np.testing.assert_allclose(np.asarray(a["aggregate"]),
                                   np.asarray(b["aggregate"]), atol=1e-5)

"""Shape/semantics tests for the Flax CLIP dual tower and SliNet."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpi_tpu.core.config import CLIPConfig, LPIPromptConfig, RetrievalConfig
from lpi_tpu.models.clip import CLIP, SliNet

TINY = CLIPConfig(
    image_resolution=32, patch_size=16, vision_width=64, vision_layers=3,
    vision_heads=4, text_width=32, text_layers=3, text_heads=4,
    vocab_size=128, context_length=20, embed_dim=24, n_ctx=4)

TINY_RET = RetrievalConfig(
    clip=TINY,
    lpi=LPIPromptConfig(prompt_length=4, prompt_depth=3, prompt_rank=2),
    total_sessions=3, visual_dim=64, textual_dim=32, dtype="float32")


def make_batch(rng, b=2):
    images = jnp.asarray(rng.randn(b, 32, 32, 3).astype(np.float32))
    ids = rng.randint(1, 100, size=(b, 20)).astype(np.int32)
    ids[:, 0] = 1
    ids[:, -1] = 127  # EOT = highest id
    return images, jnp.asarray(ids)


class TestCLIP:
    @pytest.fixture(scope="class")
    def model(self):
        m = CLIP(TINY, jnp.float32)
        rng = np.random.RandomState(0)
        images, ids = make_batch(rng)
        variables = m.init(jax.random.PRNGKey(0), images, ids)
        return m, variables

    def test_forward_shapes(self, model, rng):
        m, variables = model
        images, ids = make_batch(rng)
        img, txt, scale = m.apply(variables, images, ids)
        assert img.shape == (2, 24) and txt.shape == (2, 24)
        assert np.allclose(np.linalg.norm(np.asarray(img), axis=-1), 1, atol=1e-4)
        assert np.allclose(np.linalg.norm(np.asarray(txt), axis=-1), 1, atol=1e-4)
        assert float(scale) == pytest.approx(100.0, rel=1e-3)

    def test_visual_prompt_changes_features(self, model, rng):
        m, variables = model
        images, ids = make_batch(rng)
        prompt = jnp.asarray(rng.randn(3, 4, 64).astype(np.float32))
        base = m.apply(variables, images, prompt=None, method=m.encode_image)
        prompted = m.apply(variables, images, prompt=prompt, method=m.encode_image)
        assert not np.allclose(np.asarray(base), np.asarray(prompted), atol=1e-4)

    def test_injection_depth_matters(self, model, rng):
        """depth=1 only uses prompt[0]; depth=3 adds prompt[1:3] per layer."""
        m, variables = model
        images, _ = make_batch(rng)
        prompt = jnp.asarray(rng.randn(3, 4, 64).astype(np.float32))
        d1 = m.apply(variables, images, prompt=prompt, injection_depth=1,
                     method=m.encode_image)
        d3 = m.apply(variables, images, prompt=prompt, injection_depth=3,
                     method=m.encode_image)
        assert not np.allclose(np.asarray(d1), np.asarray(d3), atol=1e-4)
        # depth=1 ignores deeper prompt layers entirely
        prompt2 = prompt.at[1:].set(0.0)
        d1b = m.apply(variables, images, prompt=prompt2, injection_depth=1,
                      method=m.encode_image)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d1b), atol=1e-5)

    def test_ctx_splice_changes_text(self, model, rng):
        m, variables = model
        _, ids = make_batch(rng)
        ctx = jnp.asarray(rng.randn(4, 32).astype(np.float32))
        base = m.apply(variables, ids, method=m.encode_text)
        spliced = m.apply(variables, ids, ctx=ctx, method=m.encode_text)
        assert not np.allclose(np.asarray(base), np.asarray(spliced), atol=1e-4)

    def test_eot_pooling_uses_argmax_position(self, model, rng):
        """Moving the EOT token changes which position is pooled."""
        m, variables = model
        _, ids = make_batch(rng)
        ids2 = np.asarray(ids).copy()
        ids2[:, -1] = 2
        ids2[:, 10] = 127
        a = m.apply(variables, ids, method=m.encode_text)
        b = m.apply(variables, jnp.asarray(ids2), method=m.encode_text)
        assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestSliNet:
    @pytest.fixture(scope="class")
    def model(self):
        m = SliNet(TINY_RET)
        rng = np.random.RandomState(1)
        images, ids = make_batch(rng)
        variables = m.init(jax.random.PRNGKey(0), images, ids, 0)
        return m, variables

    def test_train_forward(self, model, rng):
        m, variables = model
        images, ids = make_batch(rng)
        img, txt, vis_p, txt_p, scale = m.apply(variables, images, ids, 1)
        assert img.shape == (2, 24) and txt.shape == (2, 24)
        assert vis_p.shape == (3, 4, 64) and txt_p.shape == (3, 4, 32)

    def test_param_structure(self, model):
        _, variables = model
        p = variables["params"]
        assert p["ctx_pool"].shape == (3, 4, 32)
        assert p["prompts"]["d1_share"].shape == (3, 3, 2)

    def test_tasks_give_different_features(self, model, rng):
        m, variables = model
        images, ids = make_batch(rng)
        out0 = m.apply(variables, images, ids, 0)
        out1 = m.apply(variables, images, ids, 1)
        assert not np.allclose(np.asarray(out0[0]), np.asarray(out1[0]), atol=1e-4)

    def test_per_sample_gather_matches_single_task(self, model, rng):
        """encode_*_tasks with uniform ids == train-path encoder for that task."""
        m, variables = model
        images, ids = make_batch(rng)
        task_ids = jnp.asarray([2, 2])
        img_b = m.apply(variables, images, task_ids, method=m.encode_image_tasks)
        txt_b = m.apply(variables, ids, task_ids, method=m.encode_text_tasks)
        img, txt, *_ = m.apply(variables, images, ids, 2)
        np.testing.assert_allclose(np.asarray(img_b), np.asarray(img), atol=1e-5)
        np.testing.assert_allclose(np.asarray(txt_b), np.asarray(txt), atol=1e-5)

    def test_mixed_task_ids(self, model, rng):
        m, variables = model
        images, ids = make_batch(rng)
        img_b = m.apply(variables, images, jnp.asarray([0, 1]),
                        method=m.encode_image_tasks)
        img0 = m.apply(variables, images, jnp.asarray([0, 0]),
                       method=m.encode_image_tasks)
        np.testing.assert_allclose(np.asarray(img_b[0]), np.asarray(img0[0]), atol=1e-5)
        assert not np.allclose(np.asarray(img_b[1]), np.asarray(img0[1]), atol=1e-4)

    def test_frozen_extraction_ignores_prompts(self, model, rng):
        m, variables = model
        images, ids = make_batch(rng)
        feats = m.apply(variables, images, method=m.extract_visual)
        assert feats.shape == (2, 24)
        tfeats = m.apply(variables, ids, method=m.extract_textual)
        assert tfeats.shape == (2, 24)

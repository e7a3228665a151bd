"""Tests for the task-wise prompt pools (CP composition, gathers, L2P)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpi_tpu.prompts import DecomposedPromptPool, L2pPrompt, NormalPromptPool
from lpi_tpu.prompts.pools import compose_cp


class TestComposeCP:
    def test_matches_numpy_broadcast(self, rng):
        """mean_r(d1 ⊙ d2 ⊙ d3) — the reference formula (prompts.py:38-57)."""
        L, P, D, r = 9, 16, 24, 4
        d1 = rng.randn(L, r).astype(np.float32)
        d2 = rng.randn(P, r).astype(np.float32)
        d3 = rng.randn(D, r).astype(np.float32)
        expected = (d1[:, None, None, :] * d2[None, :, None, :] * d3[None, None, :, :]).mean(-1)
        got = np.asarray(compose_cp(jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(d3)))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_batched_leading_axes(self, rng):
        T, L, P, D, r = 3, 2, 4, 8, 2
        d1 = rng.randn(T, L, r).astype(np.float32)
        d2 = rng.randn(T, P, r).astype(np.float32)
        d3 = rng.randn(T, D, r).astype(np.float32)
        got = np.asarray(compose_cp(jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(d3)))
        for t in range(T):
            expected = (d1[t][:, None, None, :] * d2[t][None, :, None, :] * d3[t][None, None, :, :]).mean(-1)
            np.testing.assert_allclose(got[t], expected, rtol=1e-5)


class TestDecomposedPromptPool:
    @pytest.fixture()
    def pool(self):
        m = DecomposedPromptPool(
            num_tasks=4, layer_num=9, prompt_num=16, visual_dim=32, textual_dim=24, rank=4)
        variables = m.init(jax.random.PRNGKey(0), 0)
        return m, variables

    def test_shapes(self, pool):
        m, variables = pool
        vis, txt = m.apply(variables, 2)
        assert vis.shape == (9, 16, 32)
        assert txt.shape == (9, 16, 24)

    def test_param_shapes_and_init_std(self, pool):
        m, variables = pool
        p = variables["params"]
        assert p["d1_share"].shape == (4, 9, 4)
        assert p["d3_visual"].shape == (4, 32, 4)
        assert p["d3_textual"].shape == (4, 24, 4)
        # N(0, 0.5) init as in the reference (prompts.py:21-25)
        assert 0.3 < float(jnp.std(p["d1_share"])) < 0.7

    def test_task_selection_consistent_with_all(self, pool):
        m, variables = pool
        all_vis, all_txt = m.apply(variables, method=m.all_prompts)
        for t in range(4):
            vis, txt = m.apply(variables, t)
            np.testing.assert_allclose(np.asarray(vis), np.asarray(all_vis[t]), rtol=1e-5)
            np.testing.assert_allclose(np.asarray(txt), np.asarray(all_txt[t]), rtol=1e-5)

    def test_gather_batched(self, pool):
        m, variables = pool
        ids = jnp.asarray([3, 0, 0, 2])
        vis_b, txt_b = m.apply(variables, ids, method=m.gather)
        assert vis_b.shape == (4, 9, 16, 32)
        vis3, _ = m.apply(variables, 3)
        np.testing.assert_allclose(np.asarray(vis_b[0]), np.asarray(vis3), rtol=1e-5)

    def test_grad_only_touches_selected_task(self, pool):
        """Gather means grads of other tasks' factors are exactly zero —
        the basis of the freeze-mask design (vs requires_grad in the ref)."""
        m, variables = pool

        def loss(params):
            vis, txt = m.apply({"params": params}, 1)
            return jnp.sum(vis ** 2) + jnp.sum(txt ** 2)

        g = jax.grad(loss)(variables["params"])
        assert float(jnp.abs(g["d1_share"][1]).sum()) > 0
        np.testing.assert_array_equal(np.asarray(g["d1_share"][0]), 0)
        np.testing.assert_array_equal(np.asarray(g["d2_visual"][3]), 0)


class TestNormalPromptPool:
    def test_shapes_and_std(self):
        m = NormalPromptPool(num_tasks=12, layer_num=1, prompt_num=16,
                             visual_dim=768, textual_dim=512)
        v = m.init(jax.random.PRNGKey(0), 0)
        vis, txt = m.apply(v, 5)
        assert vis.shape == (1, 16, 768)
        assert txt.shape == (1, 16, 512)
        assert 0.015 < float(jnp.std(v["params"]["visual_prompt"])) < 0.025


class TestL2pPrompt:
    def test_forward_shapes(self, rng):
        m = L2pPrompt(pool_size=12, length=4, embed_dim=96, top_k=4)
        x = jnp.asarray(rng.randn(8, 50, 96).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)
        assert out["prompted_embedding"].shape == (8, 50, 96)
        assert out["prompt_idx"].shape == (8, 4)
        assert out["total_prompt_len"] == 16
        assert np.isfinite(float(out["reduce_sim"]))

    def test_batchwise_prompt_shared_across_batch(self, rng):
        m = L2pPrompt(pool_size=12, length=4, embed_dim=96, top_k=4, batchwise_prompt=True)
        x = jnp.asarray(rng.randn(8, 50, 96).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), x)
        idx = np.asarray(m.apply(variables, x)["prompt_idx"])
        assert (idx == idx[0]).all()

    def test_prompt_overwrites_prefix_tokens(self, rng):
        m = L2pPrompt(pool_size=12, length=4, embed_dim=96, top_k=4)
        x = jnp.asarray(rng.randn(2, 50, 96).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)
        # tokens beyond the prompt prefix are untouched
        np.testing.assert_allclose(
            np.asarray(out["prompted_embedding"][:, 16:]), np.asarray(x[:, 16:]), rtol=1e-6)
        assert not np.allclose(np.asarray(out["prompted_embedding"][:, :16]), np.asarray(x[:, :16]))

"""End-to-end continual retrieval on synthetic data (tiny model, CPU mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lpi_tpu.core.config import CLIPConfig, LPIPromptConfig, RetrievalConfig
from lpi_tpu.continual.keys import TaskKeys, infer_task_ids
from lpi_tpu.continual.learner import RetrievalLearner, _split_params
from lpi_tpu.data.retrieval import synthetic_eval, synthetic_session
from lpi_tpu.data.tokenizer import ClipTokenizer
from lpi_tpu.ops.kmeans import kmeans
import jax

TINY_CFG = RetrievalConfig(
    clip=CLIPConfig(
        image_resolution=32, patch_size=16, vision_width=64, vision_layers=2,
        vision_heads=4, text_width=32, text_layers=2, text_heads=4,
        vocab_size=49408, context_length=77, embed_dim=24, n_ctx=4),
    lpi=LPIPromptConfig(prompt_length=4, prompt_depth=2, prompt_rank=2),
    total_sessions=3, epochs=2, batch_size=8, lr=0.05,
    visual_dim=64, textual_dim=32, num_key_clusters=2, dtype="float32")


@pytest.fixture(scope="module")
def tokenizer():
    return ClipTokenizer()


class TestKMeans:
    def test_recovers_separated_clusters(self, rng):
        a = rng.randn(40, 8) * 0.1 + 5
        b = rng.randn(40, 8) * 0.1 - 5
        x = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
        centers, inertia = kmeans(jax.random.PRNGKey(0), x, k=2)
        c = np.sort(np.asarray(centers)[:, 0])
        assert c[0] == pytest.approx(-5, abs=0.5)
        assert c[1] == pytest.approx(5, abs=0.5)
        assert float(inertia) < 100

    def test_deterministic(self, rng):
        x = jnp.asarray(rng.randn(30, 4).astype(np.float32))
        c1, _ = kmeans(jax.random.PRNGKey(7), x, k=3)
        c2, _ = kmeans(jax.random.PRNGKey(7), x, k=3)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


class TestTaskKeys:
    def test_l1_nearest_center_inference(self):
        keys = TaskKeys.create(3, 2, 4)
        keys = keys.update(0, jnp.ones((2, 4)) * 0.0)
        keys = keys.update(1, jnp.ones((2, 4)) * 10.0)
        feats = jnp.asarray([[0.1, 0.1, 0.1, 0.1], [9.5, 10.0, 10.0, 10.2]])
        ids = infer_task_ids(feats, keys)
        np.testing.assert_array_equal(np.asarray(ids), [0, 1])

    def test_untrained_tasks_excluded(self):
        keys = TaskKeys.create(3, 2, 4)
        keys = keys.update(1, jnp.ones((2, 4)) * 100.0)
        feats = jnp.zeros((2, 4))
        ids = infer_task_ids(feats, keys)  # only task 1 valid
        np.testing.assert_array_equal(np.asarray(ids), [1, 1])


class TestLearner:
    @pytest.fixture(scope="class")
    def learner(self):
        sim = np.eye(3)
        sim[0, 1] = sim[1, 0] = 0.2  # below threshold: tasks unrelated
        return RetrievalLearner(TINY_CFG, task_sim_matrix=sim)

    def test_split_params(self, learner):
        pools, frozen = _split_params(learner.params)
        pool_names = {"/".join(k) for k in pools}
        assert any("prompts" in n for n in pool_names)
        assert any("ctx_pool" in n for n in pool_names)
        assert all("clip" not in n for n in pool_names)
        assert len(frozen) > 10

    def test_session_zero_trains_and_loss_decreases(self, learner, tokenizer):
        ds = synthetic_session(0, num_samples=16, image_size=32,
                               tokenizer=tokenizer, n_ctx=4)
        before = dict(_snapshot_pools(learner))
        m1 = learner.train_session(ds, epochs=1)
        m2 = learner.train_session(ds, epochs=3)
        assert m2["base_loss"] < m1["base_loss"] + 1.0  # trains without diverging
        after = dict(_snapshot_pools(learner))
        changed = {k for k in before if not np.allclose(before[k], after[k])}
        assert changed  # prompts moved
        # only task 0's slice moved
        for k in before:
            if "d1_share" in k:
                np.testing.assert_allclose(before[k][1:], after[k][1:], atol=1e-7)
                assert not np.allclose(before[k][0], after[k][0])

    def test_task_loss_appears_in_session_one(self, learner, tokenizer):
        ds = synthetic_session(1, num_samples=16, image_size=32,
                               tokenizer=tokenizer, n_ctx=4)
        metrics = learner.train_session(ds, epochs=1)
        assert "task_loss" in metrics
        assert "alignment_loss" in metrics
        assert np.isfinite(metrics["total"])

    def test_evaluate_after_two_sessions(self, learner, tokenizer):
        ev = synthetic_eval(2, samples_per_task=6, tokenizer=tokenizer, n_ctx=4)
        res = learner.evaluate(ev, num_tasks=2)
        assert set(res["i2t"].keys()) == {0, 1}
        for t in (0, 1):
            r1, r5, r10 = res["i2t"][t]
            assert 0 <= r1 <= r5 <= r10 <= 100
        assert 0 <= res["task_id_accuracy"]["visual"] <= 1


def _snapshot_pools(learner):
    pools, _ = _split_params(learner.params)
    return {"/".join(k): np.asarray(v) for k, v in pools.items()}

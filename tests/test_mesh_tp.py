"""Tensor-parallel param layouts over the mesh's `model` axis.

The reference scales by replicating every weight (DDP,
`grounding/tools/finetune.py:507-527`); the TPU rebuild adds a Megatron-style
tensor-parallel dimension on top of data parallel (`core/mesh.py:
tp_param_shardings`). These tests pin (a) the per-leaf layout rules and
(b) that a dp×tp-sharded train step computes the SAME losses as dp-only —
XLA's collectives, not the Python code, change under the new layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from lpi_tpu.core import mesh as mesh_lib
from lpi_tpu.core.config import (
    CLIPConfig, LPIPromptConfig, MeshConfig, RetrievalConfig)


def tiny_cfg(n_dev: int) -> RetrievalConfig:
    return RetrievalConfig(
        clip=CLIPConfig(
            image_resolution=32, patch_size=16, vision_width=64,
            vision_layers=2, vision_heads=4, text_width=32, text_layers=2,
            text_heads=4, vocab_size=512, context_length=16, embed_dim=32,
            n_ctx=4),
        lpi=LPIPromptConfig(prompt_length=4, prompt_depth=2, prompt_rank=2),
        total_sessions=2, epochs=1, batch_size=2 * n_dev, visual_dim=64,
        textual_dim=32, num_key_clusters=2, dtype="float32")


@pytest.fixture(scope="module")
def mesh42():
    return mesh_lib.make_mesh(MeshConfig(data_parallel=4, model_parallel=2))


@pytest.mark.fast
class TestTpSpecRules:
    def test_clip_mlp_column_row(self):
        # scan-stacked [L, in, out] kernels: rule positions from the end
        assert mesh_lib._tp_spec(("mlp_c_fc", "kernel"), (2, 32, 128), 2) \
            == P(None, None, "model")
        assert mesh_lib._tp_spec(("mlp_c_fc", "bias"), (2, 128), 2) \
            == P(None, "model")
        assert mesh_lib._tp_spec(("mlp_c_proj", "kernel"), (2, 128, 32), 2) \
            == P(None, "model", None)
        # row-parallel bias is replicated (added after the psum)
        assert mesh_lib._tp_spec(("mlp_c_proj", "bias"), (2, 32), 2) == P()

    def test_packed_qkv_stays_replicated(self):
        # CLIP in_proj / Swin qkv: 3W output splits at W boundaries that
        # misalign with 3W/mp shards — deliberately unsharded
        assert mesh_lib._tp_spec(("in_proj", "kernel"), (2, 64, 192), 2) == P()
        assert mesh_lib._tp_spec(("qkv", "kernel"), (64, 192), 2) == P()

    def test_bert_rules_scoped_to_tlayer(self):
        inside = ("encoder", "stage0", "tlayer1", "query", "kernel")
        outside = ("head", "query", "kernel")
        assert mesh_lib._tp_spec(inside, (16, 16), 2) == P(None, "model")
        assert mesh_lib._tp_spec(outside, (16, 16), 2) == P()
        out_k = ("encoder", "stage1", "tlayer0", "output", "kernel")
        assert mesh_lib._tp_spec(out_k, (32, 16), 2) == P("model", None)

    def test_indivisible_dim_falls_back_replicated(self):
        assert mesh_lib._tp_spec(("mlp_c_fc", "kernel"), (2, 32, 100), 8) == P()

    def test_dp_only_mesh_replicates_everything(self, mesh8):
        tree = {"mlp_c_fc": {"kernel": np.zeros((2, 32, 128))}}
        sh = mesh_lib.tp_param_shardings(mesh8, tree)
        assert sh["mlp_c_fc"]["kernel"].spec == P()


class TestTpTrainStep:
    def test_slinet_param_layouts(self, mesh42):
        from lpi_tpu.continual.learner import RetrievalLearner

        learner = RetrievalLearner(tiny_cfg(8), mesh=mesh42)
        flat = {
            "/".join(str(k.key) for k in path): leaf
            for path, leaf in jax.tree_util.tree_leaves_with_path(learner.params)
        }
        fc = flat["clip/visual/transformer/block/mlp_c_fc/kernel"]
        assert fc.sharding.spec == P(None, None, "model")
        proj = flat["clip/visual/transformer/block/mlp_c_proj/kernel"]
        assert proj.sharding.spec == P(None, "model", None)
        # packed attention + prompt pools stay replicated
        assert flat["clip/visual/transformer/block/attn/in_proj/kernel"
                    ].sharding.spec == P()
        assert flat["prompts/d3_visual"].sharding.spec == P()

    def test_tp_step_matches_dp_only(self, mesh8, mesh42):
        """One train session on a 4x2 (data, model) mesh reproduces the
        8x1 dp-only losses: the TP layout only changes WHERE the matmuls
        run, never what they compute."""
        from lpi_tpu.continual.learner import RetrievalLearner
        from lpi_tpu.data.retrieval import RetrievalTrainSet

        cfg = tiny_cfg(8)
        rng = np.random.RandomState(0)
        n = 2 * cfg.batch_size
        ids = rng.randint(1, 500, size=(n, cfg.clip.context_length))
        ids = ids.astype(np.int32)
        ids[:, -1] = 511
        images = rng.randn(n, 32, 32, 3).astype(np.float32)

        def run(mesh):
            ds = RetrievalTrainSet(images=images.copy(),
                                   token_ids=ids.copy(), task_index=0)
            learner = RetrievalLearner(cfg, mesh=mesh)
            return learner.train_session(ds, epochs=1)

        m_dp = run(mesh8)
        m_tp = run(mesh42)
        assert np.isfinite(m_tp["total"])
        # fp32 towers; reduction-order drift across layouts stays tiny
        assert float(m_tp["total"]) == pytest.approx(
            float(m_dp["total"]), rel=2e-4)

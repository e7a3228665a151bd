"""Checkpoint restore round-trips: train → save → fresh learner → restore →
identical evaluation."""

import json

import numpy as np
import pytest

from tests.test_continual import TINY_CFG
from lpi_tpu.continual.learner import RetrievalLearner, _split_params
from lpi_tpu.core.checkpoint import SessionCheckpointer
from lpi_tpu.data.retrieval import synthetic_eval, synthetic_session
from lpi_tpu.data.tokenizer import ClipTokenizer


@pytest.fixture(scope="module")
def tokenizer():
    return ClipTokenizer()


class TestRetrievalRestore:
    def test_roundtrip_eval_identical(self, tmp_path, tokenizer):
        learner = RetrievalLearner(TINY_CFG, task_sim_matrix=np.eye(3))
        ds = synthetic_session(0, 16, 32, tokenizer, TINY_CFG.clip.n_ctx)
        learner.train_session(ds, epochs=1)
        ev = synthetic_eval(1, 6, tokenizer=tokenizer, n_ctx=TINY_CFG.clip.n_ctx)
        res_before = learner.evaluate(ev, num_tasks=1)

        ck = SessionCheckpointer(str(tmp_path / "ck"))
        pools, frozen = _split_params(learner.params)
        ck.save_base(frozen)
        ck.save_session(0, pools, learner.visual_keys, learner.textual_keys)

        fresh = RetrievalLearner(TINY_CFG, task_sim_matrix=np.eye(3), rng_seed=123)
        session = fresh.restore(ck)
        assert session == 0
        res_after = fresh.evaluate(ev, num_tasks=1)
        assert res_after["summary"]["r_mean"] == pytest.approx(
            res_before["summary"]["r_mean"], abs=1e-6)
        assert res_after["task_id_accuracy"] == res_before["task_id_accuracy"]

    def test_restore_empty_dir_raises(self, tmp_path):
        learner = RetrievalLearner(TINY_CFG)
        with pytest.raises(ValueError, match="no sessions"):
            learner.restore(SessionCheckpointer(str(tmp_path / "empty")))


class TestEvalCli:
    def test_train_then_eval_command(self, tmp_path):
        cfg = {
            "retrieval": {
                "clip": {"image_resolution": 32, "patch_size": 16, "vision_width": 32,
                         "vision_layers": 2, "vision_heads": 2, "text_width": 32,
                         "text_layers": 2, "text_heads": 2, "embed_dim": 16, "n_ctx": 4},
                "lpi": {"prompt_length": 4, "prompt_depth": 2, "prompt_rank": 2},
                "total_sessions": 2, "epochs": 1, "batch_size": 8,
                "visual_dim": 32, "textual_dim": 32, "num_key_clusters": 2,
                "dtype": "float32",
            }
        }
        cfg_path = tmp_path / "cfg.json"
        with open(cfg_path, "w") as f:
            json.dump(cfg, f)

        from lpi_tpu.cli.main import main

        main(["train", "--config", str(cfg_path), "--synthetic",
              "--sessions", "1", "--epochs", "1",
              "--output-dir", str(tmp_path / "res"),
              "--checkpoint-dir", str(tmp_path / "ck")])
        res = main(["eval", "--config", str(cfg_path), "--synthetic",
                    "--checkpoint-dir", str(tmp_path / "ck")])
        assert np.isfinite(res["summary"]["r_mean"])

        # eval-all: sweep every saved session (tools/eval_all.py equivalent)
        out = main(["eval-all", "--config", str(cfg_path), "--synthetic",
                    "--checkpoint-dir", str(tmp_path / "ck"),
                    "--output", str(tmp_path / "sweep.json")])
        assert list(out) == [0]
        assert np.isfinite(out[0]["summary"]["r_mean"])
        with open(tmp_path / "sweep.json") as f:
            assert "0" in json.load(f)

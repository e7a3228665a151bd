"""CLI smoke test for the continual grounding loop (tiny synthetic run)."""

import json

import pytest

pytestmark = pytest.mark.slow  # full grounding train compile: minutes on CPU
import os

import numpy as np


def test_train_grounding_synthetic(tmp_path):
    cfg = {
        "grounding": {
            "swin": {"patch_size": 4, "embed_dim": 8, "depths": [2, 2, 2, 2],
                     "num_heads": [1, 2, 2, 2], "window_size": 4},
            "bert": {"vocab_size": 512, "hidden_size": 16, "num_layers": 8,
                     "num_heads": 2, "intermediate_size": 32,
                     "max_position_embeddings": 32, "max_query_len": 16},
            "dyhead": {"num_convs": 2, "channels": 16, "max_tokens": 16},
            "atss": {"anchor_sizes": [32, 64, 128, 256, 512],
                     "anchor_strides": [4, 8, 16, 32, 64],
                     "pre_nms_top_n": 50, "fpn_post_nms_top_n": 10},
            "lpi": {"prompt_length": 4, "prompt_depth": 6, "prompt_rank": 2,
                    "interact_rank": 2, "interact_depth": 6},
            "total_tasks": 2, "epochs_per_task": 1, "batch_size": 2,
            "max_boxes": 4, "image_size": 64, "num_key_clusters": 2,
            "dtype": "float32", "fused_scan_unroll": 99,
        }
    }
    cfg_path = tmp_path / "gcfg.json"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    from lpi_tpu.cli.main import main

    res_path = main([
        "train-grounding", "--config", str(cfg_path), "--synthetic",
        "--tasks", "2", "--epochs", "1",
        "--output-dir", str(tmp_path / "res"),
        "--checkpoint-dir", str(tmp_path / "ck"),
    ])
    assert os.path.exists(res_path)
    with open(res_path) as f:
        results = json.load(f)
    assert set(results.keys()) == {"0", "1"}
    assert "per_task" in results["1"]
    assert np.isfinite(results["1"]["task_id_accuracy"])
    assert os.path.exists(tmp_path / "ck" / "base")
    assert os.path.exists(tmp_path / "ck" / "session_1")

    # grounding checkpoint sweep (tools/eval_all.py equivalent, VERDICT r3 #6)
    out = main(["eval-all", "--config", str(cfg_path), "--synthetic",
                "--grounding", "--checkpoint-dir", str(tmp_path / "ck"),
                "--output", str(tmp_path / "gsweep.json")])
    assert set(out) == {0, 1}
    assert len(out[1]["overall"]) == 3
    assert np.isfinite(out[1]["task_id_accuracy"])
    with open(tmp_path / "gsweep.json") as f:
        assert set(json.load(f)) == {"0", "1"}

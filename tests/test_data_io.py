"""Tests for data loading, checkpointing, MID, reshandle, and the CLI."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from lpi_tpu.continual.mid import (
    SUPERCATEGORY_TO_TASK,
    cosine_similarity_matrix,
    fallback_sim_matrix,
    load_task_sim_matrix,
    task_relation,
)
from lpi_tpu.data.coco import (
    TASK_CATEGORIES,
    CocoCaptionTrain,
    category_to_task,
    eval_transform,
    load_coco_eval,
)
from lpi_tpu.data.tokenizer import ClipTokenizer, pre_caption
from lpi_tpu.eval.reshandle import get_res


@pytest.fixture(scope="module")
def tokenizer():
    return ClipTokenizer()


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    """Tiny on-disk COCO-caption layout: 6 images across categories 11, 6."""
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    train_ann, val_ann = [], []
    for i in range(6):
        name = f"img_{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)).save(img_dir / name)
        cat = 11 if i < 3 else 6  # sessions 0 and 1
        train_ann.append({"image": name, "image_id": i, "caption": f"a photo number {i}!",
                          "category": cat})
        val_ann.append({"image": name, "caption": [f"a photo number {i}.",
                                                   f"another view of {i}"],
                        "category": cat})
    with open(root / "train.json", "w") as f:
        json.dump(train_ann, f)
    with open(root / "val.json", "w") as f:
        json.dump(val_ann, f)
    return root


class TestMid:
    def test_category_task_mapping_matches_reference(self):
        # data.py:327-343 order and modulated_coco.py:277 supercategory map
        assert TASK_CATEGORIES[0] == (11,)
        assert TASK_CATEGORIES[11] == (1,)
        assert SUPERCATEGORY_TO_TASK["person"] == 11
        assert category_to_task(11) == 0
        assert category_to_task(1) == 11

    def test_cosine_matrix_and_threshold(self):
        e = np.array([[1, 0], [1, 0.1], [0, 1.0]])
        sim = cosine_similarity_matrix(e)
        assert sim[0, 0] == pytest.approx(1.0)
        rel = task_relation(sim, 0.9)
        assert rel[0, 1] == 1.0 and rel[0, 2] == 0.0

    def test_loadtxt_roundtrip(self, tmp_path):
        m = np.eye(3) * 0.9 + 0.05
        np.savetxt(tmp_path / "sim.txt", m)
        got = load_task_sim_matrix(str(tmp_path / "sim.txt"), 2)
        np.testing.assert_allclose(got, m[:2, :2])

    def test_fallback_matrix_sane(self):
        m = fallback_sim_matrix(12)
        assert m.shape == (12, 12)
        np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-9)


class TestCocoData:
    def test_train_filters_by_session(self, coco_dir, tokenizer):
        ds0 = CocoCaptionTrain(str(coco_dir / "train.json"), str(coco_dir / "images"),
                               [0], tokenizer, n_ctx=4)
        ds1 = CocoCaptionTrain(str(coco_dir / "train.json"), str(coco_dir / "images"),
                               [1], tokenizer, n_ctx=4)
        assert len(ds0) == 3 and len(ds1) == 3  # cat 11 -> session 0, cat 6 -> session 1
        assert ds0.task_index == 0 and ds1.task_index == 1

    def test_train_batches_shapes(self, coco_dir, tokenizer):
        ds = CocoCaptionTrain(str(coco_dir / "train.json"), str(coco_dir / "images"),
                              [0], tokenizer, n_ctx=4, image_size=32)
        batches = list(ds.batches(2, seed=0))
        assert len(batches) == 1
        assert batches[0]["images"].shape == (2, 32, 32, 3)
        assert batches[0]["token_ids"].shape == (2, 77)

    def test_eval_set_maps(self, coco_dir, tokenizer):
        ev = load_coco_eval(str(coco_dir / "val.json"), str(coco_dir / "images"),
                            [0, 1], tokenizer, n_ctx=4, image_size=32)
        assert ev.images.shape == (6, 32, 32, 3)
        assert len(ev.texts) == 12  # 2 captions/image
        assert ev.img2txt[0] == [0, 1]
        assert ev.txt2img[3] == 1
        assert set(ev.image_categories) == {0, 1}

    def test_pre_caption_strips_punctuation(self):
        assert pre_caption("A Photo!! (Nice)") == "a photo nice"

    def test_eval_transform_shape_range(self):
        img = Image.fromarray(np.full((100, 80, 3), 128, np.uint8))
        out = eval_transform(img, size=32, resize=40)
        assert out.shape == (32, 32, 3)
        assert np.all(np.abs(out) < 3)  # normalized


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        from lpi_tpu.continual.keys import TaskKeys
        from lpi_tpu.core.checkpoint import SessionCheckpointer

        ck = SessionCheckpointer(str(tmp_path / "ck"))
        frozen = {"clip": {"w": np.ones((3, 3), np.float32)}}
        pools = {("prompts", "d1"): np.full((2, 4), 2.0, np.float32)}
        keys = TaskKeys.create(2, 2, 4).update(0, jnp.ones((2, 4)))
        ck.save_base(frozen)
        ck.save_session(0, pools, keys, keys, {"r_mean": 1.0})
        assert ck.latest_session() == 0
        got = ck.load_session(0)
        np.testing.assert_allclose(got["pool_params"]["prompts"]["d1"], 2.0)
        base = ck.load_base()
        np.testing.assert_allclose(base["clip"]["w"], 1.0)


class TestReshandle:
    def test_get_res(self, tmp_path):
        results = {
            "0": {"mscoco": {"i2t": {"0": [50.0, 70, 90]}, "t2i": {"0": [40.0, 60, 80]}}},
            "1": {"mscoco": {"i2t": {"0": [30.0, 50, 70], "1": [60.0, 80, 95]},
                             "t2i": {"0": [20.0, 40, 60], "1": [55.0, 70, 90]}}},
        }
        p = tmp_path / "res.json"
        with open(p, "w") as f:
            json.dump(results, f)
        out = get_res(str(p), metric="i2t", num_sessions=2, weights=[1, 1])
        assert out["P@1"] == pytest.approx((30 + 60) / 2)
        assert out["forgetting@1"] == pytest.approx(50 - 30)


class TestCLI:
    def test_synthetic_train_and_report(self, tmp_path, monkeypatch):
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

        res_path = main([
            "train", "--config", str(cfg_path), "--synthetic",
            "--sessions", "2", "--epochs", "1",
            "--output-dir", str(tmp_path / "res"),
            "--checkpoint-dir", str(tmp_path / "ck"),
        ])
        assert os.path.exists(res_path)
        with open(res_path) as f:
            results = json.load(f)
        assert set(results.keys()) == {"0", "1"}
        assert os.path.exists(tmp_path / "ck" / "base")
        assert os.path.exists(tmp_path / "ck" / "session_1")

        report = main(["report", res_path, "--metric", "i2t", "--sessions", "2"])
        assert "P@1" in report and np.isfinite(report["P@1"])


class TestFlickr:
    def test_karpathy_loader(self, tmp_path, tokenizer):
        from PIL import Image

        from lpi_tpu.data.flickr import load_flickr30k_eval

        rng = np.random.RandomState(0)
        img_dir = tmp_path / "flickr"
        img_dir.mkdir()
        entries = []
        for i in range(3):
            name = f"f{i}.jpg"
            Image.fromarray(rng.randint(0, 255, (40, 50, 3), np.uint8)).save(img_dir / name)
            entries.append({
                "filename": name,
                "split": "test" if i < 2 else "train",
                "sentences": [{"raw": f"caption {i} variant {k}"} for k in range(5)],
            })
        ann = tmp_path / "dataset_flickr30k.json"
        with open(ann, "w") as f:
            json.dump({"images": entries}, f)
        ev = load_flickr30k_eval(str(ann), str(img_dir), split="test",
                                 tokenizer=tokenizer, n_ctx=4, image_size=32)
        assert ev.images.shape == (2, 32, 32, 3)  # only the test split
        assert len(ev.texts) == 10
        assert ev.img2txt[1] == [5, 6, 7, 8, 9]
        assert ev.txt2img[7] == 1

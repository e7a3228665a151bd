"""Dataset catalog: name table, path resolution, registration, build."""

import json
import os

import pytest

from lpi_tpu.data.bert_tokenizer import BertTokenizer
from lpi_tpu.data.catalog import (CATALOG, ODINW_13, ODINW_35, DatasetCatalog,
                                  try_to_find)
from lpi_tpu.data.transforms import AugmentConfig

pytestmark = pytest.mark.fast


class TestNameTable:
    def test_reference_names_present(self):
        # the names the LPI configs and GLIP eval claims actually use
        for name in ("refexp_train", "refexp_val", "refexp_testA",
                     "refexp_testB", "refexp_+_train", "refexp_+_val",
                     "refexp_g_train", "refexp_g_val", "refexp_g_test",
                     "flickr30k_train", "flickr30k_val", "flickr30k_test",
                     "mixed_train", "gqa_val", "phrasecut_train",
                     "coco_grounding_train", "lvis_val", "object365_dt_train",
                     "vg_dt_train", "objects365_odtsv_val"):
            assert name in CATALOG, name

    def test_spec_kinds(self):
        assert CATALOG.get("refexp_train").kind == "mdetr"
        assert CATALOG.get("coco_grounding_train").kind == "coco"
        assert CATALOG.get("vg_dt_train").kind == "tsv"
        assert CATALOG.get("refexp_train").is_train
        assert not CATALOG.get("refexp_val").is_train

    def test_unknown_name_raises(self):
        with pytest.raises(KeyError):
            CATALOG.get("nope_train")

    def test_odinw_membership(self):
        assert len(ODINW_13) == 13
        assert len(ODINW_35) == 36  # ref ships 36 yamls under odinw_35
        assert set(ODINW_13) <= set(ODINW_35)


class TestTryToFind:
    def test_finds_relative_to_dataset_env(self, tmp_path, monkeypatch):
        (tmp_path / "x").mkdir()
        (tmp_path / "x" / "f.json").write_text("{}")
        monkeypatch.setenv("DATASET", str(tmp_path))
        assert try_to_find("x/f.json") == os.path.join(str(tmp_path), "x/f.json")
        assert try_to_find("x/f.json", return_dir=True) == str(tmp_path)

    def test_missing_raises(self, monkeypatch):
        monkeypatch.delenv("DATASET", raising=False)
        with pytest.raises(FileNotFoundError):
            try_to_find("definitely/not/here.json", search_path=[])

    def test_catalog_uri_passthrough(self):
        assert try_to_find("catalog://foo") == "catalog://foo"


class TestRegistration:
    def test_register_and_build_coco(self, tmp_path, monkeypatch):
        from PIL import Image

        root = tmp_path / "imgs"
        root.mkdir()
        Image.new("RGB", (40, 20), (1, 2, 3)).save(root / "a.jpg")
        ann = {
            "images": [{"id": 1, "file_name": "a.jpg", "width": 40,
                        "height": 20}],
            "annotations": [{"id": 1, "image_id": 1, "category_id": 10,
                             "bbox": [0, 0, 20, 10]}],
            "categories": [{"id": 10, "name": "cat"}],
        }
        (tmp_path / "ann.json").write_text(json.dumps(ann))
        monkeypatch.setenv("DATASET", str(tmp_path))

        cat = DatasetCatalog()
        cat.register("my_train", "ann.json", "imgs", is_train=True)
        ds = cat.build("my_train", tokenizer=BertTokenizer(max_len=16),
                       augment=AugmentConfig(image_size=32))
        assert len(ds) == 1
        assert "cat" in ds.examples[0].caption

    def test_register_odinw_names(self):
        cat = DatasetCatalog()
        names = cat.register_odinw("Raccoon", shots=(1,), seeds=(3,))
        assert "odinw_Raccoon_train" in names
        assert "odinw_Raccoon_train_1_3" in names
        spec = cat.get("odinw_Raccoon_test")
        assert spec.ann_file.endswith(
            "Raccoon/test/annotations_without_background.json")

    def test_build_tsv_from_yaml(self, tmp_path, monkeypatch):
        import base64
        import io

        from PIL import Image

        from lpi_tpu.data.tsv import write_tsv

        buf = io.BytesIO()
        Image.new("RGB", (8, 8), (7, 7, 7)).save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        write_tsv(str(tmp_path / "img.tsv"), [["k0", b64]])
        write_tsv(str(tmp_path / "lbl.tsv"),
                  [["k0", json.dumps([{"class": "cat",
                                       "rect": [0, 0, 4, 4]}])]])
        (tmp_path / "shard.yaml").write_text("img: img.tsv\nlabel: lbl.tsv\n")
        monkeypatch.setenv("DATASET", str(tmp_path))

        cat = DatasetCatalog()
        cat.register("my_tsv", "", factory="CocoDetectionTSV",
                     yaml_path="shard.yaml")
        ds = cat.build("my_tsv")
        img, anns, key = ds[0]
        assert key == "k0" and img.size == (8, 8)
        assert anns["objects"][0]["class"] == "cat"


class TestCliDatasetFlag:
    def test_tsv_kind_rejected(self):
        from lpi_tpu.cli.main import build_parser, cmd_train_grounding

        args = build_parser().parse_args(
            ["train-grounding", "--dataset", "vg_dt_train"])
        with pytest.raises(SystemExit, match="tsv-kind"):
            cmd_train_grounding(args)

    def test_mdetr_name_resolves_paths(self, tmp_path, monkeypatch):
        from lpi_tpu.cli.main import build_parser, cmd_train_grounding

        # missing files -> try_to_find raises, proving resolution is wired
        monkeypatch.setenv("DATASET", str(tmp_path))
        args = build_parser().parse_args(
            ["train-grounding", "--dataset", "refexp_train"])
        with pytest.raises(FileNotFoundError):
            cmd_train_grounding(args)


class TestZooWrappers:
    def test_duplicated_and_concat(self):
        import numpy as np

        from lpi_tpu.data.bert_tokenizer import BertTokenizer
        from lpi_tpu.data.grounding import GroundingExample, GroundingTaskSet

        tok = BertTokenizer(max_len=16)

        def mk(n, tag):
            return GroundingTaskSet(
                [GroundingExample(image=np.zeros((8, 8, 3), np.float32),
                                  caption=f"{tag}{i}",
                                  boxes=np.zeros((1, 4), np.float32),
                                  token_spans=[[]], task_index=0)
                 for i in range(n)], tok, max_boxes=2)

        a = mk(2, "a")
        dup = a.duplicated(3)
        assert len(dup) == 6
        assert dup.examples[4].caption == "a0"  # 4 % 2

        b = mk(3, "b")
        cat = GroundingTaskSet.concat([a, b])
        assert len(cat) == 5
        assert cat.examples[2].caption == "b0"

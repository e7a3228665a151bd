"""COCO-format detection loader -> grounding task set (detection mode)."""

import json
import os

import numpy as np
import pytest

from lpi_tpu.data.bert_tokenizer import BertTokenizer
from lpi_tpu.data.grounding import load_coco_detection
from lpi_tpu.data.transforms import AugmentConfig

pytestmark = pytest.mark.fast


@pytest.fixture()
def coco_dir(tmp_path):
    from PIL import Image

    root = tmp_path / "imgs"
    root.mkdir()
    for name in ("a.jpg", "b.jpg"):
        Image.new("RGB", (40, 20), (128, 64, 32)).save(root / name)
    ann = {
        "images": [
            {"id": 1, "file_name": "a.jpg", "width": 40, "height": 20},
            {"id": 2, "file_name": "b.jpg", "width": 40, "height": 20},
        ],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 10,
             "bbox": [0, 0, 20, 10]},
            {"id": 2, "image_id": 1, "category_id": 20,
             "bbox": [20, 10, 20, 10]},
            {"id": 3, "image_id": 2, "category_id": 20,
             "bbox": [10, 5, 10, 10]},
        ],
        "categories": [
            {"id": 10, "name": "cat"},
            {"id": 20, "name": "dog"},
        ],
    }
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))
    return str(ann_path), str(root)


class TestCocoDetectionLoader:
    def test_caption_and_positive_maps(self, coco_dir):
        ann, root = coco_dir
        tok = BertTokenizer(max_len=16)
        ds = load_coco_detection(ann, root, tok, image_size=32, max_boxes=4,
                                 augment=AugmentConfig(image_size=32,
                                                       normalize=False))
        assert len(ds) == 2
        ex = ds.examples[0]
        assert "cat" in ex.caption and "dog" in ex.caption
        batch = ds._pack(ds.examples)
        # box 0 of image 0 is 'cat': its positive map row must differ from
        # box 1 ('dog')
        pm = batch["positive_map"][0]
        assert pm[0].sum() > 0 and pm[1].sum() > 0
        assert not np.allclose(pm[0], pm[1])
        # image 1's single 'dog' box shares image-0 box-1's token span
        np.testing.assert_allclose(batch["positive_map"][1][0], pm[1])

    def test_box_scaling(self, coco_dir):
        ann, root = coco_dir
        ds = load_coco_detection(ann, root, BertTokenizer(max_len=16),
                                 image_size=32,
                                 augment=AugmentConfig(image_size=32,
                                                       normalize=False))
        # 40x20 -> 32x32 distort: box [0,0,20,10] -> [0,0,16,16]
        np.testing.assert_allclose(ds.examples[0].boxes[0], [0, 0, 16, 16],
                                   atol=1e-4)

    def test_max_images(self, coco_dir):
        ann, root = coco_dir
        ds = load_coco_detection(ann, root, BertTokenizer(max_len=16),
                                 max_images=1, image_size=32)
        assert len(ds) == 1

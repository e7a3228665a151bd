"""TSV pipeline: lineidx random access, base64 images, composite shards."""

import base64
import io
import json

import numpy as np
import pytest

from lpi_tpu.data.tsv import (
    CompositeTSVFile,
    TSVDataset,
    TSVFile,
    img_from_base64,
    write_tsv,
)

pytestmark = pytest.mark.fast


def png_b64(color):
    from PIL import Image

    img = Image.new("RGB", (4, 4), color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


class TestTSVFile:
    def test_random_access(self, tmp_path):
        p = write_tsv(str(tmp_path / "a.tsv"),
                      [["k0", "x"], ["k1", "yy"], ["k2", "zzz"]])
        t = TSVFile(p)
        assert len(t) == 3
        assert t.seek(2) == ["k2", "zzz"]
        assert t.seek(0) == ["k0", "x"]  # backwards seek works
        assert t.get_key(1) == "k1"

    def test_composite(self, tmp_path):
        write_tsv(str(tmp_path / "s0.tsv"), [["a", "1"], ["b", "2"]])
        write_tsv(str(tmp_path / "s1.tsv"), [["c", "3"]])
        comp = CompositeTSVFile(["s0.tsv", "s1.tsv"],
                                seq=[(1, 0), (0, 1)], root=str(tmp_path))
        assert comp.get_key(0) == "c"
        assert comp[1] == ["b", "2"]


class TestTSVDataset:
    def test_images_and_labels(self, tmp_path):
        img_p = write_tsv(str(tmp_path / "img.tsv"),
                          [["im0", png_b64((255, 0, 0))],
                           ["im1", png_b64((0, 255, 0))]])
        lbl_p = write_tsv(str(tmp_path / "lbl.tsv"),
                          [["im0", json.dumps([{"class": "cat",
                                                "rect": [0, 0, 2, 2]}])],
                           ["im1", json.dumps({"objects": []})]])
        ds = TSVDataset(img_p, lbl_p)
        img, anns, key = ds[0]
        assert key == "im0"
        assert np.asarray(img)[0, 0, 0] == 255
        assert anns["objects"][0]["class"] == "cat"
        img1, anns1, _ = ds[1]
        assert anns1 == {"objects": []}

    def test_linelist_subsets(self, tmp_path):
        img_p = write_tsv(str(tmp_path / "img.tsv"),
                          [["a", png_b64((1, 1, 1))],
                           ["b", png_b64((2, 2, 2))],
                           ["c", png_b64((3, 3, 3))]])
        ll = tmp_path / "keep.linelist"
        ll.write_text("2\n0\n")
        ds = TSVDataset(img_p, linelist_file=str(ll))
        assert len(ds) == 2
        assert ds[0][2] == "c"
        assert ds[1][2] == "a"

    def test_corrupt_image_returns_none(self):
        assert img_from_base64("not-base64!!") is None

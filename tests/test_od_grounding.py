"""Tests for detection -> grounding caption/query synthesis."""

import numpy as np

from lpi_tpu.data.bert_tokenizer import BertTokenizer
from lpi_tpu.data.od_grounding import (
    boxes_to_grounding_targets,
    build_detection_caption,
    create_queries_and_maps,
)


def test_caption_and_spans():
    caption, spans = build_detection_caption(["person", "car"])
    assert caption.startswith("person. car")
    for (b, e), name in zip(spans, ["person", "car"]):
        assert caption[b:e] == name


def test_create_queries_and_maps():
    tok = BertTokenizer(max_len=16, vocab_size=2048)
    caption, ids, mask, label_map = create_queries_and_maps(
        ["person", "car", "dog"], tok)
    assert ids.shape == (1, 16) and label_map.shape == (3, 16)
    # each class marks at least one token, disjoint from the others
    assert (label_map.sum(axis=1) >= 1).all()
    assert (label_map.sum(axis=0) <= 1).all()


def test_boxes_to_grounding_targets():
    tok = BertTokenizer(max_len=16, vocab_size=2048)
    caption, pmap = boxes_to_grounding_targets([1, 0, 1], ["person", "car"], tok)
    assert pmap.shape[0] == 3
    np.testing.assert_array_equal(pmap[0], pmap[2])  # both boxes are 'car'
    assert not np.array_equal(pmap[0], pmap[1])

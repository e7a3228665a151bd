"""Detection -> grounding caption synthesis.

Equivalent of the reference's `data/datasets/od_to_grounding.py` +
`engine/inference.py:create_queries_and_maps` (SURVEY §2.3 G20, §3.3):
detection-mode inference turns the class-name list into one caption
("person. bicycle. car. ...") and a label->token map so the dot-product
token head scores every class; detection-mode training labels boxes with
their class-name span.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from lpi_tpu.data.bert_tokenizer import BertTokenizer, positive_map_from_spans


def build_detection_caption(class_names: Sequence[str],
                            separator: str = ". ") -> Tuple[str, List[Tuple[int, int]]]:
    """-> (caption, per-class char spans)."""
    spans = []
    parts = []
    pos = 0
    for name in class_names:
        start = pos
        parts.append(name)
        pos += len(name)
        spans.append((start, pos))
        pos += len(separator)
    caption = separator.join(parts) + separator.strip()[:1]  # trailing '.'
    return caption, spans


def create_queries_and_maps(
    class_names: Sequence[str],
    tokenizer: BertTokenizer,
) -> Tuple[str, np.ndarray, np.ndarray, np.ndarray]:
    """-> (caption, input_ids [1,T], attention_mask [1,T],
    label_token_map [C, T]) for detection-mode inference
    (`inference.py:423-442` query construction)."""
    caption, spans = build_detection_caption(class_names)
    ids, mask, offsets = tokenizer([caption])
    label_map = positive_map_from_spans([[s] for s in spans], offsets[0],
                                        ids.shape[1])
    return caption, ids, mask, label_map


def boxes_to_grounding_targets(
    labels: Sequence[int],
    class_names: Sequence[str],
    tokenizer: BertTokenizer,
) -> Tuple[str, np.ndarray]:
    """Detection-mode training targets: caption over all class names and a
    per-box positive map marking each box's class-name span
    (od_to_grounding.convert_od_to_grounding_simple behavior)."""
    caption, spans = build_detection_caption(class_names)
    ids, mask, offsets = tokenizer([caption])
    per_box_spans = [[spans[int(l)]] for l in labels]
    pmap = positive_map_from_spans(per_box_spans, offsets[0], ids.shape[1])
    return caption, pmap

"""Flickr30k retrieval data (Karpathy-split json).

The driver baseline's throughput metric is framed on Flickr30k encode pairs
(BASELINE.md); the reference's own loaders are COCO-caption style. This
loader reads the standard Karpathy `dataset_flickr30k.json`
({"images": [{filename, split, sentences: [{raw}]}]}) into the same
RetrievalTrainSet / RetrievalEvalSet containers the continual machinery
consumes — as a single task (Flickr has no continual category split).
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import numpy as np

from lpi_tpu.data.coco import _load_rgb, eval_transform
from lpi_tpu.data.retrieval import RetrievalEvalSet
from lpi_tpu.data.tokenizer import pre_caption


def load_flickr30k_eval(
    ann_file: str,
    image_root: str,
    split: str = "test",
    tokenizer=None,
    n_ctx: int = 16,
    max_words: int = 30,
    image_size: int = 224,
    num_workers: int = 8,
    limit: Optional[int] = None,
) -> RetrievalEvalSet:
    with open(ann_file) as f:
        data = json.load(f)
    entries = [im for im in data["images"] if im.get("split", "test") == split]
    if limit:
        entries = entries[:limit]
    if tokenizer is None:
        from lpi_tpu.data.tokenizer import ClipTokenizer

        tokenizer = ClipTokenizer()

    texts: List[str] = []
    txt2img, img2txt = {}, {}
    paths = []
    txt_id = 0
    for img_id, im in enumerate(entries):
        paths.append(os.path.join(image_root, im["filename"]))
        img2txt[img_id] = []
        for sent in im["sentences"][:5]:
            texts.append(pre_caption(sent["raw"], max_words))
            img2txt[img_id].append(txt_id)
            txt2img[txt_id] = img_id
            txt_id += 1

    with ThreadPoolExecutor(num_workers) as pool:
        images = list(pool.map(lambda p: eval_transform(_load_rgb(p), image_size),
                               paths))

    n_img = len(paths)
    return RetrievalEvalSet(
        images=np.stack(images) if images else np.zeros(
            (0, image_size, image_size, 3), np.float32),
        image_categories=np.zeros(n_img, np.int64),
        texts=texts,
        text_token_ids=tokenizer.tokenize_with_prefix(texts, n_ctx),
        text_categories=np.zeros(len(texts), np.int64),
        txt2img=txt2img,
        img2txt=img2txt,
    )

"""Grounding datasets: mdetr-format RefExp with the 12-supercategory
continual split, plus synthetic fixtures.

Behavioral equivalent of `maskrcnn_benchmark/data/datasets/modulated_coco.py`
(`ModulatedDataset`, SURVEY §2.2 G13): each image belongs to the continual
task given by the COCO supercategory of its FIRST annotation
(`modulated_coco.py:277,288-302`); targets carry boxes (xyxy) and mdetr
`tokens_positive` char spans, which become a token-level positive map via
the tokenizer offsets.

Static-shape batches: images padded to a fixed size, GT boxes padded to
`max_boxes` with validity masks, text to `max_query_len` tokens.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from lpi_tpu.continual.mid import SUPERCATEGORY_TO_TASK
from lpi_tpu.data.bert_tokenizer import BertTokenizer, positive_map_from_spans
from lpi_tpu.data.transforms import AugmentConfig, eval_transform, train_transform


@dataclass
class GroundingExample:
    image: np.ndarray  # [H, W, 3] float32 RGB in [0, 1]
    caption: str
    boxes: np.ndarray  # [G, 4] xyxy in image coords
    token_spans: List[List[tuple]]  # per box: [(char_beg, char_end), ...]
    task_index: int


@dataclass
class GroundingTaskSet:
    """One continual task's examples, batched statically.

    With `augment` set, `batches()` applies the reference train pipeline
    (restrict-resize / multi-scale bucketing, hflip with box transform,
    optional jitter, bgr255 normalize — `data/transforms/build.py:36-49`)
    per epoch, and `eval_batches()` the deterministic eval pipeline.
    Without it, images pass through exactly as stored (synthetic fixtures)."""

    examples: List[GroundingExample]
    tokenizer: BertTokenizer
    max_boxes: int = 20
    task_index: int = 0
    augment: Optional[AugmentConfig] = None

    def __len__(self):
        return len(self.examples)

    def _pack(self, batch: Sequence[GroundingExample],
              rng: Optional[np.random.RandomState] = None) -> Dict[str, np.ndarray]:
        B = len(batch)
        max_len = self.tokenizer.max_len
        ids, mask, offsets = self.tokenizer([e.caption for e in batch])
        G = self.max_boxes
        images = []
        boxes = np.zeros((B, G, 4), np.float32)
        valid = np.zeros((B, G), bool)
        pmap = np.zeros((B, G, max_len), np.float32)
        for i, e in enumerate(batch):
            img, bx = e.image, e.boxes
            if self.augment is not None:
                if rng is not None:  # train
                    img, bx = train_transform(rng, img, bx, self.augment)
                else:
                    img, bx = eval_transform(img, bx, self.augment)
            images.append(img)
            g = min(len(bx), G)
            boxes[i, :g] = bx[:g]
            valid[i, :g] = True
            pmap[i, :g] = positive_map_from_spans(
                e.token_spans[:g], offsets[i], max_len)
        return {
            "images": np.stack(images), "input_ids": ids,
            "attention_mask": mask,
            "gt_boxes": boxes, "gt_valid": valid, "positive_map": pmap,
        }

    def batches(self, batch_size: int, seed: int = 0,
                drop_remainder: bool = True) -> Iterator[dict]:
        n = len(self)
        rng = np.random.RandomState(seed)
        order = rng.permutation(n)
        end = n - n % batch_size if drop_remainder else n
        for i in range(0, end, batch_size):
            idx = order[i : i + batch_size]
            if len(idx) < batch_size:
                idx = np.concatenate([idx, order[: batch_size - len(idx)]])
            yield self._pack([self.examples[j] for j in idx],
                             rng=rng if self.augment is not None else None)

    def batches_grouped(self, batch_size: int, seed: int = 0,
                        drop_uneven: bool = True) -> Iterator[dict]:
        """Scale-grouped batches for the multi-scale surface (VERDICT r3 #7,
        reference `samplers/grouped_batch_sampler.py`): each example's scale
        is drawn up front, batches are grouped by scale, and every batch is
        packed at ITS scale's exact static shape — at most |scales| compiled
        programs, zero padding waste (vs pad-to-max's one program +
        `1 - mean(s^2)/max^2` wasted pixels). Requires `augment.multi_scale`;
        without it this is identical to `batches()`.
        """
        import dataclasses

        from lpi_tpu.data.samplers import GroupedBatchSampler, draw_scales

        if self.augment is None or not self.augment.multi_scale:
            yield from self.batches(batch_size, seed=seed,
                                    drop_remainder=drop_uneven)
            return
        scales = draw_scales(len(self), self.augment.multi_scale, seed)
        rng = np.random.RandomState(seed + 1)
        sampler = GroupedBatchSampler(scales, batch_size, seed=seed + 2,
                                      drop_uneven=drop_uneven)
        for idx in sampler:
            s = int(scales[idx[0]])
            # pack at this batch's own scale: single-scale augment config
            per_batch = dataclasses.replace(self.augment, multi_scale=(s,))
            sub = GroundingTaskSet(
                [self.examples[j] for j in idx], self.tokenizer,
                max_boxes=self.max_boxes, task_index=self.task_index,
                augment=per_batch)
            yield sub._pack([self.examples[j] for j in idx], rng=rng)

    def eval_batches(self, batch_size: int) -> Iterator[tuple]:
        n = len(self)
        for i in range(0, n, batch_size):
            idx = list(range(i, min(i + batch_size, n)))
            real = len(idx)
            while len(idx) < batch_size:
                idx.append(idx[-1])
            yield self._pack([self.examples[j] for j in idx]), real, idx[:real]

    def duplicated(self, copies: int) -> "GroundingTaskSet":
        """`DATASETS.GENERAL_COPY` semantics (`duplicate_dataset.py:12-30`):
        index i maps to example i % len — epoch-size multiplication for
        tiny few-shot splits (every ODinW yaml sets GENERAL_COPY)."""
        return GroundingTaskSet(
            [self.examples[i % len(self.examples)]
             for i in range(copies * len(self.examples))],
            self.tokenizer, max_boxes=self.max_boxes,
            task_index=self.task_index, augment=self.augment)

    @classmethod
    def concat(cls, sets: Sequence["GroundingTaskSet"]) -> "GroundingTaskSet":
        """`ConcatDataset` equivalent (`concat_dataset.py`): one task set
        over the concatenated example lists (first set's tokenizer/augment)."""
        first = sets[0]
        examples = [e for s in sets for e in s.examples]
        return cls(examples, first.tokenizer, max_boxes=first.max_boxes,
                   task_index=first.task_index, augment=first.augment)


def load_mdetr_refexp(
    ann_file: str,
    image_root: str,
    task_id: int,
    tokenizer: Optional[BertTokenizer] = None,
    image_size: int = 448,
    max_boxes: int = 20,
    augment: Optional[AugmentConfig] = None,
) -> GroundingTaskSet:
    """Load an mdetr-annotated RefExp COCO json filtered to one task.

    Schema (mdetr final_refexp_val.json style): images carry `caption` and
    `tokens_negative/positive`; annotations carry xywh `bbox`,
    `tokens_positive`, and category ids resolvable to supercategories. Task
    membership = supercategory of the image's FIRST annotation
    (`modulated_coco.py:288-302`).

    Images are stored distort-resized to the transform base size (the
    reference's `Resize(448, 448, restrict=True)`, `build.py:36-41` — NOT
    the yaml's 800/1333, which that line overrides); the per-epoch train
    pipeline (flip / multi-scale / jitter / normalize) is `augment`'s job.
    """
    from PIL import Image

    aug = augment or AugmentConfig(image_size=image_size)
    base = aug.padded_size

    with open(ann_file) as f:
        coco = json.load(f)
    cats = {c["id"]: c for c in coco.get("categories", [])}
    anns_by_img: Dict[int, list] = {}
    for a in coco["annotations"]:
        anns_by_img.setdefault(a["image_id"], []).append(a)

    examples = []
    for img in coco["images"]:
        anns = anns_by_img.get(img["id"])
        if not anns:
            continue
        first_cat = cats.get(anns[0]["category_id"], {})
        super_name = first_cat.get("supercategory", "")
        if SUPERCATEGORY_TO_TASK.get(super_name, -1) != task_id:
            continue
        path = os.path.join(image_root, img["file_name"])
        with Image.open(path) as im:
            im = im.convert("RGB")
            W0, H0 = im.size
            arr = np.asarray(im.resize((base, base), Image.BILINEAR),
                             np.float32) / 255.0
        sx, sy = base / W0, base / H0
        boxes = []
        spans = []
        for a in anns:
            x, y, w, h = a["bbox"]
            boxes.append([x * sx, y * sy, (x + w) * sx, (y + h) * sy])
            spans.append([tuple(s) for s in a.get("tokens_positive", [])])
        examples.append(GroundingExample(
            image=arr, caption=img.get("caption", ""),
            boxes=np.asarray(boxes, np.float32), token_spans=spans,
            task_index=task_id))
    tok = tokenizer or BertTokenizer()
    return GroundingTaskSet(examples, tok, max_boxes=max_boxes,
                            task_index=task_id, augment=aug)


def load_coco_detection(
    ann_file: str,
    image_root: str,
    tokenizer: Optional[BertTokenizer] = None,
    image_size: int = 448,
    max_boxes: int = 20,
    max_images: Optional[int] = None,
    augment: Optional[AugmentConfig] = None,
) -> GroundingTaskSet:
    """COCO-format detection json -> grounding task set.

    Covers the reference's detection-mode datasets (`datasets/coco.py`
    COCODataset, and the COCO-format object365 / VG jsons, SURVEY §2.3 G20)
    through GLIP's detection->grounding conversion: each image's caption
    enumerates the category names and every box's positive map marks its
    class-name span (`od_to_grounding.convert_od_to_grounding_simple`,
    wired like `data/datasets/modulated_coco.py` CocoGrounding).
    """
    from PIL import Image

    from lpi_tpu.data.od_grounding import build_detection_caption

    aug = augment or AugmentConfig(image_size=image_size)
    base = aug.padded_size
    tok = tokenizer or BertTokenizer()

    with open(ann_file) as f:
        coco = json.load(f)
    cats = sorted(coco.get("categories", []), key=lambda c: c["id"])
    cat_index = {c["id"]: i for i, c in enumerate(cats)}
    names = [c.get("name", str(c["id"])) for c in cats]
    caption, spans = build_detection_caption(names)

    anns_by_img: Dict[int, list] = {}
    for a in coco["annotations"]:
        anns_by_img.setdefault(a["image_id"], []).append(a)

    examples = []
    for img in coco["images"]:
        anns = anns_by_img.get(img["id"])
        if not anns:
            continue
        path = os.path.join(image_root, img["file_name"])
        with Image.open(path) as im:
            im = im.convert("RGB")
            W0, H0 = im.size
            arr = np.asarray(im.resize((base, base), Image.BILINEAR),
                             np.float32) / 255.0
        sx, sy = base / W0, base / H0
        boxes = []
        token_spans = []
        for a in anns:
            x, y, w, h = a["bbox"]
            boxes.append([x * sx, y * sy, (x + w) * sx, (y + h) * sy])
            token_spans.append([spans[cat_index[a["category_id"]]]])
        examples.append(GroundingExample(
            image=arr, caption=caption,
            boxes=np.asarray(boxes, np.float32), token_spans=token_spans,
            task_index=0))
        if max_images is not None and len(examples) >= max_images:
            break
    return GroundingTaskSet(examples, tok, max_boxes=max_boxes,
                            task_index=0, augment=aug)


def synthetic_grounding_task(
    task_index: int,
    num_samples: int = 8,
    image_size: int = 64,
    tokenizer: Optional[BertTokenizer] = None,
    max_boxes: int = 4,
    seed: int = 0,
) -> GroundingTaskSet:
    """Synthetic referring-expression set: colored rectangles on noise, with
    captions naming the object; spans mark the object word.

    Geometry is anchor-representable on purpose: rectangle sides span
    [3/8, 5/8] of the image so ATSS (topk candidates, mean+std IoU threshold,
    center-inside) always finds positives against 8x-stride anchors — the
    round-3 gate's 2x-stride anchors + [1/4, 1/2] sides left many GTs with
    ZERO positive anchors, which silently untrained the scoring heads
    (round-4 diagnosis)."""
    rng = np.random.RandomState(seed + 997 * task_index)
    names = ["appliance", "ball", "bench", "phone", "bag", "lamp", "pan",
             "chair", "car", "pizza", "dog", "person"]
    # per-task object colors: the rectangle dominates the pooled last-level
    # feature the task keys cluster on (`generalized_vl_rcnn.py:456-472`
    # clusters `backbone(images)[-1]`), so the object's color carries the
    # task identity — each task's object looks distinct, like the 12 COCO
    # supercategories do
    colors = np.array([
        [1.0, 0.2, 0.2], [0.2, 1.0, 0.2], [0.2, 0.2, 1.0], [1.0, 1.0, 0.2],
        [1.0, 0.2, 1.0], [0.2, 1.0, 1.0], [1.0, 1.0, 1.0], [0.7, 0.4, 0.1],
        [0.1, 0.4, 0.7], [0.6, 0.1, 0.6], [0.4, 0.9, 0.4], [0.9, 0.9, 0.6]])
    name = names[task_index % len(names)]
    examples = []
    for i in range(num_samples):
        img = rng.rand(image_size, image_size, 3).astype(np.float32) * 0.2
        # task background cue strong enough for KMeans key clustering over
        # frozen last-level features (task-ID bar; composes with the
        # task-colored object below)
        img += 0.6 * np.sin(task_index + np.arange(3))[None, None, :]
        w = rng.randint(image_size * 3 // 8, image_size * 5 // 8)
        h = rng.randint(image_size * 3 // 8, image_size * 5 // 8)
        x = rng.randint(0, image_size - w)
        y = rng.randint(0, image_size - h)
        img[y:y + h, x:x + w] += 0.3 + 0.6 * colors[task_index % 12]
        caption = f"the {name} on the left side"
        beg = caption.index(name)
        examples.append(GroundingExample(
            image=img, caption=caption,
            boxes=np.asarray([[x, y, x + w, y + h]], np.float32),
            token_spans=[[(beg, beg + len(name))]],
            task_index=task_index))
    tok = tokenizer or BertTokenizer(max_len=16)
    return GroundingTaskSet(examples, tok, max_boxes=max_boxes,
                            task_index=task_index)

"""Grounding inference predictor + visualization (GLIPDemo equivalent).

Host-side wrapper replacing the reference's
`maskrcnn_benchmark/engine/predictor_glip.py` (GLIPDemo) and the gradio
webui (`grounding/webui/index.py`):

* `find_noun_phrases` / `run_ner` — entity extraction from the caption into
  char spans (`predictor_glip.py:129-150`). The reference uses an nltk POS
  chunker; offline here, a rule-based chunker splits on verbs/prepositions
  and strips leading articles — same spirit, no model download.
* `GroundingPredictor.predict(image, caption)` — resize/pad, tokenize, build
  the positive map, infer the task id from frozen features (KMeans keys),
  run the prompted forward, postprocess, map boxes back to original
  coordinates (`compute_prediction`, `predictor_glip.py:264-332`).
* `draw_predictions` — PIL box/label overlay
  (`visualize_with_predictions_metric`, `:224`).
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_STOP_SPLITTERS = {
    "is", "are", "was", "were", "be", "being", "been", "am",
    "on", "in", "at", "of", "over", "under", "above", "below", "near",
    "next", "to", "with", "without", "behind", "beside", "between",
    "by", "from", "into", "through", "during", "against", "among",
    "and", "or", "that", "which", "who", "while", "holding", "wearing",
    "standing", "sitting", "walking", "running", "looking", "chasing",
    "eating", "playing", "riding", "jumping", "flying", "driving",
    "carrying", "watching", "hanging", "lying", "leaning",
}
_ARTICLES = {"a", "an", "the", "this", "that", "these", "those", "its",
             "his", "her", "their", "my", "your", "our", "some", "another"}


def find_noun_phrases(caption: str) -> List[str]:
    """Heuristic noun-phrase chunker: split at verbs/prepositions, strip
    leading articles, keep non-empty chunks."""
    words = re.findall(r"[a-zA-Z0-9']+", caption.lower())
    phrases: List[List[str]] = []
    cur: List[str] = []
    for w in words:
        if w in _STOP_SPLITTERS:
            if cur:
                phrases.append(cur)
                cur = []
        else:
            cur.append(w)
    if cur:
        phrases.append(cur)
    out = []
    for p in phrases:
        while p and p[0] in _ARTICLES:
            p = p[1:]
        if p:
            out.append(" ".join(p))
    return out


def remove_punctuation(text: str) -> str:
    return re.sub(r"[^\w\s]", "", text).strip()


def run_ner(caption: str) -> Tuple[List[List[Tuple[int, int]]], List[str]]:
    """Entities -> char spans over the caption (all occurrences), exactly the
    reference's regex scan (`predictor_glip.py:137-150`)."""
    phrases = [remove_punctuation(p) for p in find_noun_phrases(caption)]
    phrases = [p for p in phrases if p]
    tokens_positive = []
    entities = []
    for phrase in phrases:
        spans = [(m.start(), m.end())
                 for m in re.finditer(re.escape(phrase), caption.lower())]
        if spans:
            tokens_positive.append(spans)
            entities.append(phrase)
    return tokens_positive, entities


def _flatten_intermediates(tree, prefix=""):
    """Yield (dotted_path, value) leaves of a nested intermediates dict."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten_intermediates(v, f"{prefix}{k}" if not prefix
                                              else f"{prefix}.{k}")
    else:
        yield prefix, tree


class GroundingPredictor:
    """Inference wrapper around a trained GroundingLearner state."""

    def __init__(self, model, params, keys=None, tokenizer=None,
                 image_size: int = 800, score_thresh: float = 0.5,
                 atss_cfg=None):
        from lpi_tpu.data.bert_tokenizer import BertTokenizer

        self.model = model
        self.params = params
        self.keys = keys
        self.tokenizer = tokenizer or BertTokenizer()
        self.image_size = image_size
        self.score_thresh = score_thresh
        self.atss_cfg = atss_cfg
        self._fwd = jax.jit(lambda p, im, ids, m, t: model.apply(
            {"params": p}, im, ids, m, t, method=model.forward_tasks))
        self._extract = jax.jit(lambda p, im: model.apply(
            {"params": p}, im, method=model.extract_features))
        self._fwd_know = {}  # agg_type -> jitted forward_knowledge

    def _prepare_image(self, image: np.ndarray):
        """Match the train/eval pipeline exactly (`data/transforms.py`):
        distorting resize to (image_size, image_size) + BGR*255
        normalization — NOT aspect-preserving RGB [0,1], so trained/converted
        weights see the distribution they were trained on. Returns the
        network input plus per-axis (sx, sy) scales for mapping boxes back.
        """
        from lpi_tpu.data.transforms import normalize_bgr255, resize_distort

        arr = np.asarray(image)
        if arr.ndim == 2 or (arr.ndim == 3 and arr.shape[2] != 3):
            # grayscale / RGBA and friends -> 3-channel RGB via PIL
            from PIL import Image

            u8 = arr if arr.dtype == np.uint8 else \
                np.clip(np.asarray(arr, np.float32) * (255.0 if arr.dtype.kind == "f" else 1.0),
                        0, 255).astype(np.uint8)
            arr = np.asarray(Image.fromarray(u8).convert("RGB"))
        # branch on dtype, not value range: a near-black uint8 image must
        # still be scaled (ADVICE r3 low)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        else:
            arr = np.asarray(arr, np.float32)
        H0, W0 = arr.shape[:2]
        resized, _ = resize_distort(arr, np.zeros((0, 4)),
                                    self.image_size, self.image_size)
        net_in = normalize_bgr255(resized)
        return net_in[None], (self.image_size / W0, self.image_size / H0)

    def check_deform_clipping(self, image: np.ndarray, caption: str = "thing",
                              warn_frac: float = 0.01) -> float:
        """Run one forward collecting the deform-conv offset-clip fractions
        (sown by Conv3x3Norm) and warn if the windowed deform impl would
        clamp a non-trivial share of trained offsets (see
        core/config.py `deform_window`). Returns the max clip fraction."""
        import logging

        canvas, _ = self._prepare_image(image)
        ids, mask, _ = self.tokenizer([caption])
        _, state = self.model.apply(
            {"params": self.params}, jnp.asarray(canvas), jnp.asarray(ids),
            jnp.asarray(mask), jnp.zeros((1,), jnp.int32),
            method=self.model.forward_tasks, mutable=["intermediates"])
        # each Conv3x3Norm sows once per FPN level; take the max over ALL
        # sown entries, not just the first level's (ADVICE r3 low)
        fracs = [max(float(np.asarray(x)) for x in v) for k, v in
                 _flatten_intermediates(state.get("intermediates", {}))
                 if k.endswith("offset_clip_frac")]
        worst = max(fracs, default=0.0)
        if worst > warn_frac:
            logging.getLogger("lpi_tpu").warning(
                "deform offsets exceed the +-window clamp on %.1f%% of "
                "positions; consider raising deform_window or "
                "deform_impl='exact'", 100 * worst)
        return worst

    def predict_classes(self, image: np.ndarray, class_names: Sequence[str],
                        knowledge: Optional[dict] = None,
                        knowledge_type: str = "", gpt3_num: int = 5,
                        wiki_and_gpt3: bool = False,
                        agg_type: str = "first") -> dict:
        """GLIP-KNOW detection-mode inference (PARALLEL_LANGUAGE_INPUT,
        `generalized_vl_rcnn.py:516-660`): class names — optionally expanded
        into knowledge-augmented captions — are encoded ONCE as parallel
        language inputs, one slot per class plus the trailing [NoObj]
        caption; each class slot maps to itself in the positive map."""
        from lpi_tpu.data.knowledge import construct_knowledge_captions
        from lpi_tpu.models.glip.postprocess import atss_postprocess

        caps = construct_knowledge_captions(
            class_names, knowledge, knowledge_type=knowledge_type,
            gpt3_num=gpt3_num, wiki_and_gpt3=wiki_and_gpt3)
        caps = list(caps) + [""]  # [NoObj] slot (`:599-600`)
        ids, mask, _ = self.tokenizer(caps)
        canvas, (sx, sy) = self._prepare_image(image)
        if agg_type not in self._fwd_know:
            self._fwd_know[agg_type] = jax.jit(
                lambda p, im, i, m: self.model.apply(
                    {"params": p}, im, i, m, agg_type,
                    method=self.model.forward_knowledge))
        flat, _ = self._fwd_know[agg_type](
            self.params, jnp.asarray(canvas), jnp.asarray(ids),
            jnp.asarray(mask))
        counts = tuple(int(c) for c in flat["level_counts"])
        label_map = np.eye(len(class_names), len(class_names) + 1,
                           dtype=np.float32)
        kw = {}
        if self.atss_cfg is not None:
            kw = dict(pre_nms_top_n=min(self.atss_cfg.pre_nms_top_n,
                                        flat["anchors"].shape[0]),
                      post_nms_top_n=min(self.atss_cfg.fpn_post_nms_top_n,
                                         flat["anchors"].shape[0]),
                      nms_thresh=self.atss_cfg.nms_thresh,
                      pre_nms_thresh=self.atss_cfg.inference_thresh)
        out = atss_postprocess(
            flat["anchors"], counts, flat["bbox_pred"][0], flat["centerness"][0],
            flat["dot_logits"][0], jnp.asarray(label_map),
            image_size=(self.image_size, self.image_size), **kw)
        valid = np.asarray(out["valid"]) & (np.asarray(out["scores"]) > self.score_thresh)
        boxes = np.asarray(out["boxes"])[valid] / np.asarray(
            [sx, sy, sx, sy], np.float32)
        labels = np.asarray(out["labels"])[valid]
        return {
            "boxes": boxes,
            "scores": np.asarray(out["scores"])[valid],
            "entities": [class_names[l - 1] if 0 < l <= len(class_names)
                         else "?" for l in labels],
        }

    def predict(self, image: np.ndarray, caption: str,
                custom_entity: Optional[str] = None) -> dict:
        """-> dict(boxes [K,4] original coords, scores [K], entities [K])."""
        from lpi_tpu.data.bert_tokenizer import positive_map_from_spans
        from lpi_tpu.models.glip.postprocess import atss_postprocess

        canvas, (sx, sy) = self._prepare_image(image)
        if custom_entity:
            spans = [[(m.start(), m.end())
                      for m in re.finditer(re.escape(custom_entity.lower()),
                                           caption.lower())]]
            entities = [custom_entity]
        else:
            spans, entities = run_ner(caption)
        if not spans:
            return {"boxes": np.zeros((0, 4)), "scores": np.zeros(0), "entities": []}

        ids, mask, offsets = self.tokenizer([caption])
        label_map = positive_map_from_spans(spans, offsets[0], ids.shape[1])

        images = jnp.asarray(canvas)
        if self.keys is not None:
            from lpi_tpu.continual.keys import infer_task_ids

            feats = self._extract(self.params, images)
            sel = infer_task_ids(feats, self.keys)
        else:
            sel = jnp.zeros((1,), jnp.int32)

        flat, _ = self._fwd(self.params, images, jnp.asarray(ids),
                            jnp.asarray(mask), sel)
        counts = tuple(int(c) for c in flat["level_counts"])
        kw = {}
        if self.atss_cfg is not None:
            kw = dict(pre_nms_top_n=min(self.atss_cfg.pre_nms_top_n,
                                        flat["anchors"].shape[0]),
                      post_nms_top_n=min(self.atss_cfg.fpn_post_nms_top_n,
                                         flat["anchors"].shape[0]),
                      nms_thresh=self.atss_cfg.nms_thresh,
                      pre_nms_thresh=self.atss_cfg.inference_thresh)
        out = atss_postprocess(
            flat["anchors"], counts, flat["bbox_pred"][0], flat["centerness"][0],
            flat["dot_logits"][0], jnp.asarray(label_map),
            image_size=(self.image_size, self.image_size), **kw)
        valid = np.asarray(out["valid"]) & (np.asarray(out["scores"]) > self.score_thresh)
        boxes = np.asarray(out["boxes"])[valid] / np.asarray(
            [sx, sy, sx, sy], np.float32)
        labels = np.asarray(out["labels"])[valid]
        return {
            "boxes": boxes,
            "scores": np.asarray(out["scores"])[valid],
            "entities": [entities[l - 1] if 0 < l <= len(entities) else "?"
                         for l in labels],
            "task_id": int(np.asarray(sel)[0]),
        }


def draw_predictions(image: np.ndarray, result: dict):
    """PIL overlay of boxes + entity labels; returns a PIL Image."""
    from PIL import Image, ImageDraw

    im = Image.fromarray(np.asarray(image, np.uint8)).convert("RGB")
    draw = ImageDraw.Draw(im)
    palette = [(255, 64, 64), (64, 200, 64), (64, 128, 255), (255, 200, 0),
               (200, 64, 255), (0, 200, 200)]
    for i, (box, score, ent) in enumerate(zip(result["boxes"], result["scores"],
                                              result["entities"])):
        color = palette[i % len(palette)]
        x1, y1, x2, y2 = [float(v) for v in box]
        draw.rectangle([x1, y1, x2, y2], outline=color, width=3)
        draw.text((x1 + 2, max(y1 - 12, 0)), f"{ent} {score:.2f}", fill=color)
    return im


def draw_predictions_metric(image: np.ndarray, result: dict,
                            metric: str = "R@1", thresh: float = 0.5,
                            show_score: bool = True, box_pixel: int = 3):
    """Metric-annotated overlay (`engine/predictor_glip.py:224-261`,
    `visualize_with_predictions_metric`): keep the top-k detections for the
    chosen recall metric (R@1/R@5/R@10) above `thresh`, draw boxes with a
    score-graded color (low->red, high->green like the reference's
    per-score coloring intent) and print each score at the box's mid-left
    (`overlay_scores`, predictor_glip.py:440-450)."""
    from PIL import Image, ImageDraw

    k = {"R@1": 1, "R@5": 5, "R@10": 10}.get(metric, 1)
    scores = np.asarray(result["scores"], np.float32)
    order = np.argsort(-scores)
    keep = [i for i in order if scores[i] > thresh][:k]

    im = Image.fromarray(np.asarray(image, np.uint8)).convert("RGB")
    draw = ImageDraw.Draw(im)
    for i in keep:
        s = float(scores[i])
        # score-graded color: interpolate red (0) -> yellow (.5) -> green (1)
        color = (int(255 * min(1.0, 2 * (1 - s))),
                 int(255 * min(1.0, 2 * s)), 40)
        x1, y1, x2, y2 = [float(v) for v in result["boxes"][i]]
        draw.rectangle([x1, y1, x2, y2], outline=color, width=box_pixel)
        ent = result["entities"][i] if i < len(result["entities"]) else "?"
        draw.text((x1 + 2, max(y1 - 12, 0)), ent, fill=color)
        if show_score:
            draw.text((x1 + 2, (y1 + y2) / 2), f"{s:.3f}", fill=(255, 255, 255))
    kept = {key: [result[key][i] for i in keep]
            for key in ("boxes", "scores", "entities")}
    return im, kept


def launch_webui(predictor: GroundingPredictor, port: int = 7860):  # pragma: no cover
    """Gradio UI (reference `webui/index.py`); requires gradio installed."""
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError("gradio is not installed in this environment") from e

    def infer(caption, image, metric):
        result = predictor.predict(np.asarray(image), caption)
        if metric == "all":
            return draw_predictions(np.asarray(image), result)
        im, _ = draw_predictions_metric(np.asarray(image), result,
                                        metric=metric)
        return im

    demo = gr.Interface(
        fn=infer,
        inputs=[gr.Textbox(label="caption"), gr.Image(label="image"),
                gr.Dropdown(["all", "R@1", "R@5", "R@10"], value="all",
                            label="metric view")],
        outputs=gr.Image(label="grounded"),
        title="LPI-TPU grounding demo",
    )
    demo.launch(server_port=port)

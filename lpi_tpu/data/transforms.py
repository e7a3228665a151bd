"""Grounding train/eval transforms — the reference's ACTUAL pipeline.

Behavioral port of `maskrcnn_benchmark/data/transforms/build.py:5-49` +
`transforms.py:84-385`, with one load-bearing discovery documented here:
`build_transforms` HARDCODES `min_size = max_size = 448` with
`restrict=True` (`build.py:36-37,41`), overriding the yaml's
MIN/MAX_SIZE_TRAIN 800/1333 — so every LPI grounding run (train AND eval)
actually sees a fixed, aspect-distorting 448x448 resize. The live stack is:

    Resize(448, 448, restrict=True)      # cv2-style distorting square
    RandomHorizontalFlip(0.5)            # train only (AUGMENT.FLIP_PROB_TRAIN)
    ToTensor + Normalize(bgr255)         # PIXEL_MEAN/STD on BGR*255

ColorJitter / crop knobs exist in the reference config (`defaults.py:79-86`)
and transform classes (`transforms.py:141-180`) but are NOT in the composed
list — implemented here anyway (flag-gated, off by default) to cover the
config surface.

TPU-static shapes: multi-scale min-size choice (`transforms.py:93-115`,
AUGMENT.MULT_MIN_SIZE_TRAIN) is supported via pad-to-max bucketing — every
batch ships at the largest scale's static shape with the image occupying the
top-left [s, s] region; boxes stay in resized-pixel coordinates, so padding
never moves them.
"""

from __future__ import annotations

import colorsys
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import numpy as np

# INPUT.PIXEL_MEAN / PIXEL_STD (finetune_A_*.yaml:74-75), applied to
# BGR255 pixels (INPUT.TO_BGR255, defaults.py:66)
PIXEL_MEAN = np.asarray([103.530, 116.280, 123.675], np.float32)
PIXEL_STD = np.asarray([57.375, 57.120, 58.395], np.float32)


@dataclass(frozen=True)
class AugmentConfig:
    """Knobs of the reference AUGMENT/INPUT sections that shape the batch."""

    image_size: int = 448  # the hardcoded restrict-resize (build.py:36-37)
    flip_prob: float = 0.5  # AUGMENT.FLIP_PROB_TRAIN
    multi_scale: Tuple[int, ...] = ()  # AUGMENT.MULT_MIN_SIZE_TRAIN
    brightness: float = 0.0  # AUGMENT.BRIGHTNESS (dead in the composed list)
    contrast: float = 0.0
    saturation: float = 0.0
    hue: float = 0.0
    normalize: bool = True  # bgr255 normalization

    @property
    def padded_size(self) -> int:
        """Static batch size: the largest scale in play."""
        return max(self.multi_scale) if self.multi_scale else self.image_size


def resize_distort(image: np.ndarray, boxes: np.ndarray,
                   out_h: int, out_w: int) -> Tuple[np.ndarray, np.ndarray]:
    """`Resize(restrict=True)` (`transforms.py:97-98,117-127`): resize the
    image to exactly (out_h, out_w) ignoring aspect; boxes scale per-axis."""
    from PIL import Image

    H, W = image.shape[:2]
    arr = np.asarray(
        Image.fromarray((np.clip(image, 0, 1) * 255).astype(np.uint8)).resize(
            (out_w, out_h), Image.BILINEAR), np.float32) / 255.0
    if len(boxes):
        boxes = np.asarray(boxes, np.float32) * np.asarray(
            [out_w / W, out_h / H, out_w / W, out_h / H], np.float32)
    return arr, boxes


def hflip(image: np.ndarray, boxes: np.ndarray,
          content_w: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Horizontal flip with box transform (`transforms.py:129-139` +
    BoxList.transpose). `content_w` flips only the occupied region so
    pad-to-max bucketing keeps padding on the right."""
    W = content_w or image.shape[1]
    out = image.copy()
    out[:, :W] = out[:, :W][:, ::-1]
    if len(boxes):
        boxes = np.asarray(boxes, np.float32)
        boxes = np.stack([W - boxes[:, 2], boxes[:, 1],
                          W - boxes[:, 0], boxes[:, 3]], axis=-1)
    return out, boxes


def color_jitter(rng: np.random.RandomState, image: np.ndarray,
                 brightness: float = 0.0, contrast: float = 0.0,
                 saturation: float = 0.0, hue: float = 0.0) -> np.ndarray:
    """torchvision-ColorJitter semantics on float RGB in [0, 1]
    (`transforms.py:141-158`): each factor drawn U[max(0,1-f), 1+f]; hue
    shifted U[-h, h] in HSV space."""
    out = image.astype(np.float32)
    if brightness > 0:
        out = out * rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
    if contrast > 0:
        f = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
        mean = out.mean()
        out = (out - mean) * f + mean
    if saturation > 0:
        f = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
        gray = out @ np.asarray([0.299, 0.587, 0.114], np.float32)
        out = gray[..., None] + (out - gray[..., None]) * f
    if hue > 0:
        shift = rng.uniform(-hue, hue)
        flat = np.clip(out, 0, 1).reshape(-1, 3)
        hsv = np.stack([colorsys.rgb_to_hsv(*px) for px in flat])
        hsv[:, 0] = (hsv[:, 0] + shift) % 1.0
        out = np.stack([colorsys.hsv_to_rgb(*px) for px in hsv]).reshape(out.shape)
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def normalize_bgr255(image_rgb01: np.ndarray) -> np.ndarray:
    """RGB [0,1] -> the reference's network input: BGR * 255, minus
    PIXEL_MEAN, over PIXEL_STD (`transforms.py:343-359`, TO_BGR255)."""
    bgr = image_rgb01[..., ::-1] * 255.0
    return ((bgr - PIXEL_MEAN) / PIXEL_STD).astype(np.float32)


def train_transform(rng: np.random.RandomState, image: np.ndarray,
                    boxes: np.ndarray, cfg: AugmentConfig
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Full train-time pipeline on one example (image float RGB [0,1]).

    Returns (image [padded, padded, 3], boxes in resized pixels)."""
    pad = cfg.padded_size
    size = (int(rng.choice(cfg.multi_scale)) if cfg.multi_scale
            else cfg.image_size)
    image, boxes = resize_distort(image, boxes, size, size)
    if (cfg.brightness or cfg.contrast or cfg.saturation or cfg.hue):
        image = color_jitter(rng, image, cfg.brightness, cfg.contrast,
                             cfg.saturation, cfg.hue)
    if cfg.flip_prob > 0 and rng.rand() < cfg.flip_prob:
        image, boxes = hflip(image, boxes)
    if size < pad:
        canvas = np.zeros((pad, pad, 3), np.float32)
        canvas[:size, :size] = image
        image = canvas
    if cfg.normalize:
        image = normalize_bgr255(image)
    return image, np.asarray(boxes, np.float32).reshape(-1, 4)


def eval_transform(image: np.ndarray, boxes: np.ndarray,
                   cfg: AugmentConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Eval pipeline: fixed restrict-resize + normalize, padded like train."""
    pad = cfg.padded_size
    image, boxes = resize_distort(image, boxes, cfg.image_size, cfg.image_size)
    if cfg.image_size < pad:
        canvas = np.zeros((pad, pad, 3), np.float32)
        canvas[:cfg.image_size, :cfg.image_size] = image
        image = canvas
    if cfg.normalize:
        image = normalize_bgr255(image)
    return image, np.asarray(boxes, np.float32).reshape(-1, 4)

"""ctypes bindings for the C++ host runtime (`native/lpi_native.cpp`).

Builds to `lpi_tpu/_native.so` (`make -C native`). Every function has a
pure-python/numpy fallback, so the package works without the build; when the
library is present the data pipeline and host post-processing use it
(`is_available()`).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.resize_bilinear_normalize.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
            f32p, f32p]
        lib.center_crop.argtypes = [f32p, ctypes.c_int, ctypes.c_int, f32p,
                                    ctypes.c_int, ctypes.c_int]
        lib.nms.restype = ctypes.c_int
        lib.nms.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float, i32p]
        lib.ml_nms.restype = ctypes.c_int
        lib.ml_nms.argtypes = [f32p, f32p, i32p, ctypes.c_int, ctypes.c_float, i32p]
        lib.soft_nms.restype = ctypes.c_int
        lib.soft_nms.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float,
                                 ctypes.c_float]
        lib.roi_align_forward.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
            ctypes.c_float, ctypes.c_int, ctypes.c_int, f32p]
        _lib = lib
    return _lib


def is_available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def resize_normalize(image_u8: np.ndarray, out_h: int, out_w: int,
                     mean, std) -> np.ndarray:
    """uint8 [H, W, 3] -> normalized float32 [out_h, out_w, 3]."""
    lib = _load()
    image_u8 = np.ascontiguousarray(image_u8, np.uint8)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    if lib is None:
        from PIL import Image

        im = Image.fromarray(image_u8).resize((out_w, out_h), Image.BILINEAR)
        arr = np.asarray(im, np.float32) / 255.0
        return ((arr - mean) / std).astype(np.float32)
    out = np.empty((out_h, out_w, 3), np.float32)
    lib.resize_bilinear_normalize(
        image_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        image_u8.shape[0], image_u8.shape[1], _fp(out), out_h, out_w,
        _fp(mean), _fp(std))
    return out


def center_crop(image_f32: np.ndarray, crop_h: int, crop_w: int) -> np.ndarray:
    lib = _load()
    image_f32 = np.ascontiguousarray(image_f32, np.float32)
    if lib is None:
        sh, sw = image_f32.shape[:2]
        oy, ox = (sh - crop_h) // 2, (sw - crop_w) // 2
        return image_f32[oy:oy + crop_h, ox:ox + crop_w].copy()
    out = np.empty((crop_h, crop_w, 3), np.float32)
    lib.center_crop(_fp(image_f32), image_f32.shape[0], image_f32.shape[1],
                    _fp(out), crop_h, crop_w)
    return out


def nms_cpu(boxes: np.ndarray, scores: np.ndarray,
            iou_threshold: float = 0.5) -> np.ndarray:
    """Greedy NMS -> kept indices, score-descending."""
    lib = _load()
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = len(scores)
    if lib is None:
        order = np.argsort(-scores)
        keep = []
        for i in order:
            if not np.isfinite(scores[i]):
                continue
            if all(_iou_np(boxes[i], boxes[j]) <= iou_threshold for j in keep):
                keep.append(int(i))
        return np.asarray(keep, np.int32)
    out = np.empty(n, np.int32)
    k = lib.nms(_fp(boxes), _fp(scores), n, iou_threshold, _ip(out))
    return out[:k]


def ml_nms_cpu(boxes, scores, labels, iou_threshold: float = 0.5) -> np.ndarray:
    lib = _load()
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    labels = np.ascontiguousarray(labels, np.int32)
    n = len(scores)
    if lib is None:
        order = np.argsort(-scores)
        keep = []
        for i in order:
            if not np.isfinite(scores[i]):
                continue
            if all(labels[i] != labels[j]
                   or _iou_np(boxes[i], boxes[j]) <= iou_threshold for j in keep):
                keep.append(int(i))
        return np.asarray(keep, np.int32)
    out = np.empty(n, np.int32)
    k = lib.ml_nms(_fp(boxes), _fp(scores), _ip(labels), n, iou_threshold, _ip(out))
    return out[:k]


def soft_nms_cpu(boxes, scores, sigma: float = 0.5,
                 score_threshold: float = 0.001) -> Tuple[np.ndarray, int]:
    """Gaussian soft-NMS; returns (decayed scores copy, num kept)."""
    lib = _load()
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32).copy()
    if lib is None:
        done = np.zeros(len(scores), bool)
        kept = 0
        for _ in range(len(scores)):
            cand = np.where(~done & (scores > score_threshold))[0]
            if len(cand) == 0:
                break
            best = cand[np.argmax(scores[cand])]
            done[best] = True
            kept += 1
            for j in np.where(~done)[0]:
                v = _iou_np(boxes[best], boxes[j])
                scores[j] *= np.exp(-(v * v) / sigma)
        return scores, kept
    k = lib.soft_nms(_fp(boxes), _fp(scores), len(scores), sigma, score_threshold)
    return scores, int(k)


def roi_align_cpu(features: np.ndarray, roi: np.ndarray,
                  spatial_scale: float = 1.0, out_size: int = 7,
                  sampling_ratio: int = 2) -> np.ndarray:
    """features [H, W, C], roi [4] -> [out, out, C] (golden reference)."""
    lib = _load()
    features = np.ascontiguousarray(features, np.float32)
    roi = np.ascontiguousarray(roi, np.float32)
    h, w, c = features.shape
    out = np.zeros((out_size, out_size, c), np.float32)
    if lib is None:
        raise RuntimeError("native library not built; use lpi_tpu.ops.roi_align")
    lib.roi_align_forward(_fp(features), h, w, c, _fp(roi), spatial_scale,
                          out_size, sampling_ratio, _fp(out))
    return out


def _iou_np(a, b) -> float:
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    union = (max(0, a[2] - a[0]) * max(0, a[3] - a[1])
             + max(0, b[2] - b[0]) * max(0, b[3] - b[1]) - inter)
    return inter / union if union > 0 else 0.0

"""CPU-side video transforms and sample filters (numpy uint8).

Equivalent of the reference's VideoResizer/crop transforms
(data/dataloader/transform.py:12-152) and metadata filters
(data/dataloader/filters.py) without cv2: PIL-backed resize, numpy crops.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from PIL import Image


def resize_video(video: np.ndarray, short_size: int) -> np.ndarray:
    """Aspect-preserving resize so min(H, W) == short_size.
    video: (T, H, W, 3) uint8."""
    t, h, w, _ = video.shape
    if min(h, w) == short_size:
        return video
    if h < w:
        nh, nw = short_size, max(1, round(w * short_size / h))
    else:
        nh, nw = max(1, round(h * short_size / w)), short_size
    out = np.empty((t, nh, nw, 3), np.uint8)
    for i in range(t):
        out[i] = np.asarray(
            Image.fromarray(video[i]).resize((nw, nh), Image.BILINEAR)
        )
    return out


def crop_video(
    video: np.ndarray,
    crop_h: int,
    crop_w: int,
    random: bool = False,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    t, h, w, _ = video.shape
    assert h >= crop_h and w >= crop_w, (video.shape, crop_h, crop_w)
    if random:
        rng = rng or np.random
        y = rng.randint(0, h - crop_h + 1)
        x = rng.randint(0, w - crop_w + 1)
    else:
        y = (h - crop_h) // 2
        x = (w - crop_w) // 2
    return video[:, y : y + crop_h, x : x + crop_w]


def resize_crop(video, size_hw, random_crop=False, rng=None):
    """resize-short-side then crop to (H, W) — the standard WebVid recipe
    (reference data/dataset.py:126-138)."""
    ch, cw = size_hw
    scale = max(ch / video.shape[1], cw / video.shape[2])
    short = int(np.ceil(min(video.shape[1], video.shape[2]) * scale))
    video = resize_video(video, short)
    return crop_video(video, ch, cw, random=random_crop, rng=rng)


def normalize_video(video: np.ndarray) -> np.ndarray:
    """uint8 -> float32 in [-1, 1] (reference train loop:946-948)."""
    return video.astype(np.float32) / 127.5 - 1.0


# ---------------------------------------------------------------------------
# metadata filters (reference data/dataloader/filters.py)
# ---------------------------------------------------------------------------


class KeyFilter:
    def __init__(self, required=("mp4", "txt")):
        self.required = tuple(required)

    def __call__(self, sample: dict) -> bool:
        return all(k in sample for k in self.required)


class LanguageFilter:
    def __init__(self, languages=("en",), key="json"):
        self.languages = set(languages)
        self.key = key

    def __call__(self, sample: dict) -> bool:
        meta = sample.get(self.key) or {}
        lang = meta.get("language") or meta.get("lang")
        return lang is None or lang in self.languages


class AestheticsFilter:
    def __init__(self, min_score: float = 0.0, key="json"):
        self.min_score = min_score
        self.key = key

    def __call__(self, sample: dict) -> bool:
        meta = sample.get(self.key) or {}
        score = meta.get("aesthetic", meta.get("AESTHETIC_SCORE"))
        return score is None or score >= self.min_score


class UnsafeFilter:
    def __init__(self, max_p: float = 0.99, key="json"):
        self.max_p = max_p
        self.key = key

    def __call__(self, sample: dict) -> bool:
        meta = sample.get(self.key) or {}
        p = meta.get("p_unsafe", meta.get("punsafe"))
        return p is None or p <= self.max_p

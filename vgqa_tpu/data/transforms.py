"""Host-side video/box/text augmentation pipeline (numpy + OpenCV).

Functional parity with /root/reference/vgqa/data/transforms.py:11-213 and the
builder at /root/reference/vgqa/data/build.py:20-57, re-designed for a
static-shape TPU feed: every train sample ends on a fixed square canvas
(``NormalizeAndPad`` semantics, transforms.py:177-213) so the jitted step
compiles once, instead of the reference's variable-H/W batches.

A sample dict carries:
  frames:    [T, H, W, 3] float32 in [0, 1]
  boxes:     [Tb, 4] xyxy pixel coords (aligned to GT-span frames)
  text:      str
  actioness: [T] float
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np


def resize_frames(frames: np.ndarray, h: int, w: int) -> np.ndarray:
    out = np.empty((frames.shape[0], h, w, 3), dtype=frames.dtype)
    for i, f in enumerate(frames):
        out[i] = cv2.resize(f, (w, h), interpolation=cv2.INTER_LINEAR)
    return out


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, sample: Dict) -> Dict:
        for t in self.transforms:
            sample = t(sample)
        return sample


class RandomHorizontalFlip:
    """Flip frames+boxes and swap left/right words in the query
    (parity with transforms.py:47-72)."""

    def __init__(self, prob: float = 0.5, rng: Optional[random.Random] = None):
        self.prob = prob
        self.rng = rng or random

    def __call__(self, sample: Dict) -> Dict:
        if self.rng.random() < self.prob:
            frames = sample["frames"][:, :, ::-1].copy()
            w = frames.shape[2]
            boxes = sample["boxes"].copy()
            boxes[:, [0, 2]] = w - sample["boxes"][:, [2, 0]]
            text = (
                sample["text"]
                .replace("right", "*&^special^&*")
                .replace("left", "right")
                .replace("*&^special^&*", "left")
            )
            sample = {**sample, "frames": frames, "boxes": boxes, "text": text}
        return sample


class RandomSelect:
    def __init__(self, t1, t2, p: float = 0.5, rng=None):
        self.t1, self.t2, self.p = t1, t2, p
        self.rng = rng or random

    def __call__(self, sample: Dict) -> Dict:
        return self.t1(sample) if self.rng.random() < self.p else self.t2(sample)


class RandomResize:
    """Resize so the short side hits a randomly chosen target, capped by
    ``max_size`` on the long side (parity with transforms.py:89-131)."""

    def __init__(self, sizes, max_size: Optional[int] = None, rng=None):
        self.sizes = [sizes] if isinstance(sizes, int) else list(sizes)
        self.max_size = max_size
        self.rng = rng or random

    def get_size(self, h: int, w: int):
        size = self.rng.choice(self.sizes)
        if self.max_size is not None:
            mn, mx = float(min(h, w)), float(max(h, w))
            if mx / mn * size > self.max_size:
                size = int(round(self.max_size * mn / mx))
        if (w <= h and w == size) or (h <= w and h == size):
            return h, w
        if w < h:
            return int(size * h / w), size
        return size, int(size * w / h)

    def __call__(self, sample: Dict) -> Dict:
        t, h, w = sample["frames"].shape[:3]
        nh, nw = self.get_size(h, w)
        frames = resize_frames(sample["frames"], nh, nw)
        boxes = sample["boxes"] * np.array(
            [nw / w, nh / h, nw / w, nh / h], np.float32
        )
        return {**sample, "frames": frames, "boxes": boxes}


class RandomSizeCrop:
    """Crop retrying until no box degenerates
    (parity with transforms.py:134-158)."""

    def __init__(self, min_size: int, max_size: int, max_try: int = 50, rng=None):
        self.min_size, self.max_size, self.max_try = min_size, max_size, max_try
        self.rng = rng or random

    def __call__(self, sample: Dict) -> Dict:
        frames, boxes = sample["frames"], sample["boxes"]
        t, h, w = frames.shape[:3]
        for _ in range(self.max_try):
            tw = self.rng.randint(min(self.min_size, w), max(min(w, self.max_size), min(self.min_size, w)))
            th = self.rng.randint(min(self.min_size, h), max(min(h, self.max_size), min(self.min_size, h)))
            top = self.rng.randint(0, h - th)
            left = self.rng.randint(0, w - tw)
            nb = boxes.copy()
            nb[:, [0, 2]] = np.clip(nb[:, [0, 2]] - left, 0, tw)
            nb[:, [1, 3]] = np.clip(nb[:, [1, 3]] - top, 0, th)
            if ((nb[:, 2] > nb[:, 0]) & (nb[:, 3] > nb[:, 1])).all():
                return {
                    **sample,
                    "frames": frames[:, top : top + th, left : left + tw].copy(),
                    "boxes": nb,
                }
        return sample


class NormalizeAndPad:
    """ImageNet-normalize, letterbox onto a square canvas, convert boxes to
    normalized cxcywh (parity with Normalize + NormalizeAndPad,
    transforms.py:161-213). Emits ``pixel_mask`` True=valid."""

    def __init__(self, mean, std, size: int, aug_translate: bool = False, rng=None):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.size = size
        self.aug_translate = aug_translate
        self.rng = rng or random

    def __call__(self, sample: Dict) -> Dict:
        frames = (sample["frames"] - self.mean) / self.std
        t, h, w = frames.shape[:3]
        assert h <= self.size and w <= self.size, (h, w, self.size)
        dh, dw = self.size - h, self.size - w
        if self.aug_translate:
            top, left = self.rng.randint(0, dh), self.rng.randint(0, dw)
        else:
            top, left = round(dh / 2.0 - 0.1), round(dw / 2.0 - 0.1)

        out = np.zeros((t, self.size, self.size, 3), np.float32)
        mask = np.zeros((self.size, self.size), bool)
        out[:, top : top + h, left : left + w] = frames
        mask[top : top + h, left : left + w] = True

        boxes = sample["boxes"] + np.array([left, top, left, top], np.float32)
        cx = (boxes[:, 0] + boxes[:, 2]) / 2 / self.size
        cy = (boxes[:, 1] + boxes[:, 3]) / 2 / self.size
        bw = (boxes[:, 2] - boxes[:, 0]) / self.size
        bh = (boxes[:, 3] - boxes[:, 1]) / self.size
        norm_boxes = np.stack([cx, cy, bw, bh], axis=1)
        return {
            **sample,
            "frames": out,
            "pixel_mask": mask,
            "boxes": norm_boxes,  # normalized cxcywh from here on
        }


def build_transforms(cfg, is_train: bool, rng=None) -> Compose:
    """Parity with /root/reference/vgqa/data/build.py:20-57, with a final
    pad-to-canvas so shapes are static. The canvas is the configured
    resolution (short-side target); crops/resizes never exceed it."""
    res = cfg.INPUT.RESOLUTION
    mean, std = cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD
    if not is_train:
        return Compose(
            [
                RandomResize([res], max_size=res, rng=rng),
                NormalizeAndPad(mean, std, res, rng=rng),
            ]
        )
    if cfg.INPUT.AUG_SCALE:
        # ladder of short-side targets (build.py:29); keep positive for
        # small debug resolutions
        sizes = [s for s in (res - 32 * i for i in range(4)) if s >= 32] or [res]
    else:
        sizes = [res]
    return Compose(
        [
            RandomHorizontalFlip(cfg.INPUT.FLIP_PROB_TRAIN, rng=rng),
            RandomSelect(
                RandomResize(sizes, max_size=res, rng=rng),
                Compose(
                    [
                        RandomResize([int(res * 0.95), int(res * 1.2), int(res * 1.4)], rng=rng),
                        RandomSizeCrop(
                            int(res * 0.9), int(res * 1.4), rng=rng
                        ),
                        RandomResize(sizes, max_size=res, rng=rng),
                    ]
                ),
                rng=rng,
            ),
            NormalizeAndPad(mean, std, res, cfg.INPUT.AUG_TRANSLATE, rng=rng),
        ]
    )

"""Host-side bounding-box container (numpy).

Parity with ``BoxList`` (/root/reference/vgqa/utils/bounding_boxes.py:8-173):
boxes + image size + mode with resize / flip / crop / normalize ops. The
device pipeline uses raw arrays (utils/boxes.py); this class serves the
host-side augmentation/bookkeeping role the reference exposes publicly.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

FLIP_LEFT_RIGHT = 0
FLIP_TOP_BOTTOM = 1


class BoxList:
    def __init__(self, bbox, image_size: Tuple[int, int], mode: str = "xyxy"):
        arr = np.asarray(bbox, dtype=np.float32)
        if arr.ndim != 2 or arr.shape[-1] != 4:
            raise ValueError(f"bbox must be [N, 4], got {arr.shape}")
        if mode not in ("xyxy", "xywh"):
            raise ValueError("mode should be 'xyxy' or 'xywh'")
        self.bbox = arr
        self.size = tuple(image_size)  # (width, height)
        self.mode = mode

    def __len__(self) -> int:
        return self.bbox.shape[0]

    def _split_xyxy(self):
        if self.mode == "xyxy":
            return np.split(self.bbox, 4, axis=-1)
        xc, yc, w, h = np.split(self.bbox, 4, axis=-1)
        return xc - 0.5 * w, yc - 0.5 * h, xc + 0.5 * w, yc + 0.5 * h

    def convert(self, mode: str) -> "BoxList":
        if mode == self.mode:
            return self
        x0, y0, x1, y1 = self._split_xyxy()
        if mode == "xyxy":
            out = np.concatenate([x0, y0, x1, y1], axis=-1)
        else:
            out = np.concatenate(
                [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
            )
        return BoxList(out, self.size, mode)

    def area(self) -> np.ndarray:
        if self.mode == "xyxy":
            return (self.bbox[:, 2] - self.bbox[:, 0]) * (
                self.bbox[:, 3] - self.bbox[:, 1]
            )
        return self.bbox[:, 2] * self.bbox[:, 3]

    def resize(self, size: Tuple[int, int]) -> "BoxList":
        sw = size[0] / self.size[0]
        sh = size[1] / self.size[1]
        if sw == sh:
            return BoxList(self.bbox * sw, size, self.mode)
        x0, y0, x1, y1 = self._split_xyxy()
        out = np.concatenate([x0 * sw, y0 * sh, x1 * sw, y1 * sh], axis=-1)
        return BoxList(out, size, "xyxy").convert(self.mode)

    def transpose(self, method: int) -> "BoxList":
        w, h = self.size
        x0, y0, x1, y1 = self._split_xyxy()
        if method == FLIP_LEFT_RIGHT:
            out = np.concatenate([w - x1, y0, w - x0, y1], axis=-1)
        elif method == FLIP_TOP_BOTTOM:
            out = np.concatenate([x0, h - y1, x1, h - y0], axis=-1)
        else:
            raise NotImplementedError(method)
        return BoxList(out, self.size, "xyxy").convert(self.mode)

    def crop(self, region) -> "BoxList":
        top, left, h, w = region
        x0, y0, x1, y1 = self._split_xyxy()
        out = np.concatenate(
            [
                np.clip(x0 - left, 0, w),
                np.clip(y0 - top, 0, h),
                np.clip(x1 - left, 0, w),
                np.clip(y1 - top, 0, h),
            ],
            axis=-1,
        )
        return BoxList(out, (w, h), "xyxy").convert(self.mode)

    def check_crop_valid(self, region) -> bool:
        top, left, h, w = region
        x0, y0, x1, y1 = self._split_xyxy()
        x0c = np.clip(x0 - left, 0, w)
        y0c = np.clip(y0 - top, 0, h)
        x1c = np.clip(x1 - left, 0, w)
        y1c = np.clip(y1 - top, 0, h)
        return bool(((x1c > x0c) & (y1c > y0c)).all())

    def normalize(self) -> "BoxList":
        """To [0,1] coordinates, returned in cxcywh ('xywh') mode
        (parity with bounding_boxes.py:149-161)."""
        w, h = self.size
        x0, y0, x1, y1 = self._split_xyxy()
        out = np.concatenate([x0 / w, y0 / h, x1 / w, y1 / h], axis=-1)
        return BoxList(out, self.size, "xyxy").convert("xywh")

    def __getitem__(self, item) -> "BoxList":
        return BoxList(self.bbox[item], self.size, self.mode)

    def copy(self) -> "BoxList":
        return BoxList(self.bbox.copy(), self.size, self.mode)

    def __repr__(self) -> str:
        return (
            f"BoxList(num_boxes={len(self)}, image_width={self.size[0]}, "
            f"image_height={self.size[1]}, mode={self.mode})"
        )

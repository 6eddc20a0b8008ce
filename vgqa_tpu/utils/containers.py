"""Static-shape batch containers.

TPU-native replacement for the reference ``NestedTensor``
(/root/reference/vgqa/utils/training_utils.py:44-104). The reference flattens
a batch of variable-length videos into one [sum(T), C, H, W] tensor with a
Python list of durations — a dynamic-shape design that XLA cannot compile
once. Here every video clip is padded to a static [T, H, W, 3] (NHWC — the
natural TPU conv layout) with explicit boolean validity masks, and a batch
carries a leading V axis that shards over the mesh's data axis.

Mask conventions (note: the *inverse* of the reference, which uses
True=padded): in this codebase ``True`` always means *valid*.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class VideoBatch:
    """A batch of padded video clips.

    frames:     [V, T, H, W, 3] float — normalized pixels, zero in padding
    pixel_mask: [V, H, W] bool        — True where real pixels (spatial pad
                                        from letterboxing to a square canvas;
                                        shared across frames of a clip)
    time_mask:  [V, T] bool           — True where a real (non-pad) frame
    """

    frames: jnp.ndarray
    pixel_mask: jnp.ndarray
    time_mask: jnp.ndarray

    @property
    def num_videos(self) -> int:
        return self.frames.shape[0]

    @property
    def num_frames(self) -> int:
        return self.frames.shape[1]

    def subsample(self, stride: int, start: int = 0) -> "VideoBatch":
        """Temporal stride slice (even/odd two-pass eval,
        cf. /root/reference/vgqa/utils/training_utils.py:62-72)."""
        return VideoBatch(
            frames=self.frames[:, start::stride],
            pixel_mask=self.pixel_mask,
            time_mask=self.time_mask[:, start::stride],
        )

    @classmethod
    def from_clip_list(
        cls, clips: Sequence[np.ndarray], pad_t: int, canvas: int | None = None
    ) -> "VideoBatch":
        """Stack host-side clips [T_i, H_i, W_i, 3] into a padded batch.

        Pads time to ``pad_t`` and space to the max (or ``canvas``) H/W,
        replacing NestedTensor.from_tensor_list
        (/root/reference/vgqa/utils/training_utils.py:74-101) with static
        shapes.
        """
        max_h = max(int(c.shape[1]) for c in clips)
        max_w = max(int(c.shape[2]) for c in clips)
        if canvas is not None:
            max_h = max(max_h, canvas)
            max_w = max(max_w, canvas)
        v = len(clips)
        frames = np.zeros((v, pad_t, max_h, max_w, 3), dtype=np.float32)
        pixel_mask = np.zeros((v, max_h, max_w), dtype=bool)
        time_mask = np.zeros((v, pad_t), dtype=bool)
        for i, clip in enumerate(clips):
            t, h, w = clip.shape[:3]
            assert t <= pad_t, f"clip longer ({t}) than pad_t ({pad_t})"
            frames[i, :t, :h, :w] = clip
            pixel_mask[i, :h, :w] = True
            time_mask[i, :t] = True
        return cls(
            frames=jnp.asarray(frames),
            pixel_mask=jnp.asarray(pixel_mask),
            time_mask=jnp.asarray(time_mask),
        )


def normalize_uint8_video(
    video: "VideoBatch", pixel_stats=None
) -> "VideoBatch":
    """Device-side normalization for the uint8 feed (TPU.UINT8_FEED).

    The host float pipeline normalizes BEFORE padding, so every padded
    element — the spatial letterbox band AND time-padded frames — is 0.0
    in normalized space. A raw uint8 canvas normalizes those zeros to
    -mean/std instead, so both masks must re-zero here (Video Swin's 3D
    windows attend across the unmasked time axis; un-zeroed pad frames
    would bleed into valid features).
    """
    mean, std = pixel_stats or ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
    f = (
        video.frames.astype(jnp.float32) / 255.0
        - jnp.asarray(mean, jnp.float32)
    ) / jnp.asarray(std, jnp.float32)
    valid = (
        video.pixel_mask[:, None, :, :, None]
        & video.time_mask[:, :, None, None, None]
    )
    return VideoBatch(
        jnp.where(valid, f, 0.0), video.pixel_mask, video.time_mask
    )


@struct.dataclass
class TextBatch:
    """A batch of tokenized queries, padded to a static length.

    token_ids: [V, L] int32
    mask:      [V, L] bool — True where a real token
    """

    token_ids: jnp.ndarray
    mask: jnp.ndarray

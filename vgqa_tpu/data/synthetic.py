"""Synthetic VidSTG-style dataset generation (tests, smoke training, bench).

The reference has no test assets; its de-facto fast path is DATA_TRUNK
(/root/reference/vgqa/config/defaults.py:169). This module synthesizes a
complete miniature dataset in the reference's on-disk layout — videos with a
moving target square, sentence annotations, bbox trajectories, and
subject/verb metadata — so every pipeline stage (decode, clip sampling,
transforms, training, evaluation) can run hermetically.
"""

from __future__ import annotations

import json
import os
import random
from typing import List, Tuple

import cv2
import numpy as np


def write_synthetic_video(
    path: str, num_frames: int, size: Tuple[int, int], seed: int = 0
) -> List[List[float]]:
    """Write an mp4 with a colored square moving across a noisy background.

    Returns the per-frame target box [x1, y1, x2, y2]."""
    rng = np.random.RandomState(seed)
    w, h = size
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (w, h)
    )
    assert writer.isOpened(), f"cv2 cannot open writer for {path}"
    boxes = []
    bw, bh = w // 5, h // 5
    for t in range(num_frames):
        frame = rng.randint(0, 80, (h, w, 3), np.uint8)
        fx = int((w - bw - 2) * t / max(1, num_frames - 1)) + 1
        fy = int((h - bh - 2) * (0.5 + 0.4 * np.sin(t / 5))) % (h - bh - 1) + 1
        frame[fy : fy + bh, fx : fx + bw] = (30, 200, 60)
        boxes.append([float(fx), float(fy), float(fx + bw), float(fy + bh)])
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()
    return boxes


def make_synthetic_dataset(
    data_dir: str,
    num_videos: int = 2,
    frames_per_video: int = 40,
    size: Tuple[int, int] = (96, 64),
    splits: Tuple[str, ...] = ("train", "test"),
    seed: int = 0,
) -> None:
    os.makedirs(os.path.join(data_dir, "videos"), exist_ok=True)
    os.makedirs(os.path.join(data_dir, "sent_annos"), exist_ok=True)
    os.makedirs(os.path.join(data_dir, "bbox_annos"), exist_ok=True)
    os.makedirs(os.path.join(data_dir, "annos"), exist_ok=True)

    rng = random.Random(seed)
    w, h = size
    pair_counter = {s: 0 for s in splits}

    for split in splits:
        sent_annos = []
        meta = {}
        for vi in range(num_videos):
            vid = f"{split}_vid{vi:03d}"
            vpath = os.path.join(data_dir, "videos", vid + ".mp4")
            boxes = write_synthetic_video(
                vpath, frames_per_video, size, seed=seed + vi
            )
            begin = rng.randint(4, 10)
            end = rng.randint(frames_per_video - 12, frames_per_video - 5)
            anno = {
                "vid": vid,
                "fps": 10,
                "frame_count": frames_per_video,
                "width": w,
                "height": h,
                "used_segment": {"begin_fid": 0, "end_fid": frames_per_video - 1},
                "temporal_gt": {"begin_fid": begin, "end_fid": end},
                "subject/objects": [{"tid": 0, "category": "square"}],
                "captions": [
                    {
                        "description": "a green square moves to the right",
                        "target_id": 0,
                    }
                ],
                "questions": [
                    {"description": "what moves to the right", "target_id": 0}
                ],
            }
            sent_annos.append(anno)
            trajectories = [
                [{"tid": 0, "bbox": {
                    "xmin": b[0], "ymin": b[1], "xmax": b[2], "ymax": b[3]
                }}]
                for b in boxes
            ]
            with open(
                os.path.join(data_dir, "bbox_annos", vid + ".json"), "w"
            ) as f:
                json.dump({"trajectories": trajectories}, f)

            for _ in range(2):  # caption + question pairs
                meta[str(pair_counter[split])] = {
                    "sub": "the green square",
                    "verb_index_list": [1],
                    "adj_index_list": [0, 2],
                }
                pair_counter[split] += 1

        with open(
            os.path.join(data_dir, "sent_annos", f"{split}_annotations.json"), "w"
        ) as f:
            json.dump(sent_annos, f)
        with open(os.path.join(data_dir, "annos", f"{split}_meta.json"), "w") as f:
            json.dump(meta, f)

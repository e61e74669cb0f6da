"""Synthetic video fixtures: mp4s with planted 'objects' and ground truth.

The reference has no test fixtures at all (SURVEY.md §4: untracked playground
mp4s).  This generator writes small mp4s whose frames carry (a) a per-second
intensity code for decode-parity checks and (b) colored 'object' squares
visible during known intervals, so end-to-end keyframe recall can be tested
hermetically.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class PlantedObject:
    name: str
    interval: Tuple[float, float]   # [start_sec, end_sec)
    color: Tuple[int, int, int]     # RGB
    position: Tuple[float, float]   # center, fraction of (h, w)
    size: float = 0.25              # fraction of min(h, w)


def second_intensity(sec: int) -> int:
    """Deterministic per-second background code (recoverable from pixels)."""
    return (sec * 7) % 200 + 20


def render_frame(
    t: float, hw: Tuple[int, int], objects: Sequence[PlantedObject]
) -> np.ndarray:
    h, w = hw
    frame = np.full((h, w, 3), second_intensity(int(t)), np.uint8)
    for obj in objects:
        if obj.interval[0] <= t < obj.interval[1]:
            cy, cx = int(obj.position[0] * h), int(obj.position[1] * w)
            half = max(2, int(obj.size * min(h, w) / 2))
            y0, y1 = max(0, cy - half), min(h, cy + half)
            x0, x1 = max(0, cx - half), min(w, cx + half)
            frame[y0:y1, x0:x1] = np.asarray(obj.color, np.uint8)
    return frame


def write_synthetic_video(
    path: str,
    duration_sec: float = 60.0,
    fps: float = 10.0,
    hw: Tuple[int, int] = (96, 160),
    objects: Sequence[PlantedObject] = (),
) -> Dict:
    """Write the mp4; returns ground truth metadata."""
    import cv2

    h, w = hw
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    if not writer.isOpened():
        raise RuntimeError(f"cv2.VideoWriter cannot open {path}")
    n_frames = int(round(duration_sec * fps))
    for i in range(n_frames):
        frame = render_frame(i / fps, hw, objects)
        writer.write(frame[:, :, ::-1])  # RGB -> BGR
    writer.release()
    return {
        "path": path,
        "fps": fps,
        "n_frames": n_frames,
        "duration": duration_sec,
        "hw": hw,
        "objects": [dataclasses.asdict(o) for o in objects],
        "gt_seconds": {
            o.name: list(range(int(o.interval[0]), int(np.ceil(o.interval[1]))))
            for o in objects
        },
    }


def default_scene(path: str, duration_sec: float = 120.0) -> Dict:
    """A standard scene: 'couch' visible 70-80 s, 'tv' 30-90 s."""
    objects = [
        PlantedObject("couch", (70.0, 80.0), (200, 40, 40), (0.55, 0.4), 0.45),
        PlantedObject("tv", (30.0, 90.0), (40, 40, 200), (0.3, 0.75), 0.25),
    ]
    return write_synthetic_video(path, duration_sec, objects=objects)

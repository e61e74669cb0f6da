"""Host-side image utilities (reference ``TStar/utilites.py`` equivalents).

Frame loading goes through the framework's own decode service rather than
raw cv2 seeks (utilites.py:40-81); base64/GIF helpers match the reference
formats (JPEG base64 for API grounders :15-37, 1-fps GIF :84-102).
"""

from __future__ import annotations

import base64
import io
import os
from typing import List, Sequence

import numpy as np


def encode_image_to_base64(image) -> str:
    """PIL.Image or HxWx3 uint8 array -> base64 JPEG string."""
    from PIL import Image

    if isinstance(image, np.ndarray):
        image = Image.fromarray(image)
    if not hasattr(image, "save"):
        raise ValueError("Input must be a PIL.Image or numpy.ndarray")
    buf = io.BytesIO()
    image.convert("RGB").save(buf, format="JPEG")
    return base64.b64encode(buf.getvalue()).decode("utf-8")


def load_video_frames(video_path: str, num_frames: int = 8) -> List["np.ndarray"]:
    """Uniformly sample ``num_frames`` RGB frames (utilites.py:40-81 rule:
    frame i at index floor(i * total/num))."""
    from tstar_tpu.video.decoder import open_video

    dec = open_video(video_path)
    try:
        total = dec.meta.total_frames
        if total <= 0:
            raise ValueError("Video has zero frames or could not retrieve frame count.")
        n = min(num_frames, total)
        step = total / n
        indices = [int(np.floor(i * step)) for i in range(n)]
        return list(dec.decode_batch(indices))
    finally:
        dec.close()


def save_as_gif(images: Sequence[np.ndarray], output_gif_path: str, fps: float = 1.0):
    """Animated GIF at 1 fps (utilites.py:84-102)."""
    from PIL import Image

    pil = [Image.fromarray(np.asarray(img).astype(np.uint8)) for img in images]
    if not pil:
        raise ValueError("no images to save")
    pil[0].save(
        output_gif_path,
        save_all=True,
        append_images=pil[1:],
        duration=int(1000 / fps),
        loop=0,
    )


def save_frames_as_jpegs(
    frames: Sequence[np.ndarray], timestamps: Sequence[float], out_dir: str
) -> List[str]:
    """Keyframe JPEG export (TStarFramework.py:136-146 naming scheme)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for idx, (frame, ts) in enumerate(zip(frames, timestamps)):
        p = os.path.join(out_dir, f"frame_{idx}_at_{ts:.2f}s.jpg")
        Image.fromarray(np.asarray(frame).astype(np.uint8)).save(p)
        paths.append(p)
    return paths


def extract_frames_from_gif(input_gif_path: str, output_dir: str) -> int:
    """Explode a GIF into PNG frames (utilites.py:141-162)."""
    from PIL import Image, ImageSequence

    base = os.path.basename(input_gif_path).split(".")[0]
    subdir = os.path.join(output_dir, base)
    os.makedirs(subdir, exist_ok=True)
    count = 0
    with Image.open(input_gif_path) as gif:
        for i, frame in enumerate(ImageSequence.Iterator(gif)):
            frame.convert("RGB").save(os.path.join(subdir, f"frame_{i + 1}.png"))
            count += 1
    return count


def extract_frames_at_fps(video_path: str, output_dir: str, fps: float = 1.0) -> int:
    """Decimate a video to JPEGs at the given rate (utilites.py:107-138)."""
    from PIL import Image

    from tstar_tpu.video.decoder import open_video

    os.makedirs(output_dir, exist_ok=True)
    dec = open_video(video_path)
    try:
        count = int(dec.meta.total_frames / dec.meta.fps * fps)
        frames = dec.decode_sweep(1.0 / fps, count)
        for i, frame in enumerate(frames):
            Image.fromarray(frame).save(
                os.path.join(output_dir, f"frame_{i:04d}.jpg")
            )
        return len(frames)
    finally:
        dec.close()

"""Decode-once frame cache: the bridge from host video files to HBM.

Core TPU design move (SURVEY.md §7.1): the T* search only ever touches the
1-fps sampling grid (reference ``TStar/interface_searcher.py:57,68``), so the
whole grid is decoded ONCE per video in a single forward sweep and shipped to
device memory as a ``(N_pad, cache_h, cache_w, 3)`` uint8 tensor.  Every
subsequent search iteration is pure on-device compute — the reference instead
re-opens the video and decodes per iteration (``:157-169,361``).

At the default 192x384 cache resolution a one-hour video is ~800 MB of HBM;
longer videos should lower ``SearchConfig.cache_hw`` or page (future work).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np

from tstar_tpu.utils.config import SearchConfig
from tstar_tpu.video.decoder import open_video


@dataclasses.dataclass(frozen=True)
class FrameCache:
    frames: jax.Array        # (N_pad, ch, cw, 3) uint8, device-resident
    n_valid: int             # true number of sampled seconds
    raw_fps: float           # container frame rate (for index conversions)
    duration: float          # seconds

    @property
    def n_pad(self) -> int:
        return self.frames.shape[0]


def build_frame_cache(
    video_path: str,
    config: SearchConfig,
    device: Optional[jax.Device] = None,
    decoder=None,
) -> FrameCache:
    """Probe + sweep-decode a video into a padded device-resident cache.

    Mirrors the reference's video property probe (interface_searcher.py:60-68:
    duration = frame_count / fps, N = int(duration * sampling_fps)).
    """
    own = decoder is None
    dec = decoder or open_video(video_path)
    try:
        meta = dec.meta
        if meta.fps <= 0 or meta.total_frames <= 0:
            raise ValueError(f"Cannot probe video: {video_path}")
        duration = meta.total_frames / meta.fps
        n_valid = int(duration * config.sampling_fps)
        k = config.frames_per_iteration
        if n_valid < k:
            raise ValueError(
                f"video too short: {n_valid}s sampled < grid size {k} "
                f"(the reference crashes here too; use a smaller grid)"
            )
        n_pad = config.padded_frames(n_valid)
        period = 1.0 / config.sampling_fps
        frames = dec.decode_sweep(period, n_valid, out_hw=config.cache_hw)
        padded = np.zeros((n_pad, *config.cache_hw, 3), np.uint8)
        padded[:n_valid] = frames
        arr = jax.device_put(padded, device)
        return FrameCache(
            frames=arr, n_valid=n_valid, raw_fps=meta.fps, duration=duration
        )
    finally:
        if own:
            dec.close()

"""Decode-once frame cache: the bridge from host video files to HBM.

Core TPU design move (SURVEY.md §7.1): the T* search only ever touches the
1-fps sampling grid (reference ``TStar/interface_searcher.py:57,68``), so the
whole grid is decoded ONCE per video in a single forward sweep and shipped to
device memory as a ``(N_pad, cache_h, cache_w, 3)`` uint8 tensor.  Every
subsequent search iteration is pure on-device compute — the reference instead
re-opens the video and decodes per iteration (``:157-169,361``).

At the default 192x384 cache resolution a one-hour video is ~800 MB of HBM.
Videos whose full-resolution cache exceeds the HBM budget page instead:
``StreamingFrameCache`` seek-decodes exactly each iteration's sampled seconds
at FULL resolution (duration-independent memory, the reference's
decode-on-demand property), driven by ``engine.run_search_streaming``.
Shrinking the cache resolution to fit (``fit_cache_hw``) is an explicit
opt-in via ``SearchConfig.cache_mode='downscale'``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np

from tstar_tpu.utils.config import SearchConfig
from tstar_tpu.video.decoder import open_video

# Per-video default when searching one video at a time (leaves room for
# detector weights + activations on a 16 GB chip).
DEFAULT_HBM_BUDGET_BYTES = 6 * 1024 ** 3

# Weights + fixed workspace reserve used when deriving budgets from the
# device's total HBM (OWL-ViT B/32 bf16 weights are ~0.4 GB; verification
# forwards, compiler scratch and fragmentation take the rest).
HBM_RESERVE_BYTES = 3 * 1024 ** 3

# Per-video transient workspace of a batched search step: the flat grid
# forward's activations scale with the video batch (the dominant term is
# XLA materializing f32 (B, 12, 577, 577) attention probabilities, ~16 MB
# per video per live buffer).  A 24-video bucket at the r3 default budget
# OOMed with a flat reserve — the workspace term must scale with B.
HBM_PER_VIDEO_WORKSPACE_BYTES = 128 * 1024 ** 2


def device_hbm_bytes(device: Optional[jax.Device] = None) -> int:
    """Usable device memory of the attached accelerator.

    ``memory_stats`` is unavailable on CPU and returns None through the
    TPU attachment relay; the fallback is 14 GiB — the v5e's nominal 16 GB
    minus the system/runtime reserve (empirically probed on this
    attachment: ~14.5 GiB allocable in 1 GiB chunks, a 16 GiB assumption
    OOMed a 24-video bucket that the budget math said should fit).
    """
    try:
        dev = device or jax.devices()[0]
        stats = dev.memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if limit:
            return int(limit)
    except Exception:
        pass
    return 14 * 1024 ** 3


def per_video_hbm_budget(
    bucket_size: int,
    total_bytes: Optional[int] = None,
    reserve_bytes: Optional[int] = None,
    concurrency: int = 2,
    cap: int = DEFAULT_HBM_BUDGET_BYTES,
) -> int:
    """Per-video frame-cache budget for a ``bucket_size``-video batched search.

    The batched pipeline holds up to ``concurrency`` copies of a bucket's
    cache bytes at peak: the stacked search cache plus either the per-video
    staging copies during assembly or the NEXT bucket's prefetched uploads
    during the search (parallel/multi_video.py).  Dividing the usable HBM by
    ``bucket_size * concurrency`` makes ``video.cache.fit_cache_hw`` downscale
    long-video buckets to a resolution where the whole batch fits — the r2
    failure mode was B=24 x 1024 s videos OOMing a 16 GB chip at the default
    per-video budget (VERDICT r2 item 2).

    ``reserve_bytes`` defaults to a fixed weights/scratch term PLUS a
    per-video workspace term (step activations scale with the bucket size).
    """
    total = device_hbm_bytes() if total_bytes is None else total_bytes
    if reserve_bytes is None:
        reserve_bytes = (
            HBM_RESERVE_BYTES
            + bucket_size * HBM_PER_VIDEO_WORKSPACE_BYTES
        )
    usable = max(total - reserve_bytes, total // 4)
    return int(min(cap, usable // max(1, bucket_size * concurrency)))


@dataclasses.dataclass(frozen=True)
class FrameCache:
    frames: jax.Array        # (N_pad, ch, cw, 3) uint8, device-resident
    n_valid: int             # true number of sampled seconds
    raw_fps: float           # container frame rate (for index conversions)
    duration: float          # seconds

    @property
    def n_pad(self) -> int:
        return self.frames.shape[0]


def fit_cache_hw(
    cache_hw: tuple, n_pad: int, hbm_budget_bytes: int
) -> tuple:
    """Shrink the cache resolution (keeping DMA alignment: h % 32 == 0,
    w % 128 == 0) until the cache fits the HBM budget.

    Long videos would otherwise exhaust device memory (a 4-hour video at the
    default 192x384 is ~3.2 GB); lower cache resolution costs some detector
    fidelity but keeps everything device-resident.
    """
    h, w = cache_hw
    while n_pad * h * w * 3 > hbm_budget_bytes and (h > 32 or w > 128):
        if h >= 64:
            h -= 32
        elif w > 128:
            w -= 128
        else:
            break
    return (h, w)


@dataclasses.dataclass
class StreamingFrameCache:
    """Host-paged cache for videos whose full-resolution frame grid exceeds
    the HBM budget (VERDICT r4 item 3): memory is DURATION-INDEPENDENT — the
    reference's decode-on-demand property (interface_searcher.py:157-169) —
    at FULL cache resolution.  ``engine.run_search_streaming`` seek-decodes
    each iteration's sampled seconds on demand through the native decoder's
    keyframe-seek batch path; only a (1, ch, cw, 3) dummy tensor ever lands
    in HBM for shape purposes.

    Not thread-safe (one decoder handle); one instance per video.
    """

    video_path: str
    n_valid: int
    n_pad: int
    raw_fps: float
    duration: float
    cache_hw: tuple
    sampling_fps: float

    def __post_init__(self):
        self._decoder = None

    @property
    def frames(self) -> jax.Array:
        """Shape-bearing dummy for scorer construction (never gathered from
        in streaming mode — detector_scorer._gather_frames reads the step
        buffer instead)."""
        return jax.numpy.zeros((1, *self.cache_hw, 3), jax.numpy.uint8)

    def gather_host(self, secs: np.ndarray) -> np.ndarray:
        """(K,) sampled seconds -> (K, ch, cw, 3) uint8 host frames.

        Pixel-identical to the resident cache's rows: same decoder, same
        second->frame-index mapping, same cache_hw resize (decode_batch and
        decode_sweep share the swscale path in native/video_decoder.cpp)."""
        if self._decoder is None:
            self._decoder = open_video(self.video_path)
        meta = self._decoder.meta
        period = 1.0 / self.sampling_fps
        # Same index mapping as the sweep targets (second k -> first frame at
        # pts >= k*period), clamped like the cv2 fallback's decode_sweep for
        # containers whose duration overestimates the stream.
        idx = [
            min(int(int(s) * period * meta.fps), meta.total_frames - 1)
            for s in secs
        ]
        frames = self._decoder.decode_batch(idx, out_hw=self.cache_hw)
        return np.stack(list(frames))

    def close(self):
        if self._decoder is not None:
            self._decoder.close()
            self._decoder = None


@dataclasses.dataclass(frozen=True)
class HostFrameCache:
    """The decoded, padded cache still in host memory (pre-``device_put``).

    Lets a batched runner decode on host threads while the device searches
    the previous batch, then ship each bucket to HBM right before use."""

    frames: np.ndarray       # (N_pad, ch, cw, 3) uint8, host-resident
    n_valid: int
    raw_fps: float
    duration: float

    @property
    def n_pad(self) -> int:
        return self.frames.shape[0]

    def to_device(self, device: Optional[jax.Device] = None) -> FrameCache:
        return FrameCache(
            frames=jax.device_put(self.frames, device),
            n_valid=self.n_valid, raw_fps=self.raw_fps, duration=self.duration,
        )


def probe_video_length(video_path: str, config: SearchConfig) -> tuple:
    """(n_valid, n_pad) from the container header only — no frame decode.

    Used for length-bucketing a batch before paying for any decode
    (reference probe: interface_searcher.py:60-68)."""
    dec = open_video(video_path)
    try:
        meta = dec.meta
        if meta.fps <= 0 or meta.total_frames <= 0:
            raise ValueError(f"Cannot probe video: {video_path}")
        duration = meta.total_frames / meta.fps
        n_valid = int(duration * config.sampling_fps)
        return n_valid, config.padded_frames(n_valid)
    finally:
        dec.close()


def build_frame_cache_host(
    video_path: str,
    config: SearchConfig,
    decoder=None,
    hbm_budget_bytes: int = DEFAULT_HBM_BUDGET_BYTES,
) -> HostFrameCache:
    """Probe + sweep-decode a video into a padded HOST cache (thread-safe;
    runs fully off-device so decode can overlap device compute)."""
    import logging

    logger = logging.getLogger(__name__)
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
        cache_hw = fit_cache_hw(config.cache_hw, n_pad, hbm_budget_bytes)
        if cache_hw != tuple(config.cache_hw):
            logger.warning(
                "frame cache downscaled %s -> %s to fit the %.1f GB HBM "
                "budget (%d seconds of video)",
                tuple(config.cache_hw), cache_hw,
                hbm_budget_bytes / 1024 ** 3, n_valid,
            )
        period = 1.0 / config.sampling_fps
        frames = dec.decode_sweep(period, n_valid, out_hw=cache_hw)
        padded = np.zeros((n_pad, *cache_hw, 3), np.uint8)
        padded[:n_valid] = frames
        return HostFrameCache(
            frames=padded, n_valid=n_valid, raw_fps=meta.fps, duration=duration
        )
    finally:
        if own:
            dec.close()


def build_frame_cache(
    video_path: str,
    config: SearchConfig,
    device: Optional[jax.Device] = None,
    decoder=None,
    hbm_budget_bytes: int = DEFAULT_HBM_BUDGET_BYTES,
):
    """Probe + decode policy dispatch (``SearchConfig.cache_mode``).

    Mirrors the reference's video property probe (interface_searcher.py:60-68:
    duration = frame_count / fps, N = int(duration * sampling_fps)).  Videos
    whose full-resolution cache fits ``hbm_budget_bytes`` decode ONCE into a
    device-resident ``FrameCache``; longer videos return a
    ``StreamingFrameCache`` (host-paged per iteration at FULL cache_hw —
    duration-independent memory).  The legacy resolution downscale is an
    explicit opt-in (``cache_mode="downscale"``), no longer the silent
    default (VERDICT r4 item 3).
    """
    import logging

    logger = logging.getLogger(__name__)
    mode = config.cache_mode
    if mode not in ("auto", "resident", "streaming", "downscale"):
        raise ValueError(f"unknown cache_mode={mode!r}")

    if mode in ("auto", "streaming", "resident"):
        n_valid, n_pad = probe_video_length(video_path, config)
        h, w = config.cache_hw
        resident_bytes = n_pad * h * w * 3
        over = resident_bytes > hbm_budget_bytes
        if mode == "streaming" or (mode == "auto" and over):
            if mode == "auto":
                logger.warning(
                    "frame cache for %s (%d s, %.2f GB at full %s) exceeds "
                    "the %.1f GB HBM budget: using the host-paged streaming "
                    "cache at FULL resolution (cache_mode='downscale' "
                    "restores the old shrink-resolution behavior)",
                    video_path, n_valid, resident_bytes / 1024 ** 3,
                    tuple(config.cache_hw), hbm_budget_bytes / 1024 ** 3,
                )
            dec = decoder or open_video(video_path)
            meta = dec.meta
            duration = meta.total_frames / meta.fps
            if decoder is None:
                dec.close()
            k = config.frames_per_iteration
            if n_valid < k:
                raise ValueError(
                    f"video too short: {n_valid}s sampled < grid size {k}"
                )
            return StreamingFrameCache(
                video_path=video_path, n_valid=n_valid, n_pad=n_pad,
                raw_fps=meta.fps, duration=duration,
                cache_hw=tuple(config.cache_hw),
                sampling_fps=config.sampling_fps,
            )
        if mode == "resident" and over:
            raise ValueError(
                f"cache_mode='resident' but {video_path} needs "
                f"{resident_bytes / 1024 ** 3:.2f} GB > budget "
                f"{hbm_budget_bytes / 1024 ** 3:.2f} GB"
            )
        hbm_budget_bytes = max(hbm_budget_bytes, resident_bytes)  # no shrink

    host = build_frame_cache_host(
        video_path, config, decoder=decoder, hbm_budget_bytes=hbm_budget_bytes
    )
    return host.to_device(device)

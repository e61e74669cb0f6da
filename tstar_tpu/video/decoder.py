"""Video decode service: native FFmpeg module with an OpenCV fallback.

The reference's hot I/O path re-opens a decord ``VideoReader`` for every
batched read inside the search loop and probes properties with
``cv2.VideoCapture`` (reference ``TStar/interface_searcher.py:60-65,157-169``).
Here a persistent decoder handle (C++ FFmpeg, ``native/video_decoder.cpp``)
provides:

  * ``probe``            — fps / frame count / dimensions, once;
  * ``decode_sweep``     — ONE forward pass picking a frame per sampling
                           period, which fills the HBM frame cache that the
                           on-device search loop consumes (the decode-once
                           design that removes per-iteration host decode);
  * ``decode_batch``     — random-access batched reads with keyframe seeks
                           (keyframe export, QA frames, eval tooling).

The native library builds on demand via ``make -C native`` and falls back to
an OpenCV implementation with the same API when unavailable.
"""

from __future__ import annotations

import ctypes
import dataclasses
import logging
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libtstar_video.so"))
_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lib_lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception as e:  # noqa: BLE001
                logger.warning("native video decoder build failed: %s", e)
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.warning("native video decoder load failed: %s", e)
            _lib_failed = True
            return None
        lib.vd_open.restype = ctypes.c_void_p
        lib.vd_open.argtypes = [ctypes.c_char_p]
        lib.vd_close.argtypes = [ctypes.c_void_p]
        lib.vd_probe.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vd_error.restype = ctypes.c_char_p
        lib.vd_error.argtypes = [ctypes.c_void_p]
        lib.vd_decode_batch.restype = ctypes.c_int
        lib.vd_decode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.vd_decode_sweep.restype = ctypes.c_int
        lib.vd_decode_sweep.argtypes = [
            ctypes.c_void_p,
            ctypes.c_double,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


@dataclasses.dataclass(frozen=True)
class VideoMeta:
    fps: float
    total_frames: int
    width: int
    height: int

    @property
    def duration(self) -> float:
        return self.total_frames / self.fps if self.fps else 0.0


class NativeDecoder:
    """ctypes wrapper over native/video_decoder.cpp."""

    def __init__(self, path: str):
        lib = _load_native()
        if lib is None:
            raise RuntimeError("native video decoder unavailable")
        self._lib = lib
        self._h = lib.vd_open(path.encode())
        if not self._h:
            raise ValueError(f"Cannot open video file: {path}")
        self.path = path
        fps = ctypes.c_double()
        frames = ctypes.c_int64()
        w = ctypes.c_int()
        h = ctypes.c_int()
        lib.vd_probe(self._h, fps, frames, w, h)
        self.meta = VideoMeta(fps.value, int(frames.value), w.value, h.value)

    def decode_batch(
        self, indices: Sequence[int], out_hw: Optional[tuple] = None
    ) -> np.ndarray:
        h, w = out_hw if out_hw else (self.meta.height, self.meta.width)
        idx = np.ascontiguousarray(np.asarray(indices, np.int64))
        out = np.empty((len(idx), h, w, 3), np.uint8)
        n = self._lib.vd_decode_batch(
            self._h,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w, h,
        )
        if n != len(idx):
            err = self._lib.vd_error(self._h).decode()
            raise RuntimeError(
                f"decode_batch wrote {n}/{len(idx)} frames for {self.path}: {err}"
            )
        return out

    def decode_sweep(
        self, period: float, count: int, out_hw: Optional[tuple] = None
    ) -> np.ndarray:
        h, w = out_hw if out_hw else (self.meta.height, self.meta.width)
        out = np.empty((count, h, w, 3), np.uint8)
        n = self._lib.vd_decode_sweep(
            self._h, period, count,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
        )
        if n <= 0:
            err = self._lib.vd_error(self._h).decode()
            raise RuntimeError(f"decode_sweep failed for {self.path}: {err}")
        if n < count:
            out[n:] = out[n - 1]
        return out

    def close(self):
        if self._h:
            self._lib.vd_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass


class Cv2Decoder:
    """OpenCV fallback with the same API (seek-based, slower)."""

    def __init__(self, path: str):
        import cv2

        self._cv2 = cv2
        self._cap = cv2.VideoCapture(path)
        if not self._cap.isOpened():
            raise ValueError(f"Cannot open video file: {path}")
        self.path = path
        self.meta = VideoMeta(
            fps=self._cap.get(cv2.CAP_PROP_FPS),
            total_frames=int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT)),
            width=int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            height=int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        )

    def _read_at(self, index: int, out_hw: Optional[tuple]) -> np.ndarray:
        cv2 = self._cv2
        self._cap.set(cv2.CAP_PROP_POS_FRAMES, int(index))
        ok, frame = self._cap.read()
        if not ok:
            raise RuntimeError(f"cv2 failed reading frame {index} of {self.path}")
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if out_hw:
            frame = cv2.resize(
                frame, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR
            )
        return frame

    def decode_batch(
        self, indices: Sequence[int], out_hw: Optional[tuple] = None
    ) -> np.ndarray:
        return np.stack([self._read_at(int(i), out_hw) for i in indices])

    def decode_sweep(
        self, period: float, count: int, out_hw: Optional[tuple] = None
    ) -> np.ndarray:
        fps = self.meta.fps
        idx = [min(int(k * period * fps), self.meta.total_frames - 1) for k in range(count)]
        return self.decode_batch(idx, out_hw)

    def close(self):
        self._cap.release()


def open_video(path: str, prefer_native: bool = True):
    """Open a decoder handle; native FFmpeg if available, else OpenCV."""
    if prefer_native:
        try:
            return NativeDecoder(path)
        except (RuntimeError, ValueError) as e:
            if isinstance(e, ValueError):
                raise  # file problem, not a backend problem
            logger.warning("falling back to cv2 decoder: %s", e)
    return Cv2Decoder(path)

"""Video decode service tests: native FFmpeg vs OpenCV parity, cache build."""

import numpy as np
import pytest

from tstar_tpu.utils.config import SearchConfig
from tstar_tpu.video.cache import build_frame_cache
from tstar_tpu.video.decoder import Cv2Decoder, NativeDecoder, open_video
from tstar_tpu.video.synthetic import (
    PlantedObject,
    second_intensity,
    write_synthetic_video,
)

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    d = tmp_path_factory.mktemp("videos")
    path = str(d / "scene.mp4")
    meta = write_synthetic_video(
        path,
        duration_sec=40.0,
        fps=10.0,
        hw=(96, 160),
        objects=[PlantedObject("couch", (20.0, 25.0), (200, 40, 40), (0.5, 0.5), 0.5)],
    )
    return path, meta


def _native_or_skip(path):
    try:
        return NativeDecoder(path)
    except RuntimeError:
        pytest.skip("native decoder unavailable")


class TestProbe:
    def test_native_matches_cv2(self, video):
        path, meta = video
        nat = _native_or_skip(path)
        cv = Cv2Decoder(path)
        assert nat.meta.fps == pytest.approx(cv.meta.fps, rel=1e-3)
        assert nat.meta.total_frames == cv.meta.total_frames == meta["n_frames"]
        assert (nat.meta.width, nat.meta.height) == (160, 96)
        nat.close()
        cv.close()


class TestDecodeBatch:
    def test_frames_match_cv2_and_ground_truth(self, video):
        path, meta = video
        nat = _native_or_skip(path)
        cv = Cv2Decoder(path)
        indices = [0, 55, 113, 250, 399, 7]   # unsorted on purpose
        got = nat.decode_batch(indices)
        want = cv.decode_batch(indices)
        for i, idx in enumerate(indices):
            # mp4v is lossy: compare mean intensity to the planted code
            sec = int(idx / meta["fps"])
            bg = second_intensity(sec)
            assert abs(float(got[i, :20, :20].mean()) - bg) < 6, (i, idx)
            assert abs(float(got[i].mean()) - float(want[i].mean())) < 3
        nat.close()
        cv.close()

    def test_resized_output(self, video):
        path, _ = video
        nat = _native_or_skip(path)
        out = nat.decode_batch([10, 20], out_hw=(48, 80))
        assert out.shape == (2, 48, 80, 3)
        nat.close()


class TestDecodeSweep:
    def test_one_frame_per_second(self, video):
        path, meta = video
        nat = _native_or_skip(path)
        frames = nat.decode_sweep(1.0, 40, out_hw=(48, 80))
        assert frames.shape == (40, 48, 80, 3)
        for sec in [0, 7, 19, 33, 39]:
            bg = second_intensity(sec)
            assert abs(float(frames[sec, :10, :10].mean()) - bg) < 6, sec
        # planted object visible at 20..24 (red square center)
        center = frames[22, 24, 40]
        assert center[0] > 120 and center[2] < 120
        nat.close()

    def test_count_beyond_eof_pads(self, video):
        path, _ = video
        nat = _native_or_skip(path)
        frames = nat.decode_sweep(1.0, 45, out_hw=(24, 40))
        assert frames.shape[0] == 45
        np.testing.assert_array_equal(frames[44], frames[39])
        nat.close()


class TestFrameCache:
    def test_build(self, video):
        path, meta = video
        cfg = SearchConfig(cache_hw=(48, 80), grid_rows=4, grid_cols=4)
        cache = build_frame_cache(path, cfg)
        assert cache.n_valid == 40
        assert cache.frames.shape == (128, 48, 80, 3)
        assert cache.raw_fps == pytest.approx(10.0, rel=1e-3)
        arr = np.asarray(cache.frames)
        assert (arr[40:] == 0).all()
        bg = second_intensity(13)
        assert abs(float(arr[13, :10, :10].mean()) - bg) < 6

    def test_hbm_budget_downscales_cache(self, video):
        from tstar_tpu.video.cache import fit_cache_hw

        # 4 hours at 192x384 ~ 3.2 GB; a 1 GB budget must shrink it.
        hw = fit_cache_hw((192, 384), 14464, 1 * 1024 ** 3)
        assert hw != (192, 384)
        assert hw[0] % 32 == 0 and hw[1] % 128 == 0
        assert 14464 * hw[0] * hw[1] * 3 <= 1 * 1024 ** 3
        # short videos keep the full resolution
        assert fit_cache_hw((192, 384), 1024, 6 * 1024 ** 3) == (192, 384)

        # Shrinking resolution is an explicit opt-in now
        # (cache_mode="downscale"); the default routes over-budget videos to
        # the full-resolution streaming cache (test_streaming_cache.py).
        path, _ = video
        cfg = SearchConfig(cache_hw=(64, 128), grid_rows=4, grid_cols=4,
                           cache_mode="downscale")
        cache = build_frame_cache(path, cfg, hbm_budget_bytes=40 * 48 * 80 * 3)
        assert cache.frames.shape[1] < 64 or cache.frames.shape[2] < 128 \
            or cache.frames.shape[1:3] == (32, 128)

    def test_batched_budget_fits_24_videos_in_16gb(self):
        """VERDICT r2 item 2 done-criterion: a 24-video bucket of 1024 s
        videos resolves to a cache resolution where the whole pipeline
        (stacked cache + pipelining copies + reserve) fits a 16 GB chip."""
        from tstar_tpu.video.cache import (
            HBM_PER_VIDEO_WORKSPACE_BYTES,
            HBM_RESERVE_BYTES,
            fit_cache_hw,
            per_video_hbm_budget,
        )

        total = 16 * 1024 ** 3
        bucket, n_pad = 24, 1152  # 1024 s padded to the 128 multiple
        budget = per_video_hbm_budget(bucket, total_bytes=total)
        hw = fit_cache_hw((192, 384), n_pad, budget)
        per_video = n_pad * hw[0] * hw[1] * 3
        assert per_video <= budget
        # 2x concurrency (stack assembly / next-bucket prefetch) + the
        # batch-aware reserve (weights/scratch + per-video step workspace)
        reserve = HBM_RESERVE_BYTES + bucket * HBM_PER_VIDEO_WORKSPACE_BYTES
        assert bucket * 2 * per_video + reserve <= total
        # and the downscale is moderate, not a collapse to the floor
        assert hw[0] >= 128 and hw[1] >= 256

    def test_per_video_budget_small_buckets_keep_default(self):
        from tstar_tpu.video.cache import (
            DEFAULT_HBM_BUDGET_BYTES,
            HBM_PER_VIDEO_WORKSPACE_BYTES,
            HBM_RESERVE_BYTES,
            per_video_hbm_budget,
        )

        total = 16 * 1024 ** 3
        # B=1 on a 16 GB pool: capped at the single-video default
        assert per_video_hbm_budget(1, total_bytes=total) == \
            DEFAULT_HBM_BUDGET_BYTES
        # B=2: (total - reserve(2)) / 4
        want = (total - HBM_RESERVE_BYTES
                - 2 * HBM_PER_VIDEO_WORKSPACE_BYTES) // 4
        assert per_video_hbm_budget(2, total_bytes=total) == want

    def test_too_short_video_raises(self, tmp_path):
        path = str(tmp_path / "short.mp4")
        write_synthetic_video(path, duration_sec=5.0, fps=10.0, hw=(48, 64))
        with pytest.raises(ValueError, match="too short"):
            build_frame_cache(path, SearchConfig(cache_hw=(24, 32)))


class TestOpenVideo:
    def test_missing_file_raises(self):
        with pytest.raises(ValueError):
            open_video("/nonexistent/video.mp4")

    def test_corrupt_and_empty_files_raise(self, tmp_path):
        import os

        garbage = tmp_path / "garbage.mp4"
        garbage.write_bytes(os.urandom(4096))
        with pytest.raises(ValueError, match="Cannot open"):
            open_video(str(garbage))
        empty = tmp_path / "empty.mp4"
        empty.write_bytes(b"")
        with pytest.raises(ValueError, match="Cannot open"):
            open_video(str(empty))

    def test_truncated_container_raises(self, tmp_path, video):
        path, _ = video
        trunc = tmp_path / "trunc.mp4"
        trunc.write_bytes(open(path, "rb").read()[:1024])
        with pytest.raises(ValueError, match="Cannot open"):
            open_video(str(trunc))

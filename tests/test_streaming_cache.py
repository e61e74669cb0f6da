"""Streaming (host-paged) frame cache for over-HBM-budget videos.

VERDICT r4 item 3: the reference decodes on demand so a 4-hour video costs no
more memory than a 4-minute one (interface_searcher.py:157-169); the streaming
cache restores that duration-independent property at FULL cache resolution.
These tests pin:
  * build_frame_cache policy dispatch (auto / resident / streaming / downscale)
  * pixel parity of the per-iteration seek-decode with the resident sweep rows
  * trajectory IDENTITY of the streaming driver vs the resident while_loop
    search (engine-level with a fake stream, and end-to-end through
    KeyframeSearcher on a real file)
  * the batched runner routing over-budget videos to the streaming path
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tstar_tpu.models.clip_tokenizer import HashTokenizer
from tstar_tpu.models.owlvit import (
    OwlViTConfig,
    OwlViTDetector,
    TextConfig,
    VisionConfig,
)
from tstar_tpu.search.detector_scorer import make_owlvit_scorer
from tstar_tpu.search.engine import run_search, run_search_streaming
from tstar_tpu.search.state import init_state
from tstar_tpu.utils.config import SearchConfig
from tstar_tpu.video.cache import (
    FrameCache,
    StreamingFrameCache,
    build_frame_cache,
)
from tstar_tpu.video.synthetic import PlantedObject, write_synthetic_video

pytest.importorskip("cv2")

TINY = OwlViTConfig(
    vision=VisionConfig(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        patch_size=16, image_size=64,
    ),
    text=TextConfig(
        vocab_size=100, hidden_size=24, num_layers=2, num_heads=4,
        intermediate_size=48, max_length=8,
    ),
    projection_dim=24,
)

CACHE_HW = (48, 80)
CFG = SearchConfig(
    cache_hw=CACHE_HW, search_budget=0.5, confidence_threshold=0.2,
    grid_rows=4, grid_cols=4,
)


class TinyOwlHeuristic:
    """Heuristic shim: the real OwlVitScorer over a tiny random detector."""

    def __init__(self, seed: int = 0):
        self.model = OwlViTDetector(TINY, dtype=jnp.float32)
        self.variables = self.model.init(
            jax.random.key(seed),
            jnp.zeros((1, 64, 64, 3), jnp.float32),
            jnp.zeros((2, 8), jnp.int32),
        )
        self.tokenizer = HashTokenizer(vocab_size=100, context=8)

    def build_scorer(self, frames, target_objects, cue_objects, config):
        return make_owlvit_scorer(
            self.model, self.variables, frames,
            target_objects=target_objects, cue_objects=cue_objects,
            tokenizer=self.tokenizer, config=config,
        )


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_videos")
    path = str(d / "scene.mp4")
    meta = write_synthetic_video(
        path,
        duration_sec=60.0,
        fps=10.0,
        hw=(96, 160),
        objects=[
            PlantedObject("couch", (30.0, 36.0), (200, 40, 40), (0.5, 0.5), 0.5)
        ],
    )
    return path, meta


@pytest.fixture(scope="module")
def heuristic():
    return TinyOwlHeuristic()


class FakeStream:
    """gather_host over a host copy of a resident cache: pixel-identical to
    the resident rows by construction, isolating the DRIVER's trajectory."""

    def __init__(self, frames: np.ndarray):
        self._frames = frames

    def gather_host(self, secs: np.ndarray) -> np.ndarray:
        return self._frames[secs]


class TestCachePolicy:
    def test_auto_fits_resident(self, video):
        cache = build_frame_cache(video[0], CFG)
        assert isinstance(cache, FrameCache)
        assert cache.frames.shape[1:3] == CACHE_HW

    def test_auto_over_budget_streams_at_full_resolution(self, video):
        cache = build_frame_cache(video[0], CFG, hbm_budget_bytes=100_000)
        assert isinstance(cache, StreamingFrameCache)
        assert cache.cache_hw == CACHE_HW          # NOT downscaled
        assert cache.n_valid == 60

    def test_streaming_forced(self, video):
        cfg = dataclasses.replace(CFG, cache_mode="streaming")
        assert isinstance(build_frame_cache(video[0], cfg), StreamingFrameCache)

    def test_resident_over_budget_raises(self, video):
        cfg = dataclasses.replace(CFG, cache_mode="resident")
        with pytest.raises(ValueError, match="resident"):
            build_frame_cache(video[0], cfg, hbm_budget_bytes=100_000)

    def test_unknown_mode_raises(self, video):
        cfg = dataclasses.replace(CFG, cache_mode="nope")
        with pytest.raises(ValueError, match="cache_mode"):
            build_frame_cache(video[0], cfg)

    def test_duration_independent_memory(self, video):
        """The streaming cache's only device tensor is the (1, ch, cw, 3)
        shape dummy — duration never enters its size."""
        stream = build_frame_cache(
            video[0], CFG, hbm_budget_bytes=100_000
        )
        assert stream.frames.shape == (1, *CACHE_HW, 3)


class TestPixelParity:
    def test_gather_host_matches_resident_rows(self, video):
        """Per-iteration seek-decode == the decode-once sweep rows (same
        decoder, same second->frame mapping, same swscale resize) on a CFR
        input."""
        resident = build_frame_cache(video[0], CFG)
        stream = build_frame_cache(video[0], CFG, hbm_budget_bytes=100_000)
        secs = np.asarray([0, 7, 13, 31, 59, 2], np.int32)
        got = stream.gather_host(secs)
        want = np.asarray(resident.frames)[secs]
        np.testing.assert_array_equal(got, want)
        stream.close()


class TestEngineTrajectory:
    def test_streaming_driver_identical_to_while_loop(self, heuristic):
        """run_search_streaming == run_search seed-for-seed when the stream
        supplies the exact resident pixels (fake stream)."""
        rng = np.random.default_rng(0)
        n_valid = 150
        n_pad = CFG.padded_frames(n_valid)
        host = rng.integers(0, 256, size=(n_pad, *CACHE_HW, 3), dtype=np.uint8)
        scorer = heuristic.build_scorer(
            jnp.asarray(host), ["couch", "lamp"], ["tv", "chair"], CFG
        )
        state = init_state(n_valid, 2, CFG, jax.random.key(1), n_pad=n_pad)

        final_r, secs_r = jax.jit(run_search, static_argnums=2)(
            state, scorer, CFG
        )
        # streaming scorer: dummy cache proves nothing reads it
        stream_scorer = scorer.replace(
            cache=jnp.zeros((1, *CACHE_HW, 3), jnp.uint8)
        )
        final_s, secs_s = run_search_streaming(
            state, stream_scorer, FakeStream(host), CFG
        )
        np.testing.assert_array_equal(np.asarray(secs_r), np.asarray(secs_s))
        assert int(final_r.iteration) == int(final_s.iteration)
        np.testing.assert_array_equal(
            np.asarray(final_r.remaining), np.asarray(final_s.remaining)
        )
        np.testing.assert_allclose(
            np.asarray(final_r.scores), np.asarray(final_s.scores), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(final_r.P), np.asarray(final_s.P), atol=1e-6
        )

    def test_table_scorer_raises(self):
        from tstar_tpu.search.scorers import TableScorer

        n = 128
        scorer = TableScorer(
            grid_conf=jnp.zeros((n,)),
            grid_presence=jnp.zeros((n, 4), bool),
            verify_conf=jnp.zeros((n,)),
            verify_presence=jnp.zeros((n, 4), bool),
        )
        state = init_state(100, 2, CFG, jax.random.key(0), n_pad=n)
        with pytest.raises(TypeError, match="streaming"):
            run_search_streaming(state, scorer, FakeStream(None), CFG)


class TestSearcherEndToEnd:
    def test_streaming_search_equals_resident(self, video, heuristic):
        """KeyframeSearcher end-to-end on a real file: the streaming path
        (real per-iteration seek-decode) reproduces the resident search's
        keyframes and final state exactly."""
        from tstar_tpu.search.searcher import KeyframeSearcher

        def run(cache):
            s = KeyframeSearcher(
                video[0], heuristic, ["couch"], ["chair", "table"],
                config=CFG, seed=3, cache=cache,
            )
            frames, ts = s.search()
            return s, frames, ts

        s_res, frames_res, ts_res = run(build_frame_cache(video[0], CFG))
        stream = build_frame_cache(video[0], CFG, hbm_budget_bytes=100_000)
        assert isinstance(stream, StreamingFrameCache)
        s_str, frames_str, ts_str = run(stream)

        assert ts_res == ts_str
        np.testing.assert_allclose(s_res.P, s_str.P, atol=1e-6)
        np.testing.assert_allclose(
            s_res.score_distribution, s_str.score_distribution, atol=1e-6
        )
        assert s_res.remaining_targets == s_str.remaining_targets
        for a, b in zip(frames_res, frames_str):
            np.testing.assert_array_equal(a, b)
        stream.close()

    def test_visualization_requires_resident(self, video, heuristic):
        from tstar_tpu.search.searcher import KeyframeSearcher

        stream = build_frame_cache(video[0], CFG, hbm_budget_bytes=100_000)
        s = KeyframeSearcher(
            video[0], heuristic, ["couch"], ["chair"], config=CFG, cache=stream
        )
        with pytest.raises(ValueError, match="resident"):
            s.search_with_visualization()


class TestBatchedRouting:
    def test_over_budget_video_routes_to_streaming(self, video, heuristic):
        """search_videos: an over-budget video streams (full resolution);
        results stay in task order with the batched-schema keys."""
        from tstar_tpu.parallel.multi_video import VideoTask, search_videos

        tasks = [
            VideoTask(video[0], ["couch"], ["chair"], seed=0),
            VideoTask(video[0], ["couch"], ["table"], seed=1),
        ]
        # Budget small enough that every bucket's per-video slice is under
        # the 60 s full-resolution cache -> all stream (cache_mode='auto').
        tiny_total = 8 * 60 * CACHE_HW[0] * CACHE_HW[1] * 3
        results = search_videos(
            tasks, heuristic, config=CFG, hbm_budget_bytes=tiny_total
        )
        assert len(results) == 2
        for r, t in zip(results, tasks):
            assert r["video_path"] == t.video_path
            assert len(r["keyframe_timestamps"]) == CFG.search_nframes
            assert r["iterations"] >= 1
            assert len(r["keyframe_distribution"]) == 60

    def test_downscale_mode_keeps_legacy_batched_path(self, video, heuristic):
        from tstar_tpu.parallel.multi_video import VideoTask, search_videos

        cfg = dataclasses.replace(CFG, cache_mode="downscale")
        tasks = [VideoTask(video[0], ["couch"], ["chair"], seed=0)]
        results = search_videos(tasks, heuristic, config=cfg)
        assert len(results) == 1
        assert len(results[0]["keyframe_timestamps"]) == cfg.search_nframes

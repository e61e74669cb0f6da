"""Batched multi-video public API over real synthetic videos."""

import numpy as np
import jax.numpy as jnp
import pytest

from tstar_tpu.framework.heuristics import OwlVitHeuristic
from tstar_tpu.models.clip_tokenizer import HashTokenizer
from tstar_tpu.models.owlvit import OwlViTConfig, OwlViTDetector, TextConfig, VisionConfig
from tstar_tpu.parallel.multi_video import VideoTask, search_videos
from tstar_tpu.utils.config import SearchConfig
from tstar_tpu.video.synthetic import PlantedObject, write_synthetic_video

cv2 = pytest.importorskip("cv2")

TINY = OwlViTConfig(
    vision=VisionConfig(hidden_size=32, num_layers=2, num_heads=4,
                        intermediate_size=64, patch_size=16, image_size=64),
    text=TextConfig(vocab_size=100, hidden_size=24, num_layers=2, num_heads=4,
                    intermediate_size=48, max_length=8),
    projection_dim=24,
)


def _tiny_heuristic():
    import jax

    h = OwlVitHeuristic.__new__(OwlVitHeuristic)
    h.name = "owl-vit-tiny"
    h.model = OwlViTDetector(TINY, dtype=jnp.float32)
    h.variables = h.model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((2, 8), jnp.int32)
    )
    h.tokenizer = HashTokenizer(vocab_size=100, context=8)
    return h


@pytest.fixture(scope="module")
def videos(tmp_path_factory):
    d = tmp_path_factory.mktemp("mv")
    paths = []
    for i, dur in enumerate([40.0, 70.0]):   # different lengths -> pad bucket
        p = str(d / f"v{i}.mp4")
        write_synthetic_video(
            p, duration_sec=dur, fps=10.0, hw=(48, 64),
            objects=[PlantedObject("couch", (10.0, 15.0), (200, 40, 40), (0.5, 0.5), 0.4)],
        )
        paths.append(p)
    return paths


class TestSearchVideos:
    def test_batched_over_different_lengths(self, videos):
        cfg = SearchConfig(search_budget=0.5, cache_hw=(32, 64))
        tasks = [
            VideoTask(videos[0], ["couch"], ["tv"], seed=0),
            VideoTask(videos[1], ["couch"], ["lamp"], seed=1),
        ]
        results = search_videos(tasks, _tiny_heuristic(), cfg)
        assert len(results) == 2
        for r, dur in zip(results, [40, 70]):
            assert len(r["keyframe_timestamps"]) == cfg.search_nframes
            assert r["iterations"] >= 1
            # keyframes stay inside each video's true duration despite padding
            assert max(r["keyframe_secs"]) < dur

    def test_batched_dataset_runner(self, videos, tmp_path):
        import json

        from tstar_tpu.bench.runner import run_dataset_batched
        from tstar_tpu.grounding.fake import FakeGrounder

        dataset = [
            {"video_id": f"v{i}", "video_path": p,
             "question": "Where is the couch?", "options": "A) L\nB) R"}
            for i, p in enumerate(videos)
        ]
        out = str(tmp_path / "batched.json")
        results = run_dataset_batched(
            dataset,
            FakeGrounder(target_objects=["couch"], cue_objects=["tv"]),
            _tiny_heuristic(),
            out,
            batch_videos=2,
            search_budget=0.5,
            confidence_threshold=0.6,
        )
        assert len(results) == 2
        for r, dur in zip(results, [40, 70]):
            assert len(r["keyframe_timestamps"]) == 8
            assert len(r["keyframe_distribution"]) == int(dur)
        saved = json.load(open(out))
        assert len(saved) == 2

    def test_batched_hbm_budget_divides_by_bucket_size(self, videos, monkeypatch):
        """search_videos must pass a per-video budget of pool/(bucket*2) into
        the cache builder (the r2 B=24 OOM fix, VERDICT item 2)."""
        import tstar_tpu.parallel.multi_video as mv
        from tstar_tpu.video.cache import build_frame_cache_host

        seen = []
        real = build_frame_cache_host

        def spy(path, config, decoder=None, hbm_budget_bytes=None):
            seen.append(hbm_budget_bytes)
            return real(path, config, decoder=decoder,
                        hbm_budget_bytes=hbm_budget_bytes)

        monkeypatch.setattr(mv, "build_frame_cache_host", spy)
        cfg = SearchConfig(search_budget=0.2, cache_hw=(32, 64))
        tasks = [
            VideoTask(videos[0], ["couch"], ["tv"], seed=0),
            VideoTask(videos[1], ["couch"], ["lamp"], seed=1),
        ]
        # both videos pad to 128 s -> one bucket of 2; an 8 GiB pool minus
        # the batch-aware reserve, over 2x concurrency, split per video
        from tstar_tpu.video.cache import (
            HBM_PER_VIDEO_WORKSPACE_BYTES,
            HBM_RESERVE_BYTES,
        )

        search_videos(tasks, _tiny_heuristic(), cfg,
                      hbm_budget_bytes=8 * 1024 ** 3)
        want = (8 * 1024 ** 3 - HBM_RESERVE_BYTES
                - 2 * HBM_PER_VIDEO_WORKSPACE_BYTES) // 4
        assert seen == [want] * 2

    def test_bucket_oom_retries_with_halved_budget(self, videos, monkeypatch):
        """A RESOURCE_EXHAUSTED bucket retries with half the per-video cache
        budget (shared-tenancy chips don't report their free pool)."""
        import jax

        import tstar_tpu.parallel.multi_video as mv

        real = mv._search_bucket
        calls = []

        def flaky(tasks, caches, heuristic, config, mesh, collect_history=False):
            calls.append([c.frames.shape if c is not None else None
                          for c in caches])
            if len(calls) == 1:
                raise jax.errors.JaxRuntimeError(
                    "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)."
                )
            return real(tasks, caches, heuristic, config, mesh,
                        collect_history=collect_history)

        monkeypatch.setattr(mv, "_search_bucket", flaky)
        cfg = SearchConfig(search_budget=0.2, cache_hw=(64, 128))
        tasks = [VideoTask(videos[0], ["couch"], ["tv"], seed=0)]
        results = search_videos(
            tasks, _tiny_heuristic(), cfg,
            # pool so small the retry's halved budget forces a downscale
            hbm_budget_bytes=8 * 1024 ** 3,
        )
        assert len(calls) == 2          # failed once, retried once
        assert len(results) == 1
        assert len(results[0]["keyframe_timestamps"]) == cfg.search_nframes
        # the retry rebuilt the cache (possibly at a lower resolution)
        assert calls[1][0] is not None

    def test_flat_batched_equals_single_video(self):
        """The flat-batch step (one detector forward across videos) must
        reproduce each video's single-scorer search exactly, seed for seed."""
        import jax
        import jax.numpy as jnp

        from tstar_tpu.models.clip_tokenizer import HashTokenizer
        from tstar_tpu.models.owlvit import OwlViTConfig, OwlViTDetector, TextConfig, VisionConfig
        from tstar_tpu.parallel.batched import run_search_batched, stack_scorers
        from tstar_tpu.search.detector_scorer import make_owlvit_scorer
        from tstar_tpu.search.engine import run_search
        from tstar_tpu.search.state import init_state

        tiny = OwlViTConfig(
            vision=VisionConfig(hidden_size=32, num_layers=2, num_heads=4,
                                intermediate_size=64, patch_size=16, image_size=64),
            text=TextConfig(vocab_size=100, hidden_size=24, num_layers=2,
                            num_heads=4, intermediate_size=48, max_length=8),
            projection_dim=24,
        )
        cfg = SearchConfig(search_budget=0.5, detector_threshold=0.4)
        model = OwlViTDetector(tiny, dtype=jnp.float32)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
            jnp.zeros((2, 8), jnp.int32),
        )
        tok = HashTokenizer(vocab_size=100, context=8)
        rng = np.random.default_rng(7)
        n_valid, n_pad = 120, cfg.padded_frames(120)
        scorers, states = [], []
        for i in range(2):
            cache = jnp.asarray(
                rng.integers(0, 256, (n_pad, 20, 40, 3), dtype=np.uint8)
            )
            scorers.append(make_owlvit_scorer(
                model, variables, cache, ["couch"], ["tv"], tok, cfg
            ))
            states.append(init_state(n_valid, 1, cfg, jax.random.key(40 + i),
                                     n_pad=n_pad))

        singles = [
            jax.jit(run_search, static_argnums=2)(st, sc, cfg)
            for st, sc in zip(states, scorers)
        ]
        batched_scorer = stack_scorers(scorers, cfg)
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
        finals, secs_b = jax.jit(run_search_batched, static_argnums=2)(
            stacked, batched_scorer, cfg
        )
        for i, (final_i, secs_i) in enumerate(singles):
            np.testing.assert_array_equal(np.asarray(secs_b)[i], np.asarray(secs_i))
            np.testing.assert_allclose(
                np.asarray(finals.scores)[i], np.asarray(final_i.scores),
                rtol=1e-5, atol=1e-6,
            )
            np.testing.assert_array_equal(
                np.asarray(finals.remaining)[i], np.asarray(final_i.remaining)
            )

    def test_per_video_verify_buckets_equal_global_flat(self):
        """verify_flat=False (dp-shard-aligned buckets) must produce the
        same searches as the global-flat default."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from tstar_tpu.models.clip_tokenizer import HashTokenizer
        from tstar_tpu.models.owlvit import OwlViTConfig, OwlViTDetector, TextConfig, VisionConfig
        from tstar_tpu.parallel.batched import run_search_batched, stack_scorers
        from tstar_tpu.search.detector_scorer import make_owlvit_scorer
        from tstar_tpu.search.state import init_state

        tiny = OwlViTConfig(
            vision=VisionConfig(hidden_size=32, num_layers=2, num_heads=4,
                                intermediate_size=64, patch_size=16, image_size=64),
            text=TextConfig(vocab_size=100, hidden_size=24, num_layers=2,
                            num_heads=4, intermediate_size=48, max_length=8),
            projection_dim=24,
        )
        model = OwlViTDetector(tiny, dtype=jnp.float32)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
            jnp.zeros((2, 8), jnp.int32),
        )
        tok = HashTokenizer(vocab_size=100, context=8)
        rng = np.random.default_rng(11)
        cfg = SearchConfig(search_budget=0.5, detector_threshold=0.4)
        n_valid, n_pad = 120, cfg.padded_frames(120)
        caches = [
            jnp.asarray(rng.integers(0, 256, (n_pad, 20, 40, 3), dtype=np.uint8))
            for _ in range(2)
        ]
        outs = {}
        for flat in (None, False):
            c = dataclasses.replace(cfg, verify_flat=flat)
            scorers = [
                make_owlvit_scorer(model, variables, cache, ["couch"], ["tv"],
                                   tok, c)
                for cache in caches
            ]
            states = [
                init_state(n_valid, 1, c, jax.random.key(60 + i), n_pad=n_pad)
                for i in range(2)
            ]
            stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
            finals, secs = jax.jit(run_search_batched, static_argnums=2)(
                stacked, stack_scorers(scorers, c), c
            )
            outs[flat] = (np.asarray(secs), np.asarray(finals.scores),
                          np.asarray(finals.remaining))
        np.testing.assert_array_equal(outs[None][0], outs[False][0])
        np.testing.assert_allclose(outs[None][1], outs[False][1],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(outs[None][2], outs[False][2])

    def test_batched_runner_uses_batched_grounding(self, videos, tmp_path):
        from tstar_tpu.bench.runner import run_dataset_batched
        from tstar_tpu.grounding.fake import FakeGrounder

        dataset = [
            {"video_id": f"v{i}", "video_path": p, "question": "q?",
             "options": ""}
            for i, p in enumerate(videos)
        ]
        g = FakeGrounder(target_objects=["couch"], cue_objects=["tv"])
        run_dataset_batched(
            dataset, g, _tiny_heuristic(), str(tmp_path / "bg.json"),
            batch_videos=2, search_budget=0.5, confidence_threshold=0.6,
        )
        kinds = [c["kind"] for c in g.calls]
        assert "grounding_batch" in kinds and "grounding" not in kinds

    def test_batched_runner_survives_raising_batch_grounder(self, videos, tmp_path):
        """A grounder whose batch API raises (instead of returning per-item
        exceptions) must not kill the run — it falls back to serial."""
        from tstar_tpu.bench.runner import run_dataset_batched
        from tstar_tpu.grounding.fake import FakeGrounder

        class RaisingBatch(FakeGrounder):
            def inference_query_grounding_batch(self, requests, **kw):
                raise RuntimeError("network down")

        dataset = [
            {"video_id": f"v{i}", "video_path": p, "question": "q?",
             "options": ""}
            for i, p in enumerate(videos)
        ]
        res = run_dataset_batched(
            dataset, RaisingBatch(target_objects=["couch"], cue_objects=["tv"]),
            _tiny_heuristic(), str(tmp_path / "rg.json"),
            batch_videos=2, search_budget=0.5, confidence_threshold=0.6,
        )
        assert len(res) == 2  # all items grounded via the serial fallback

    def test_facade_grounding_batch_fallback_and_errors(self, videos):
        from tstar_tpu.grounding.universal import UniversalGrounder

        g = UniversalGrounder(model_name="fake")   # FakeVLM: no batch API
        out = g.inference_query_grounding_batch([
            {"video_path": videos[0], "question": "q?", "options": ""},
            {"video_path": "/nonexistent.mp4", "question": "q?", "options": ""},
        ])
        assert out[0] == (["couch"], ["tv", "chair"])
        assert isinstance(out[1], Exception)

    def test_batched_runner_rejects_table_backends(self, videos, tmp_path):
        from tstar_tpu.bench.runner import run_dataset_batched
        from tstar_tpu.framework.heuristics import initialize_heuristic
        from tstar_tpu.grounding.fake import FakeGrounder

        with pytest.raises(TypeError, match="detector backend"):
            run_dataset_batched(
                [{"video_id": "v", "video_path": videos[0], "question": "q",
                  "options": ""}],
                FakeGrounder(), initialize_heuristic("color-probe"),
                str(tmp_path / "x.json"), batch_videos=1,
            )

    def test_batched_runner_drops_missing_video_only(self, videos, tmp_path):
        from tstar_tpu.bench.runner import run_dataset_batched
        from tstar_tpu.grounding.fake import FakeGrounder

        dataset = [
            {"video_id": "good", "video_path": videos[0],
             "question": "q", "options": ""},
            {"video_id": "gone", "video_path": "/nonexistent.mp4",
             "question": "q", "options": ""},
        ]
        res = run_dataset_batched(
            dataset, FakeGrounder(target_objects=["couch"], cue_objects=["tv"]),
            _tiny_heuristic(), str(tmp_path / "y.json"),
            batch_videos=2, search_budget=0.5, confidence_threshold=0.6,
        )
        assert len(res) == 1 and res[0]["video_id"] == "good"

    def test_length_bucketing_and_decode_overlap(self, videos, tmp_path_factory, caplog):
        import logging

        # 40 s and 70 s pad to 128; a 140 s video pads to 256 -> 2 buckets.
        d = tmp_path_factory.mktemp("mv_long")
        long_p = str(d / "long.mp4")
        write_synthetic_video(
            long_p, duration_sec=140.0, fps=10.0, hw=(48, 64),
            objects=[PlantedObject("couch", (100.0, 110.0), (200, 40, 40),
                                   (0.5, 0.5), 0.4)],
        )
        cfg = SearchConfig(search_budget=0.5, cache_hw=(32, 64))
        tasks = [
            VideoTask(long_p, ["couch"], ["tv"], seed=0),
            VideoTask(videos[0], ["couch"], ["tv"], seed=1),
            VideoTask(videos[1], ["couch"], ["lamp"], seed=2),
        ]
        with caplog.at_level(logging.INFO, logger="tstar_tpu.parallel.multi_video"):
            results = search_videos(tasks, _tiny_heuristic(), cfg)
        assert any("length buckets" in r.message for r in caplog.records)
        # results come back in TASK order despite bucket reordering
        assert len(results) == 3
        assert results[0]["video_path"] == long_p
        for r, dur in zip(results, [140, 40, 70]):
            assert len(r["keyframe_distribution"]) == int(dur)
            assert max(r["keyframe_secs"]) < dur
        # the short videos must NOT have been padded to the long bucket:
        # their distributions are over their own n_valid (asserted above) and
        # the unbucketed path still works for comparison
        res_flat = search_videos(
            tasks[1:], _tiny_heuristic(), cfg, bucket_by_length=False
        )
        assert [len(r["keyframe_distribution"]) for r in res_flat] == [40, 70]

    def test_rejects_table_scorer_backends(self, videos):
        from tstar_tpu.framework.heuristics import initialize_heuristic

        cfg = SearchConfig(search_budget=0.25, cache_hw=(32, 64))
        with pytest.raises(TypeError, match="OwlVitScorer"):
            search_videos(
                [VideoTask(videos[0], ["couch"], [])],
                initialize_heuristic("color-probe"),
                cfg,
            )


class TestYoloBatched:
    def test_batched_search_with_yolo_backend(self, videos):
        """Batched multi-video search also runs with the YOLO-World backend
        (shared detector weights, per-video text embeddings)."""
        from tstar_tpu.framework.heuristics import YoloWorldHeuristic
        from tstar_tpu.models.yoloworld import YoloWorldConfig, YoloWorldDetector
        from tstar_tpu.models.owlvit import TextConfig
        from tstar_tpu.models.yoloworld import YoloTextEncoder
        from tstar_tpu.models.clip_tokenizer import HashTokenizer
        import jax

        h = YoloWorldHeuristic.__new__(YoloWorldHeuristic)
        h.name = "yolo-world-tiny"
        tiny = YoloWorldConfig(
            widths=(8, 16, 32, 64, 64), depths=(1, 1, 1, 1), neck_depth=1,
            neck_embed=(16, 32, 32), neck_heads=(2, 4, 4),
            text_dim=24, reg_max=4, image_size=64,
        )
        h.model = YoloWorldDetector(tiny, dtype=jnp.float32)
        h.variables = h.model.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((2, 24))
        )
        tc = TextConfig(vocab_size=100, hidden_size=24, num_layers=2,
                        num_heads=4, intermediate_size=48, max_length=8)
        h.text_model = YoloTextEncoder(tc, projection_dim=24, dtype=jnp.float32)
        h.text_variables = h.text_model.init(
            jax.random.key(1), jnp.zeros((2, 8), jnp.int32),
            jnp.ones((2, 8), jnp.int32),
        )
        h.tokenizer = HashTokenizer(vocab_size=100, context=8)

        cfg = SearchConfig(search_budget=0.25, cache_hw=(32, 64))
        tasks = [
            VideoTask(videos[0], ["couch"], ["tv"], seed=0),
            VideoTask(videos[1], ["couch"], ["lamp"], seed=1),
        ]
        results = search_videos(tasks, h, cfg)
        assert len(results) == 2
        for r, dur in zip(results, [40, 70]):
            assert len(r["keyframe_timestamps"]) == cfg.search_nframes
            assert max(r["keyframe_secs"]) < dur

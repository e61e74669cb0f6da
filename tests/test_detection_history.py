"""Per-iteration detection history + annotated search GIF.

Reference parity target: the searcher snapshots the annotated grid and raw
bboxes every iteration (``interface_searcher.py:80-82,469-474``) and the
framework renders them into the search GIF (``TStarFramework.py:148-160``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tstar_tpu.framework.heuristics import OwlVitHeuristic
from tstar_tpu.models.clip_tokenizer import HashTokenizer
from tstar_tpu.models.owlvit import OwlViTConfig, OwlViTDetector, TextConfig, VisionConfig
from tstar_tpu.search.searcher import KeyframeSearcher
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
def video(tmp_path_factory):
    d = tmp_path_factory.mktemp("dh")
    p = str(d / "v.mp4")
    write_synthetic_video(
        p, duration_sec=40.0, fps=10.0, hw=(48, 64),
        objects=[PlantedObject("couch", (10.0, 15.0), (200, 40, 40), (0.5, 0.5), 0.4)],
    )
    return p


class TestDetectionHistory:
    def test_bbox_history_schema_and_annotated_grids(self, video, tmp_path):
        cfg = SearchConfig(search_budget=0.5, cache_hw=(32, 64),
                           confidence_threshold=2.0)  # never verify-remove
        searcher = KeyframeSearcher(
            video_path=video,
            heuristic=_tiny_heuristic(),
            target_objects=["couch"],
            cue_objects=["tv"],
            config=cfg,
            seed=0,
        )
        searcher.search_with_visualization()
        n_iters = len(searcher.P_history)
        assert n_iters >= 1
        # one detection record per iteration, reference schema
        assert len(searcher.detect_bbox_iters) == n_iters
        for d in searcher.detect_bbox_iters:
            assert set(d) == {"boxes", "scores", "class_ids"}
            assert d["boxes"].ndim == 2 and d["boxes"].shape[1] == 4
            assert d["scores"].shape[0] == d["boxes"].shape[0]
            assert d["class_ids"].shape[0] == d["boxes"].shape[0]
        # random weights produce detections above the 0.005 threshold
        assert any(d["boxes"].shape[0] > 0 for d in searcher.detect_bbox_iters)

        plain = searcher.grid_images(annotate=False)
        annotated = searcher.grid_images(annotate=True)
        assert len(annotated) == len(plain) == n_iters
        rows, cols = cfg.grid_rows, cfg.grid_cols
        ch, cw = cfg.cell_hw
        assert annotated[0].shape == (rows * ch, cols * cw, 3)
        # at least one annotated grid differs from the raw render (boxes drawn)
        assert any(
            not np.array_equal(a, p) for a, p in zip(annotated, plain)
        )
        # reference attribute-name parity
        assert len(searcher.detect_annotot_iters) == n_iters

    def test_search_without_visualization_skips_detail(self, video):
        cfg = SearchConfig(search_budget=0.25, cache_hw=(32, 64))
        searcher = KeyframeSearcher(
            video_path=video,
            heuristic=_tiny_heuristic(),
            target_objects=["couch"],
            cue_objects=[],
            config=cfg,
            seed=1,
        )
        searcher.search()
        assert searcher.detect_bbox_iters == []


@pytest.fixture(scope="module")
def two_videos(tmp_path_factory):
    d = tmp_path_factory.mktemp("dhb")
    paths = []
    for i in range(2):
        p = str(d / f"v{i}.mp4")
        write_synthetic_video(
            p, duration_sec=40.0 + 10 * i, fps=10.0, hw=(48, 64),
            objects=[PlantedObject("couch", (10.0, 15.0), (200, 40, 40),
                                   (0.5, 0.5), 0.4)],
        )
        paths.append(p)
    return paths


class TestBatchedDetectionHistory:
    """VERDICT r2 item 8: the per-iteration detection history must exist for
    BATCHED searches too, with identical search results."""

    def test_batched_history_schema_and_equality(self, two_videos, tmp_path):
        from tstar_tpu.parallel.multi_video import VideoTask, search_videos

        cfg = SearchConfig(search_budget=0.5, cache_hw=(32, 64),
                           confidence_threshold=2.0)
        tasks = [
            VideoTask(two_videos[0], ["couch"], ["tv"], seed=0),
            VideoTask(two_videos[1], ["couch"], ["lamp"], seed=1),
        ]
        plain = search_videos(tasks, _tiny_heuristic(), cfg)
        with_hist = search_videos(
            tasks, _tiny_heuristic(), cfg, collect_history=True
        )

        for p, h in zip(plain, with_hist):
            # history collection must not change the search
            assert h["keyframe_secs"] == p["keyframe_secs"]
            assert h["iterations"] == p["iterations"]
            n_iters = h["iterations"]
            assert len(h["P_history"]) == n_iters
            assert len(h["sampled_history"]) == n_iters
            assert len(h["detect_bbox_iters"]) == n_iters
            for d in h["detect_bbox_iters"]:
                assert set(d) == {"boxes", "scores", "class_ids"}
                assert len(d["scores"]) == len(d["boxes"]) == len(d["class_ids"])
            assert any(len(d["boxes"]) for d in h["detect_bbox_iters"])

        # annotated GIF artifact from the result row alone
        from tstar_tpu.viz.artifacts import save_batched_search_artifacts

        gif = str(tmp_path / "v0.gif")
        ok = save_batched_search_artifacts(
            two_videos[0], with_hist[0],
            (cfg.grid_rows, cfg.grid_cols), cfg.cell_hw,
            ["couch", "tv", " "], 64, gif,
        )
        assert ok and __import__("os").path.exists(gif)

    def test_batched_runner_collect_history(self, two_videos, tmp_path):
        import json

        from tstar_tpu.bench.runner import run_dataset_batched
        from tstar_tpu.grounding.fake import FakeGrounder

        dataset = [
            {"video_id": f"v{i}", "video_path": p,
             "question": "Where is the couch?", "options": "A) L\nB) R"}
            for i, p in enumerate(two_videos)
        ]
        out = str(tmp_path / "hist.json")
        art = str(tmp_path / "artifacts")
        results = run_dataset_batched(
            dataset,
            FakeGrounder(target_objects=["couch"], cue_objects=["tv"]),
            _tiny_heuristic(),
            out,
            batch_videos=2,
            search_budget=0.5,
            collect_history=True,
            artifact_dir=art,
        )
        assert len(results) == 2
        for r in results:
            assert len(r["detect_bbox_iters"]) >= 1
            assert len(r["sampled_history"]) >= 1
        import os as _os

        gifs = [f for f in _os.listdir(art) if f.endswith(".gif")]
        assert len(gifs) == 2
        saved = json.load(open(out))
        assert all("detect_bbox_iters" in r for r in saved)

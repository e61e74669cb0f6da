"""End-to-end framework tests: synthetic mp4 -> search -> keyframes -> QA.

The hermetic full-pipeline slice (SURVEY.md §4 rebuild plan item b/c): a
fixture video with planted objects, the color-probe detector, and the fake
grounder exercise every layer with no weights or network, and keyframe
*recall* is asserted against the planted ground truth.
"""

import os

import numpy as np
import pytest

from tstar_tpu.framework.framework import TStarFramework, run_tstar
from tstar_tpu.framework.heuristics import initialize_heuristic
from tstar_tpu.grounding.fake import FakeGrounder
from tstar_tpu.grounding.prompts import (
    GroundingParseError,
    normalize_object_name,
    parse_grounding_response,
)
from tstar_tpu.search.searcher import KeyframeSearcher
from tstar_tpu.video.synthetic import default_scene

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    path = str(d / "scene.mp4")
    meta = default_scene(path, duration_sec=120.0)
    return path, meta


class TestSearcherEndToEnd:
    def test_finds_planted_object(self, scene):
        path, meta = scene
        heuristic = initialize_heuristic("color-probe")
        searcher = KeyframeSearcher(
            video_path=path,
            heuristic=heuristic,
            target_objects=["couch"],
            cue_objects=["tv"],
            search_budget=1.0,
            confidence_threshold=0.5,
            seed=3,
        )
        frames, timestamps = searcher.search()
        assert len(frames) == 8 and len(timestamps) == 8
        assert timestamps == sorted(timestamps)
        # 'couch' visible 70-80 s: the search must verify-find it...
        assert searcher.remaining_targets == []
        # ...and concentrate keyframes near the event.
        gt = set(meta["gt_seconds"]["couch"])
        hits = sum(1 for t in timestamps if any(abs(t - g) <= 5 for g in gt))
        assert hits >= 2, (timestamps, sorted(gt))

    def test_visualization_histories(self, scene):
        path, _ = scene
        heuristic = initialize_heuristic("color-probe")
        searcher = KeyframeSearcher(
            video_path=path,
            heuristic=heuristic,
            target_objects=["couch"],
            cue_objects=["tv"],
            search_budget=0.5,
            confidence_threshold=0.5,
            seed=0,
        )
        frames, timestamps = searcher.search_with_visualization()
        n_iters = len(searcher.P_history)
        assert n_iters >= 1
        assert len(searcher.Score_history) == n_iters
        assert len(searcher.sampled_history) == n_iters
        assert len(searcher.P_history[-1]) == searcher.total_frame_num
        p = np.asarray(searcher.P_history[-1])
        assert p.sum() == pytest.approx(1.0, abs=1e-4)
        grids = searcher.grid_images()
        assert len(grids) == n_iters
        assert grids[0].shape == (4 * 95, 4 * 200, 3)


class TestFrameworkRun:
    def test_full_run_with_fakes(self, scene, tmp_path):
        path, meta = scene
        fw = TStarFramework(
            video_path=path,
            heuristic=initialize_heuristic("color-probe"),
            grounder=FakeGrounder(
                target_objects=["couch"], cue_objects=["tv"], qa_answer="B"
            ),
            question="What is the color of the couch?",
            options="A) Blue\nB) Red\nC) Green\nD) White",
            output_dir=str(tmp_path / "out"),
            confidence_threshold=0.5,
            search_budget=1.0,
        )
        results = fw.run()
        assert set(results) == {"Grounding Objects", "Frame Timestamps", "Answer"}
        assert results["Answer"] == "B"
        assert results["Grounding Objects"]["target_objects"] == ["couch"]
        assert len(results["Frame Timestamps"]) == 8
        # artifacts written
        run_dir = fw.output_dir
        assert os.path.exists(os.path.join(run_dir, "score_distribution.png"))
        assert os.path.exists(os.path.join(run_dir, "search_iterations.gif"))
        frames_dir = os.path.join(run_dir, "frames")
        assert len(os.listdir(frames_dir)) == 8

    def test_int_budget_maps_to_full_cap(self, scene, tmp_path):
        # Reference semantics (interface_searcher.py:70): effective budget =
        # min(1000, N * search_budget).  The framework's int default 1000 on a
        # 120 s video must yield the full 1000-frame cap (resampling visited
        # seconds), NOT min(1000, N) = 120.
        path, _ = scene
        fw = TStarFramework(
            video_path=path,
            heuristic=initialize_heuristic("color-probe"),
            grounder=FakeGrounder(target_objects=["couch"], cue_objects=["tv"]),
            question="q?",
            options="A) x",
            output_dir=str(tmp_path / "budget"),
            search_budget=1000,
        )
        searcher = fw.initialize_videoSearcher(["couch"], ["tv"])
        n = searcher.total_frame_num
        assert searcher.config.budget_frames(n) == 1000
        # and a small int budget behaves like min(1000, N * budget)
        fw.search_budget = 2
        searcher2 = fw.initialize_videoSearcher(["couch"], ["tv"])
        assert searcher2.config.budget_frames(n) == min(1000, 2 * n)

    def test_run_tstar_one_shot(self, scene, tmp_path):
        path, _ = scene
        results = run_tstar(
            video_path=path,
            question="Where is the couch?",
            options="A) Left\nB) Right",
            grounder="fake",
            heuristic="color-probe",
            search_budget=0.5,
            output_dir=str(tmp_path / "out2"),
        )
        assert "Frame Timestamps" in results and "Answer" in results


class TestGroundingParsing:
    def test_normalize(self):
        assert normalize_object_name(" Key objects: 1. Couch! ") == "couch"
        assert normalize_object_name("2. TV-set.") == "tv-set"
        assert normalize_object_name("cue objects: lamp,") == "lamp"

    def test_two_line_contract(self):
        t, c = parse_grounding_response("couch, sofa\ntv, chair")
        assert t == ["couch", "sofa"] and c == ["tv", "chair"]
        with pytest.raises(GroundingParseError):
            parse_grounding_response("just one line")
        with pytest.raises(GroundingParseError):
            parse_grounding_response("a\nb\nc")


class _ScriptedBackend:
    """Mocked transport: returns canned responses in order, records queries."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.queries = []

    def inference_with_frames(self, query, frames, **kw):
        self.queries.append(query)
        return self.responses.pop(0)


class TestGroundingParseRetry:
    """Bounded re-prompt on malformed grounding output (SURVEY §5.3; the
    reference crashes the item on the first bad response,
    interface_grounding.py:393-395)."""

    def test_retry_recovers_and_appends_format_reminder(self, scene):
        from tstar_tpu.grounding.prompts import REPROMPT_SUFFIX
        from tstar_tpu.grounding.universal import UniversalGrounder

        path, _ = scene
        be = _ScriptedBackend(["I think the answer is couch", "couch\ntv, chair"])
        g = UniversalGrounder(backend=be, parse_retries=1)
        targets, cues = g.inference_query_grounding(path, "q?")
        assert targets == ["couch"] and cues == ["tv", "chair"]
        assert len(be.queries) == 2
        assert be.queries[1].endswith(REPROMPT_SUFFIX)
        assert not be.queries[0].endswith(REPROMPT_SUFFIX)

    def test_retry_budget_exhausted_raises(self, scene):
        from tstar_tpu.grounding.universal import UniversalGrounder

        path, _ = scene
        be = _ScriptedBackend(["bad", "still bad"])
        g = UniversalGrounder(backend=be, parse_retries=1)
        with pytest.raises(GroundingParseError):
            g.inference_query_grounding(path, "q?")
        assert len(be.queries) == 2

    def test_zero_retries_is_reference_behavior(self, scene):
        from tstar_tpu.grounding.universal import UniversalGrounder

        path, _ = scene
        be = _ScriptedBackend(["bad"])
        g = UniversalGrounder(backend=be, parse_retries=0)
        with pytest.raises(GroundingParseError):
            g.inference_query_grounding(path, "q?")
        assert len(be.queries) == 1

    def test_batch_path_retries_per_item(self, scene):
        from tstar_tpu.grounding.universal import UniversalGrounder

        path, _ = scene
        # serial order: item0 initial (malformed), item1 initial, item0 retry
        be = _ScriptedBackend(["malformed", "sofa, lamp\nrug", "couch\ntv"])
        g = UniversalGrounder(backend=be, parse_retries=1)
        out = g.inference_query_grounding_batch([
            {"video_path": path, "question": "q1?"},
            {"video_path": path, "question": "q2?"},
        ])
        assert out[0] == (["couch"], ["tv"])
        assert out[1] == (["sofa", "lamp"], ["rug"])
        assert len(be.queries) == 3  # item 0 retried once, item 1 clean

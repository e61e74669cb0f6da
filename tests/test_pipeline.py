"""Hermetic 3-stage pipeline: dataset search -> keyframe metrics -> QA.

Mirrors scripts/eval_lv_haystack.sh end-to-end on synthetic videos with
planted objects, checking keyframe recall against ground truth — the system
test the reference only runs manually against LV-Haystack (SURVEY.md §4).
"""

import json
import os

import numpy as np
import pytest

from tstar_tpu.bench.datasets import load_results_json, lvhaystack_to_tstar
from tstar_tpu.bench.evaluate import compute_qa_accuracy, evaluate_search_results
from tstar_tpu.bench.runner import run_dataset
from tstar_tpu.framework.heuristics import initialize_heuristic
from tstar_tpu.grounding.fake import FakeGrounder
from tstar_tpu.video.synthetic import PlantedObject, write_synthetic_video

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    """Two synthetic videos + an LV-Haystack-format local JSON dump."""
    d = tmp_path_factory.mktemp("lvh")
    rows = []
    scenes = [
        ("vid_a", (40.0, 50.0), "B"),
        ("vid_b", (15.0, 22.0), "A"),
    ]
    for vid, interval, answer in scenes:
        path = str(d / f"{vid}.mp4")
        write_synthetic_video(
            path, duration_sec=90.0, fps=10.0, hw=(96, 160),
            objects=[
                PlantedObject("couch", interval, (200, 40, 40), (0.5, 0.45), 0.4),
                PlantedObject("tv", (10.0, 70.0), (40, 40, 200), (0.3, 0.8), 0.2),
            ],
        )
        gt_secs = list(range(int(interval[0]), int(interval[1])))
        rows.append(
            {
                "video_id": vid,
                "question": "What is the color of the couch?",
                "answer": answer,
                "options": {"A": "Blue", "B": "Red"},
                "frame_indexes_video": [int(s * 10) for s in gt_secs[:3]],
                "video_metadata": {"vclip_interval_in_video": [0, 90]},
            }
        )
    meta = d / "dataset.json"
    meta.write_text(json.dumps(rows))
    return str(d), str(meta)


class TestFullPipeline:
    def test_three_stages(self, dataset_dir, tmp_path):
        video_root, meta_json = dataset_dir

        # --- stage 1: batch search ---
        dataset = lvhaystack_to_tstar(local_json=meta_json, video_root=video_root)
        assert len(dataset) == 2
        grounder = FakeGrounder(target_objects=["couch"], cue_objects=["tv"],
                                qa_answer="B")
        heuristic = initialize_heuristic("color-probe")
        out_json = str(tmp_path / "search.json")
        results = run_dataset(
            dataset, grounder, heuristic, out_json,
            confidence_threshold=0.5, search_budget=1.0,
            output_dir=str(tmp_path / "runs"),
        )
        assert len(results) == 2
        for row in results:
            assert len(row["keyframe_timestamps"]) == 8
            assert len(row["keyframe_distribution"]) == 90
            assert row["error"] is None

        # --- stage 2: keyframe metrics ---
        data = load_results_json(out_json)
        metrics = evaluate_search_results(data, threshold=5, compute_ssim=False)
        # the planted couch must be recalled (gt frames are inside its interval)
        assert metrics["Average Temporal Recall"] > 0.6, metrics

        # --- stage 3: QA with TStar sampling ---
        qa_out = str(tmp_path / "qa.jsonl")
        acc, qa_rows = compute_qa_accuracy(
            data, FakeGrounder(qa_answer="B"), sampling_type="TStar",
            output_file=qa_out,
        )
        # fake always answers B; vid_a's gt is B, vid_b's is A -> 50%
        assert acc == pytest.approx(0.5)
        assert os.path.exists(qa_out)

    def test_runner_resume_skips_done(self, dataset_dir, tmp_path):
        video_root, meta_json = dataset_dir
        dataset = lvhaystack_to_tstar(local_json=meta_json, video_root=video_root)
        grounder = FakeGrounder(target_objects=["couch"], cue_objects=["tv"])
        heuristic = initialize_heuristic("color-probe")
        out_json = str(tmp_path / "s.json")
        run_dataset(dataset, grounder, heuristic, out_json,
                    confidence_threshold=0.5, search_budget=0.5,
                    output_dir=str(tmp_path / "runs"))
        n_calls = len(grounder.calls)
        # second run: manifest resume, no new grounding calls
        run_dataset(dataset, grounder, heuristic, out_json,
                    confidence_threshold=0.5, search_budget=0.5,
                    output_dir=str(tmp_path / "runs"))
        assert len(grounder.calls) == n_calls

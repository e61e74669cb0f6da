"""Hermetic argparse-surface tests for the three CLIs (VERDICT r4 item 8).

tests/test_pipeline.py drives bench/runner directly; these drive the actual
``main(argv)`` entrypoints end-to-end with the fake grounder and the
weight-free color-probe heuristic (reference surfaces:
``run_TStarDemo.py:14-31``, ``run_TStar_onDataset.py:154-178``,
``val_tstar_results.py:385-402``, ``val_qa_results.py:302-316``).
"""

import json
import os

import pytest

from tstar_tpu.video.synthetic import PlantedObject, write_synthetic_video

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    """Two synthetic videos + an LV-Haystack-format local JSON dump
    (same scene dims as tests/test_pipeline.py so the jitted search is
    compile-cache shared within the pytest process)."""
    d = tmp_path_factory.mktemp("cli_lvh")
    rows = []
    scenes = [
        ("vid_a", (40.0, 50.0), "A"),
        ("vid_b", (15.0, 22.0), "B"),
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
                "options": {"A": "Red", "B": "Blue"},
                "frame_indexes_video": [int(s * 10) for s in gt_secs[:3]],
                "video_metadata": {"vclip_interval_in_video": [0, 90]},
            }
        )
    meta = d / "dataset.json"
    meta.write_text(json.dumps(rows))
    return str(d), str(meta)


@pytest.fixture(scope="module")
def search_output(dataset_dir, tmp_path_factory):
    """Run the dataset CLI once; downstream evaluate tests consume it."""
    from tstar_tpu.cli.dataset import main

    video_root, meta_json = dataset_dir
    out_dir = str(tmp_path_factory.mktemp("cli_search"))
    results = main([
        "--local_json", meta_json,
        "--video_root", video_root,
        "--grounder", "fake",
        "--heuristic", "color-probe",
        "--confidence_threshold", "0.5",
        "--search_budget", "1.0",
        "--output_dir", out_dir,
        "--output_json_name", "cli_test.json",
    ])
    out_json = os.path.join(out_dir, "color-probe_cli_test.json")
    return results, out_json


class TestDemoCLI:
    def test_synthesize_deterministic_json_schema(self, tmp_path, capsys):
        from tstar_tpu.cli.demo import main

        video = str(tmp_path / "scene.mp4")
        argv = [
            "--video_path", video, "--synthesize", "--deterministic",
            "--question", "What is the color of the couch?",
            "--options", "A) Red\nB) Blue",
            "--grounder", "fake", "--heuristic", "color-probe",
            "--confidence_threshold", "0.5", "--search_budget", "1.0",
            "--output_dir", str(tmp_path / "out"), "--json",
        ]
        results = main(argv)
        assert os.path.exists(video)
        # reference result contract (TStarFramework.py:71-75)
        assert set(results) >= {"Grounding Objects", "Frame Timestamps", "Answer"}
        ts = results["Frame Timestamps"]
        assert len(ts) == 8 and ts == sorted(ts)
        assert results["Answer"]  # fake VLM answers 'A'
        # --json prints a parseable JSON object as the last stdout line
        last = capsys.readouterr().out.strip().splitlines()[-1]
        assert json.loads(last) == results
        # --deterministic: a second run reproduces the keyframes exactly
        results2 = main(argv)
        assert results2["Frame Timestamps"] == ts

    def test_human_output_lines(self, tmp_path, capsys):
        from tstar_tpu.cli.demo import main

        video = str(tmp_path / "scene2.mp4")
        main([
            "--video_path", video, "--synthesize",
            "--question", "q?", "--options", "A) x\nB) y",
            "--grounder", "fake", "--heuristic", "color-probe",
            "--confidence_threshold", "0.5", "--search_budget", "0.5",
            "--output_dir", str(tmp_path / "out"),
        ])
        out = capsys.readouterr().out
        for needle in ("T* Search Results:", "Grounding Objects:",
                       "Frame Timestamps:", "Answer:"):
            assert needle in out, out


class TestDatasetCLI:
    def test_output_schema(self, search_output):
        results, out_json = search_output
        assert len(results) == 2
        assert os.path.exists(out_json)
        data = json.load(open(out_json))
        # reference result schema (run_TStar_onDataset.py:139-144)
        for row in data:
            assert len(row["keyframe_timestamps"]) == 8
            assert len(row["keyframe_distribution"]) == 90
            assert row["grounding_objects"]["target_objects"] == ["couch"]
            assert row["error"] is None


class TestEvaluateCLI:
    def test_search_metrics(self, search_output, tmp_path, capsys):
        from tstar_tpu.cli.evaluate import main

        _, out_json = search_output
        out_root = str(tmp_path / "scores")
        metrics = main([
            "search", "--search_result_path", out_json,
            "--no_ssim", "--output_root", out_root,
        ])
        assert metrics["Average Temporal Recall"] > 0.6, metrics
        saved = os.path.join(
            out_root,
            os.path.basename(out_json).replace(".json", "lvhaystack_score.json"),
        )
        assert os.path.exists(saved)
        assert json.load(open(saved)) == metrics
        assert "Metrics saved to" in capsys.readouterr().out

    def test_qa_accuracy(self, search_output, tmp_path, capsys):
        from tstar_tpu.cli.evaluate import main

        _, out_json = search_output
        out_root = str(tmp_path / "qa")
        acc = main([
            "qa", "--backend", "fake", "--json_file", out_json,
            "--sampling_type", "TStar", "--output_root", out_root,
        ])
        # fake VLM always answers 'A'; vid_a gt is A, vid_b gt is B -> 50%
        assert acc == pytest.approx(0.5)
        outs = os.listdir(out_root)
        assert any(f.endswith("_metrics.json") for f in outs), outs
        metrics_file = [f for f in outs if f.endswith("_metrics.json")][0]
        saved = json.load(open(os.path.join(out_root, metrics_file)))
        assert saved == {"qa_accuracy": pytest.approx(0.5)}
        assert "QA Accuracy: 50.00%" in capsys.readouterr().out

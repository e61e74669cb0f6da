"""Pins the knob-recall A/B harness (scripts/ab_knob_recall.py; VERDICT r4
item 2): the calibrated-detector measurement apparatus must stay functional —
positive calibration margins at the pinned geometry/seed, working end-to-end
search recall at bf16, and knob configs that actually flow through the
quantized / reduced-resolution code paths.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tstar_tpu.bench.metrics import temporal_prf
from tstar_tpu.framework.heuristics import (
    CalibratedOwlVitHeuristic,
    initialize_heuristic,
)
from tstar_tpu.utils.config import SearchConfig

from scripts.ab_knob_recall import (
    EVENT_LEN,
    OBJECT_SIZE,
    model_config,
)

cv2 = pytest.importorskip("cv2")

# The A/B's seed lottery found seed 2 at the S=577 geometry (both margins
# > +0.1); pin it so a regression in calibration/probing/solve shows up as
# a margin collapse here rather than as silent garbage in the A/B.
CAL_SEED = 2


@pytest.fixture(scope="module")
def calibrated():
    cfg = SearchConfig(search_budget=1.0)
    h = CalibratedOwlVitHeuristic(
        dtype=jnp.float32, model_config=model_config(), seed=CAL_SEED,
        object_size=OBJECT_SIZE,
    )
    cal = h.calibrate(cfg.cache_hw, ["couch"], [], cfg)
    return h, cal, cfg


class TestCalibration:
    def test_margins_positive(self, calibrated):
        _, cal, _ = calibrated
        c = cal["couch"]
        assert c["grid_margin"] > 0.05, c
        assert c["verify_margin"] > 0.05, c

    def test_suggested_thresholds_sit_inside_margins(self, calibrated):
        h, cal, _ = calibrated
        c = cal["couch"]
        assert c["grid_bg_max"] < h.suggested_detector_threshold < c["grid_obj_min"]
        assert (
            c["verify_bg_max"]
            < h.suggested_confidence_threshold
            < c["verify_obj_min"]
        )

    def test_registry_name(self):
        h = initialize_heuristic("owl-vit-calibrated")
        assert h.name == "owl-vit-calibrated"

    def test_probe_affine_is_exact(self, calibrated):
        """The +/- basis probing must recover the EXACT logit of an arbitrary
        query: logit(q) == A . q_hat + b (this linearity is what the whole
        calibration rests on)."""
        from tstar_tpu.kernels.image import build_detector_grid
        from tstar_tpu.models.owlvit import OwlViTDetector

        h, _, cfg = calibrated
        rng = np.random.default_rng(0)
        frame = h._render_cal_frame(cfg.cache_hw, (200, 40, 40), 3)
        cache = jnp.asarray(frame[None])
        size = h.model.cfg.vision.image_size
        pixels = build_detector_grid(
            cache, jnp.zeros((16,), jnp.int32), (4, 4), size,
            dtype=h.model.dtype,
        )
        a, b = h._probe_affine(pixels)
        q = rng.standard_normal(a.shape[1]).astype(np.float32)
        feats = h.model.apply(
            h.variables, pixels, method=OwlViTDetector.encode_image
        )
        logits, _ = h.model.apply(
            h.variables, feats, jnp.asarray(q)[None], None,
            method=OwlViTDetector.predict,
        )
        want = np.asarray(logits[0, :, 0])
        got = a @ (q / np.linalg.norm(q)) + b
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def scene(self, tmp_path_factory):
        from tstar_tpu.video.synthetic import (
            PlantedObject,
            write_synthetic_video,
        )

        d = tmp_path_factory.mktemp("knobrecall")
        start = 97.0
        path = str(d / "scene.mp4")
        write_synthetic_video(
            path, duration_sec=180.0, fps=10.0, hw=(96, 160),
            objects=[PlantedObject("couch", (start, start + EVENT_LEN),
                                   (200, 40, 40), (0.5, 0.45), OBJECT_SIZE)],
        )
        return path, start

    def test_bf16_search_finds_event(self, calibrated, scene):
        from tstar_tpu.search.searcher import KeyframeSearcher

        h, _, _ = calibrated
        path, start = scene
        cfg = dataclasses.replace(
            SearchConfig(search_budget=1.0),
            detector_threshold=h.suggested_detector_threshold,
            confidence_threshold=h.suggested_confidence_threshold,
        )
        s = KeyframeSearcher(
            video_path=path, heuristic=h, target_objects=["couch"],
            cue_objects=[], config=cfg, seed=0, search_budget=1.0,
            confidence_threshold=cfg.confidence_threshold,
        )
        _, ts = s.search()
        gt = [np.arange(start, start + EVENT_LEN)]
        _, recall, _ = temporal_prf(gt, [np.asarray(ts)], threshold=5)
        assert recall >= 0.5, (recall, ts)
        # verification terminated the search (the detector works end to end)
        assert int(np.asarray(s._final_state.iteration)) < s.config.iteration_cap(
            s.total_frame_num
        )

    def test_knob_configs_flow_through_knob_paths(self, calibrated, scene):
        """int8/w8a16 must build a quantized tower; verify128 must build a
        resized verification view — i.e. the A/B really exercises the code
        paths it claims to measure."""
        h, _, _ = calibrated
        path, _ = scene
        from tstar_tpu.search.searcher import KeyframeSearcher

        cfg = dataclasses.replace(
            SearchConfig(search_budget=1.0),
            detector_threshold=h.suggested_detector_threshold,
            confidence_threshold=h.suggested_confidence_threshold,
            detector_quant="w8a16",
            verify_image_size=128,
        )
        s = KeyframeSearcher(
            video_path=path, heuristic=h, target_objects=["couch"],
            cue_objects=[], config=cfg, seed=0, search_budget=1.0,
            confidence_threshold=cfg.confidence_threshold,
        )
        assert s.scorer.qvision is not None
        assert s.scorer.verify_model is not None
        assert s.scorer.verify_model.cfg.vision.image_size == 128
        _, ts = s.search()
        assert len(ts) == cfg.search_nframes

"""YOLO-World-class detector: shapes, post-processing contract, full search."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tstar_tpu.framework.heuristics import YoloWorldHeuristic, initialize_heuristic
from tstar_tpu.models.yoloworld import (
    YoloWorldConfig,
    YoloWorldDetector,
    postprocess_yolo,
    yoloworld_small,
)
from tstar_tpu.search.engine import run_search
from tstar_tpu.search.state import init_state
from tstar_tpu.utils.config import SearchConfig

TINY = YoloWorldConfig(
    widths=(8, 16, 32, 64, 64), depths=(1, 1, 1, 1), neck_depth=1,
    neck_embed=(16, 32, 32), neck_heads=(2, 4, 4),
    text_dim=24, reg_max=4, image_size=64,
)


class TestDetectorShapes:
    def test_forward_shapes_and_anchor_count(self):
        model = YoloWorldDetector(TINY, dtype=jnp.float32)
        px = jnp.zeros((2, 64, 64, 3))
        txt = jnp.ones((5, 24))
        variables = model.init(jax.random.key(0), px, txt)
        logits, boxes = model.apply(variables, px, txt)
        anchors = (64 // 8) ** 2 + (64 // 16) ** 2 + (64 // 32) ** 2
        assert logits.shape == (2, anchors, 5)
        assert boxes.shape == (2, anchors, 4)
        assert bool(jnp.isfinite(logits).all())

    def test_boxes_decode_within_image(self):
        model = YoloWorldDetector(TINY, dtype=jnp.float32)
        px = jnp.zeros((1, 64, 64, 3))
        txt = jnp.ones((2, 24))
        variables = model.init(jax.random.key(1), px, txt)
        _, boxes = model.apply(variables, px, txt)
        b = np.asarray(boxes)
        # DFL max distance = (reg_max-1) * stride; centers inside image
        assert b[..., 2].max() <= 64 + TINY.reg_max * 32
        assert b[..., 0].min() >= -TINY.reg_max * 32


class TestPostprocess:
    def test_threshold_and_mask(self):
        rng = np.random.default_rng(0)
        logits = rng.standard_normal((1, 20, 4)).astype(np.float32) * 3
        boxes = np.abs(rng.standard_normal((1, 20, 4))).astype(np.float32) * 50
        boxes[..., 2:] += boxes[..., :2] + 5
        qmask = jnp.asarray([True, True, False, False])
        scores, cls, bx, keep = postprocess_yolo(
            jnp.asarray(logits), jnp.asarray(boxes), qmask,
            score_threshold=0.12, max_dets=10,
        )
        assert scores.shape == (1, 10)
        kept = np.asarray(keep)[0]
        assert (np.asarray(scores)[0][kept] > 0.12).all()
        assert set(np.asarray(cls)[0][kept].tolist()) <= {0, 1}  # masked classes never win


class TestFullSearchWithYolo:
    def test_search_runs_end_to_end(self):
        heuristic = YoloWorldHeuristic(size="small", seed=0)
        # shrink further for CPU test speed
        heuristic.model = YoloWorldDetector(TINY, dtype=jnp.float32)
        heuristic.variables = heuristic.model.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((2, 24))
        )
        from tstar_tpu.models.owlvit import TextConfig
        from tstar_tpu.models.yoloworld import YoloTextEncoder
        from tstar_tpu.models.clip_tokenizer import HashTokenizer

        tc = TextConfig(vocab_size=100, hidden_size=24, num_layers=2,
                        num_heads=4, intermediate_size=48, max_length=8)
        heuristic.text_model = YoloTextEncoder(tc, projection_dim=24, dtype=jnp.float32)
        heuristic.text_variables = heuristic.text_model.init(
            jax.random.key(1), jnp.zeros((2, 8), jnp.int32), jnp.ones((2, 8), jnp.int32)
        )
        heuristic.tokenizer = HashTokenizer(vocab_size=100, context=8)

        cfg = SearchConfig(search_budget=0.5)
        n_valid, n_pad = 100, 128
        rng = np.random.default_rng(0)
        cache = jnp.asarray(rng.integers(0, 256, (n_pad, 20, 40, 3), dtype=np.uint8))
        scorer = heuristic.build_scorer(cache, ["couch"], ["tv"], cfg)
        state = init_state(n_valid, 1, cfg, jax.random.key(2), n_pad=n_pad)
        final, secs = jax.jit(run_search, static_argnums=2)(state, scorer, cfg)
        assert int(final.iteration) >= 1
        assert bool(jnp.isfinite(final.P).all())
        assert len(np.asarray(secs)) == cfg.search_nframes


class TestRegistry:
    def test_initialize_heuristic_dispatch(self):
        h = initialize_heuristic("yolo-world-random", size="small")
        assert h.name == "yolo-world"

    def test_weightless_yolo_world_raises(self):
        # Reference always loads a checkpoint (TStarFramework.py:180-185);
        # random weights must be an explicit opt-in.
        import pytest

        with pytest.raises(ValueError, match="yolo-world-random"):
            initialize_heuristic("yolo-world", size="small")

    def test_weightless_owl_vit_raises(self):
        import pytest

        with pytest.raises(ValueError, match="owl-vit-random"):
            initialize_heuristic("owl-vit")


class TestCompatSurface:
    def test_reference_detector_surface(self, tmp_path):
        """reparameterize_object_list / inference_detector / inference /
        bbox_visualization parity shape-check (interface_heuristic.py:78-190)."""
        import numpy as np
        from PIL import Image

        h = initialize_heuristic("yolo-world-random", size="small")
        h.reparameterize_object_list(["couch"], ["tv"])
        assert h.texts == [["couch"], ["tv"], [" "]]
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (120, 200, 3), dtype=np.uint8)
        dets = h.inference_detector([img, img], score_threshold=0.05)
        assert len(dets) == 2 and h.detections_inbatch is dets
        for d in dets:
            assert set(d) == {"xyxy", "confidence", "class_id"}
            if len(d["xyxy"]):
                assert d["xyxy"][:, 2].max() <= 200 + 1e-3  # image coords
        annotated = h.bbox_visualization([img, img], dets)
        assert annotated[0].shape == img.shape
        p = tmp_path / "img.png"
        Image.fromarray(img).save(p)
        d = h.inference(str(p), score_threshold=0.05)
        assert set(d) == {"xyxy", "confidence", "class_id"}

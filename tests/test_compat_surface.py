"""Reference-compat detector surface + misc utility parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tstar_tpu.framework.heuristics import OwlVitHeuristic
from tstar_tpu.models.clip_tokenizer import HashTokenizer
from tstar_tpu.models.owlvit import OwlViTConfig, OwlViTDetector, TextConfig, VisionConfig
from tstar_tpu.utils.images import extract_frames_from_gif, save_as_gif

cv2 = pytest.importorskip("cv2")

TINY = OwlViTConfig(
    vision=VisionConfig(hidden_size=32, num_layers=2, num_heads=4,
                        intermediate_size=64, patch_size=16, image_size=64),
    text=TextConfig(vocab_size=100, hidden_size=24, num_layers=2, num_heads=4,
                    intermediate_size=48, max_length=8),
    projection_dim=24,
)


@pytest.fixture(scope="module")
def heuristic():
    h = OwlVitHeuristic.__new__(OwlVitHeuristic)
    h.name = "owl-vit-tiny"
    h.model = OwlViTDetector(TINY, dtype=jnp.float32)
    h.variables = h.model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((2, 8), jnp.int32)
    )
    h.tokenizer = HashTokenizer(vocab_size=100, context=8)
    return h


class TestDetectorCompatSurface:
    def test_reparameterize_and_detect(self, heuristic):
        heuristic.reparameterize_object_list(["couch"], ["tv", "chair"])
        assert heuristic.texts == [["couch"], ["tv"], ["chair"], [" "]]
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 256, (48, 80, 3), np.uint8) for _ in range(2)]
        dets = heuristic.inference_detector(imgs)
        assert len(dets) == 2
        for d in dets:
            assert set(d) == {"xyxy", "confidence", "class_id"}
            n = len(d["confidence"])
            assert d["xyxy"].shape == (n, 4)
            if n:
                # boxes scaled back to the ORIGINAL image size
                assert d["xyxy"][:, 2].max() <= 80 * 1.5
        assert heuristic.detections_inbatch is dets

    def test_requires_reparameterize_first(self, heuristic):
        h2 = OwlVitHeuristic.__new__(OwlVitHeuristic)
        h2.model, h2.variables, h2.tokenizer = (
            heuristic.model, heuristic.variables, heuristic.tokenizer
        )
        h2.texts = []
        with pytest.raises(RuntimeError, match="reparameterize"):
            h2.inference_detector([np.zeros((32, 32, 3), np.uint8)])

    def test_bbox_visualization(self, heuristic):
        heuristic.reparameterize_object_list(["couch"], [])
        img = np.zeros((60, 90, 3), np.uint8)
        dets = [{
            "xyxy": np.array([[10.0, 10.0, 40.0, 30.0]]),
            "confidence": np.array([0.9]),
            "class_id": np.array([0]),
        }]
        out = heuristic.bbox_visualization([img], dets)
        assert out[0].shape == img.shape
        assert out[0].sum() > 0          # something was drawn
        assert img.sum() == 0            # input untouched


class TestGifRoundtrip:
    def test_save_and_extract(self, tmp_path):
        frames = [np.full((20, 30, 3), i * 40, np.uint8) for i in range(4)]
        gif = str(tmp_path / "anim.gif")
        save_as_gif(frames, gif)
        n = extract_frames_from_gif(gif, str(tmp_path / "out"))
        assert n == 4
        import os

        assert len(os.listdir(tmp_path / "out" / "anim")) == 4

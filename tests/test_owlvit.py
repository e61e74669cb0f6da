"""Numerical parity of the Flax OWL-ViT against the HF torch implementation.

A tiny random-weight torch ``OwlViTForObjectDetection`` is built offline (no
downloads), its state dict converted with ``convert_hf_owlvit_state_dict``,
and logits/boxes compared on random inputs.  This validates the architecture
transcription and the converter for the real ``google/owlvit-base-patch32``
weights used by the reference (interface_heuristic.py:176).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tstar_tpu.models.owlvit import (
    OwlViTConfig,
    OwlViTDetector,
    TextConfig,
    VisionConfig,
    convert_hf_owlvit_state_dict,
    postprocess_detections,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


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


@pytest.fixture(scope="module")
def torch_model():
    hf_cfg = transformers.OwlViTConfig(
        text_config=dict(
            vocab_size=100, hidden_size=24, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=48,
            max_position_embeddings=8,
        ),
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, patch_size=16, image_size=64,
        ),
        projection_dim=24,
    )
    torch.manual_seed(0)
    model = transformers.OwlViTForObjectDetection(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def inputs():
    # HF's detection forward expects input_ids of shape (batch * queries, S)
    # with queries private to each image; our model shares one query set
    # across the image batch (what the search loop needs).  Parity therefore
    # uses a single image; batch broadcast is checked separately.
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    # 3 queries of length 8; EOT = the max id in each row (CLIP pooling rule).
    ids = rng.integers(1, 90, size=(3, 8)).astype(np.int64)
    ids[:, 0] = 49  # "BOS"-ish
    ids[:, 5] = 99  # EOT = highest id, at position 5
    ids[:, 6:] = 0  # padding
    mask = (ids > 0).astype(np.int64)
    return pixels, ids, mask


class TestParityWithTorch:
    def test_logits_and_boxes_match(self, torch_model, inputs):
        pixels, ids, mask = inputs
        with torch.no_grad():
            out = torch_model(
                input_ids=torch.tensor(ids),
                pixel_values=torch.tensor(pixels).permute(0, 3, 1, 2),
                attention_mask=torch.tensor(mask),
            )
        want_logits = out.logits.numpy()[...]
        want_boxes = out.pred_boxes.numpy()

        params = convert_hf_owlvit_state_dict(torch_model.state_dict(), TINY)
        model = OwlViTDetector(TINY, dtype=jnp.float32)
        got_logits, got_boxes = model.apply(
            params,
            jnp.asarray(pixels),
            jnp.asarray(ids),
            jnp.asarray(mask),
            jnp.asarray(mask[:, 0] > 0),
        )
        np.testing.assert_allclose(
            np.asarray(got_logits), want_logits, rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(got_boxes), want_boxes, rtol=2e-4, atol=2e-4
        )

    def test_text_encoding_hoisted_equals_full(self, torch_model, inputs):
        # encode_text + encode_image + predict == __call__ (the search loop
        # uses the split path to hoist text encoding out of the loop).
        pixels, ids, mask = inputs
        params = convert_hf_owlvit_state_dict(torch_model.state_dict(), TINY)
        model = OwlViTDetector(TINY, dtype=jnp.float32)

        full = model.apply(
            params, jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask)
        )
        q = model.apply(
            params, jnp.asarray(ids), jnp.asarray(mask), method=OwlViTDetector.encode_text
        )
        feats = model.apply(params, jnp.asarray(pixels), method=OwlViTDetector.encode_image)
        split = model.apply(params, feats, q, method=OwlViTDetector.predict)
        np.testing.assert_allclose(
            np.asarray(full[0]), np.asarray(split[0]), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(full[1]), np.asarray(split[1]), rtol=1e-5, atol=1e-5
        )


class TestBatchBroadcast:
    def test_shared_queries_over_image_batch(self, torch_model, inputs):
        # Our model evaluates one query set against B images in one forward;
        # HF requires one call per image.  Results must agree per image.
        pixels1, ids, mask = inputs
        rng = np.random.default_rng(7)
        pixels2 = rng.standard_normal(pixels1.shape).astype(np.float32)
        batch = np.concatenate([pixels1, pixels2], axis=0)

        params = convert_hf_owlvit_state_dict(torch_model.state_dict(), TINY)
        model = OwlViTDetector(TINY, dtype=jnp.float32)
        got_logits, _ = model.apply(
            params, jnp.asarray(batch), jnp.asarray(ids), jnp.asarray(mask)
        )
        for b, px in enumerate([pixels1, pixels2]):
            with torch.no_grad():
                out = torch_model(
                    input_ids=torch.tensor(ids),
                    pixel_values=torch.tensor(px).permute(0, 3, 1, 2),
                    attention_mask=torch.tensor(mask),
                )
            np.testing.assert_allclose(
                np.asarray(got_logits)[b], out.logits.numpy()[0], rtol=2e-4, atol=2e-4
            )


class TestPostprocess:
    def test_matches_hf_rule(self):
        rng = np.random.default_rng(1)
        logits = rng.standard_normal((1, 6, 3)).astype(np.float32)
        boxes = rng.random((1, 6, 4)).astype(np.float32) * 0.5 + 0.25
        scores, cls, xyxy = postprocess_detections(
            jnp.asarray(logits), jnp.asarray(boxes), image_hw=(380, 800)
        )
        want_scores = 1.0 / (1.0 + np.exp(-logits.max(-1)))
        np.testing.assert_allclose(np.asarray(scores), want_scores, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(cls), logits.argmax(-1))
        cx, cy, w, h = np.moveaxis(boxes, -1, 0)
        np.testing.assert_allclose(
            np.asarray(xyxy)[..., 0], (cx - w / 2) * 800, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(xyxy)[..., 3], (cy + h / 2) * 380, rtol=1e-6
        )


class TestOwlv2:
    def test_owlv2_checkpoint_parity(self):
        # OWLv2 shares the architecture (prefix owlv2., extra objectness
        # head unused by the T* scoring path); converter auto-detects.
        hf_cfg = transformers.Owlv2Config(
            text_config=dict(
                vocab_size=100, hidden_size=24, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=48,
                max_position_embeddings=8,
            ),
            vision_config=dict(
                hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                intermediate_size=64, patch_size=16, image_size=64,
            ),
            projection_dim=24,
        )
        torch.manual_seed(1)
        tm = transformers.Owlv2ForObjectDetection(hf_cfg)
        tm.eval()
        rng = np.random.default_rng(3)
        pixels = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
        ids = rng.integers(1, 90, size=(2, 8)).astype(np.int64)
        ids[:, 0] = 49
        ids[:, 5] = 99
        ids[:, 6:] = 0
        mask = (ids > 0).astype(np.int64)
        with torch.no_grad():
            out = tm(
                input_ids=torch.tensor(ids),
                pixel_values=torch.tensor(pixels).permute(0, 3, 1, 2),
                attention_mask=torch.tensor(mask),
            )
        params = convert_hf_owlvit_state_dict(tm.state_dict(), TINY)
        model = OwlViTDetector(TINY, dtype=jnp.float32)
        logits, boxes = model.apply(
            params, jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask)
        )
        np.testing.assert_allclose(
            np.asarray(logits), out.logits.numpy(), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(boxes), out.pred_boxes.numpy(), rtol=2e-4, atol=2e-4
        )


class TestBF16:
    def test_bf16_forward_close_to_f32(self, torch_model, inputs):
        pixels, ids, mask = inputs
        params = convert_hf_owlvit_state_dict(torch_model.state_dict(), TINY)
        f32 = OwlViTDetector(TINY, dtype=jnp.float32)
        b16 = OwlViTDetector(TINY, dtype=jnp.bfloat16)
        lo32, _ = f32.apply(params, jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask))
        lo16, _ = b16.apply(params, jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask))
        # post-sigmoid scores are what the search consumes
        s32 = jax.nn.sigmoid(jnp.max(lo32, -1))
        s16 = jax.nn.sigmoid(jnp.max(lo16, -1))
        assert float(jnp.max(jnp.abs(s32 - s16))) < 0.05

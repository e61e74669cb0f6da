"""Numerical parity of the Flax Qwen2-VL against HF torch (tiny random)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tstar_tpu.models.qwen2vl import (
    Qwen2VLConfig,
    Qwen2VLModel,
    Qwen2VLTextConfig,
    Qwen2VLVisionConfig,
    build_mrope_position_ids,
    convert_hf_qwen2vl_state_dict,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMG_TOK, VID_TOK, VSTART = 151, 152, 150

TINY = Qwen2VLConfig(
    vision=Qwen2VLVisionConfig(
        depth=2, embed_dim=16, num_heads=2, mlp_ratio=2.0, patch_size=2,
        temporal_patch_size=1, spatial_merge_size=2, hidden_size=32,
    ),
    text=Qwen2VLTextConfig(
        vocab_size=200, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, rope_theta=10000.0,
        mrope_section=(1, 1, 2), tie_word_embeddings=False,
        rms_norm_eps=1e-5,  # the HF class default (checkpoints may override)
    ),
    image_token_id=IMG_TOK,
    video_token_id=VID_TOK,
    vision_start_token_id=VSTART,
)


@pytest.fixture(scope="module")
def torch_model():
    cfg = transformers.Qwen2VLConfig(
        text_config=dict(
            vocab_size=200, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
            rope_theta=10000.0,
            rope_scaling={"type": "mrope", "mrope_section": [1, 1, 2]},
            max_position_embeddings=512, tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=2, embed_dim=16, num_heads=2, mlp_ratio=2.0, patch_size=2,
            temporal_patch_size=1, spatial_merge_size=2, in_chans=3,
            hidden_size=32,
        ),
        image_token_id=IMG_TOK, video_token_id=VID_TOK,
        vision_start_token_id=VSTART,
    )
    torch.manual_seed(0)
    m = transformers.Qwen2VLForConditionalGeneration(cfg)
    m.eval()
    return m


@pytest.fixture(scope="module")
def flax_model_and_params(torch_model):
    params = convert_hf_qwen2vl_state_dict(torch_model.state_dict(), TINY)
    return Qwen2VLModel(TINY, dtype=jnp.float32), params


class TestTextParity:
    def test_text_only_logits_match(self, torch_model, flax_model_and_params):
        model, params = flax_model_and_params
        rng = np.random.default_rng(0)
        ids = rng.integers(1, 150, size=(2, 9)).astype(np.int64)
        with torch.no_grad():
            want = torch_model(input_ids=torch.tensor(ids)).logits.numpy()
        pos = np.stack([
            build_mrope_position_ids(ids[b], IMG_TOK, [],
                                     TINY.vision.spatial_merge_size)
            for b in range(2)
        ], axis=1)  # (3, B, S)
        got = model.apply(params, jnp.asarray(ids), jnp.asarray(pos))
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


class TestVisionParity:
    def test_vision_tower_matches(self, torch_model, flax_model_and_params):
        model, params = flax_model_and_params
        rng = np.random.default_rng(1)
        # one 8x8 image, patch 2, temporal 1 -> grid (1, 4, 4) = 16 patches
        grid_thw = torch.tensor([[1, 4, 4]])
        patches = rng.standard_normal((16, 3 * 1 * 2 * 2)).astype(np.float32)
        with torch.no_grad():
            want = torch_model.model.visual(
                torch.tensor(patches), grid_thw=grid_thw
            ).numpy()
        got = model.apply(
            params, jnp.asarray(patches)[None], (4, 4),
            method=Qwen2VLModel.encode_images,
        )[0]
        np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


class TestMultimodalParity:
    def test_logits_with_image_match(self, torch_model, flax_model_and_params):
        model, params = flax_model_and_params
        rng = np.random.default_rng(2)
        # grid (1,4,4) -> 16 patches -> 4 merged tokens -> 4 image tokens
        patches = rng.standard_normal((16, 12)).astype(np.float32)
        grid_thw = torch.tensor([[1, 4, 4]])
        ids = np.array([[5, VSTART, IMG_TOK, IMG_TOK, IMG_TOK, IMG_TOK, 7, 9, 11]])
        with torch.no_grad():
            want = torch_model(
                input_ids=torch.tensor(ids),
                pixel_values=torch.tensor(patches),
                image_grid_thw=grid_thw,
            ).logits.numpy()
        pos = build_mrope_position_ids(ids[0], IMG_TOK, [(1, 4, 4)],
                                       TINY.vision.spatial_merge_size)
        got = model.apply(
            params,
            jnp.asarray(ids),
            jnp.asarray(pos)[:, None],
            None,
            jnp.asarray(patches)[None],
            (4, 4),
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)

    def test_mrope_position_ids_match_hf(self, torch_model):
        ids = np.array([[5, VSTART, IMG_TOK, IMG_TOK, IMG_TOK, IMG_TOK, 7, 9, 11]])
        want, _ = torch_model.model.get_rope_index(
            torch.tensor(ids), image_grid_thw=torch.tensor([[1, 4, 4]])
        )
        got = build_mrope_position_ids(ids[0], IMG_TOK, [(1, 4, 4)], 2)
        np.testing.assert_array_equal(got, want.numpy()[:, 0])

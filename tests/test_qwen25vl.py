"""Qwen2.5-VL parity vs HF torch (tiny random): vision tower + full forward."""

import numpy as np
import jax.numpy as jnp
import pytest

from tstar_tpu.models.qwen2vl import (
    Qwen2VLConfig,
    Qwen2VLModel,
    Qwen2VLTextConfig,
    build_mrope_position_ids,
    convert_hf_qwen2vl_state_dict,
)
from tstar_tpu.models.qwen25_vision import Qwen25VisionConfig, window_partition

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMG_TOK, VID_TOK, VSTART = 151, 152, 150

# 8x8 patch grid with window_size 8 -> 2x2-unit windows (2 units/side), so a
# 4x4-unit image splits into 4 windows: real window attention, not全 trivial.
TINY = Qwen2VLConfig(
    vision=Qwen25VisionConfig(
        depth=3, embed_dim=16, num_heads=2, intermediate_size=32, patch_size=2,
        temporal_patch_size=1, spatial_merge_size=2, hidden_size=32,
        window_size=8, fullatt_block_indexes=(1,),
    ),
    text=Qwen2VLTextConfig(
        vocab_size=200, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, rope_theta=10000.0,
        mrope_section=(1, 1, 2), tie_word_embeddings=False, rms_norm_eps=1e-5,
    ),
    image_token_id=IMG_TOK, video_token_id=VID_TOK, vision_start_token_id=VSTART,
)


@pytest.fixture(scope="module")
def torch_model():
    cfg = transformers.Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=200, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
            rope_theta=10000.0,
            rope_scaling={"type": "mrope", "mrope_section": [1, 1, 2]},
            max_position_embeddings=512, tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=3, hidden_size=16, num_heads=2, intermediate_size=32,
            patch_size=2, temporal_patch_size=1, spatial_merge_size=2,
            in_chans=3, out_hidden_size=32, window_size=8,
            fullatt_block_indexes=[1],
        ),
        image_token_id=IMG_TOK, video_token_id=VID_TOK,
        vision_start_token_id=VSTART,
    )
    torch.manual_seed(0)
    m = transformers.Qwen2_5_VLForConditionalGeneration(cfg)
    m.eval()
    return m


class TestWindowPartition:
    def test_matches_hf_get_window_index(self, torch_model):
        grid = torch.tensor([[1, 8, 8]])
        want_idx, want_cu = torch_model.model.visual.get_window_index(grid)
        got_idx, seg = window_partition(8, 8, TINY.vision)
        np.testing.assert_array_equal(got_idx, want_idx.numpy())
        # segment boundaries must match HF's cu_window_seqlens (patch units)
        want_cu = np.unique(np.asarray(want_cu))
        got_cu = np.concatenate([[0], np.cumsum(np.bincount(seg))])
        np.testing.assert_array_equal(got_cu, want_cu)


class TestVisionParity:
    def test_tower_matches(self, torch_model):
        params = convert_hf_qwen2vl_state_dict(torch_model.state_dict(), TINY)
        model = Qwen2VLModel(TINY, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        patches = rng.standard_normal((64, 12)).astype(np.float32)  # 8x8 grid
        with torch.no_grad():
            want = torch_model.model.visual(
                torch.tensor(patches), grid_thw=torch.tensor([[1, 8, 8]])
            ).numpy()
        got = model.apply(
            params, jnp.asarray(patches)[None], (8, 8),
            method=Qwen2VLModel.encode_images,
        )[0]
        np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


class TestFullForwardParity:
    def test_multimodal_logits_match(self, torch_model):
        params = convert_hf_qwen2vl_state_dict(torch_model.state_dict(), TINY)
        model = Qwen2VLModel(TINY, dtype=jnp.float32)
        rng = np.random.default_rng(1)
        patches = rng.standard_normal((64, 12)).astype(np.float32)
        # 64 patches -> 16 merged tokens
        ids = np.array([[5, VSTART] + [IMG_TOK] * 16 + [7, 9]])
        with torch.no_grad():
            want = torch_model(
                input_ids=torch.tensor(ids),
                pixel_values=torch.tensor(patches),
                image_grid_thw=torch.tensor([[1, 8, 8]]),
            ).logits.numpy()
        pos = build_mrope_position_ids(ids[0], IMG_TOK, [(1, 8, 8)], 2)
        got = model.apply(
            params, jnp.asarray(ids), jnp.asarray(pos)[:, None], None,
            jnp.asarray(patches)[None], (8, 8),
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)

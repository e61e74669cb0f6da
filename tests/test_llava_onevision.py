"""LLaVA-OneVision parity vs HF torch (tiny random): tower + video path."""

import numpy as np
import jax.numpy as jnp
import pytest

from tstar_tpu.models.llava_onevision import (
    LlavaOnevisionConfig,
    LlavaOnevisionModel,
    convert_hf_llava_onevision_state_dict,
)
from tstar_tpu.models.qwen2vl import Qwen2VLTextConfig, build_mrope_position_ids
from tstar_tpu.models.siglip import SiglipVisionConfig

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMG_TOK, VID_TOK = 151, 152

TINY = LlavaOnevisionConfig(
    vision=SiglipVisionConfig(
        hidden_size=16, num_layers=2, num_heads=2, intermediate_size=32,
        patch_size=2, image_size=8,
    ),
    text=Qwen2VLTextConfig(
        vocab_size=200, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, rope_theta=10000.0,
        mrope_section=(4, 0, 0),   # plain 1-D rope (head_dim=8 -> half=4)
        tie_word_embeddings=False, rms_norm_eps=1e-6,  # plain-Qwen2 default
    ),
    image_token_id=IMG_TOK,
    video_token_id=VID_TOK,
)


@pytest.fixture(scope="module")
def torch_model():
    cfg = transformers.LlavaOnevisionConfig(
        text_config=dict(
            model_type="qwen2", vocab_size=200, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=64, rope_theta=10000.0,
            max_position_embeddings=512, tie_word_embeddings=False,
        ),
        vision_config=dict(
            model_type="siglip_vision_model", hidden_size=16,
            num_hidden_layers=2, num_attention_heads=2, intermediate_size=32,
            patch_size=2, image_size=8, num_channels=3,
        ),
        image_token_index=IMG_TOK, video_token_index=VID_TOK,
        image_grid_pinpoints=[[8, 8], [8, 16], [16, 8]],
        vision_feature_layer=-1, vision_feature_select_strategy="full",
    )
    torch.manual_seed(0)
    m = transformers.LlavaOnevisionForConditionalGeneration(cfg)
    m.eval()
    return m


class TestSiglipParity:
    def test_tower_hidden_states_match(self, torch_model):
        params = convert_hf_llava_onevision_state_dict(torch_model.state_dict(), TINY)
        model = LlavaOnevisionModel(TINY, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        px = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
        with torch.no_grad():
            out = torch_model.model.vision_tower(
                torch.tensor(px).permute(0, 3, 1, 2), output_hidden_states=True
            )
        want = out.hidden_states[-1].numpy()

        def tower(m, p):
            return m.vision(p, -1)

        got = model.apply(params, jnp.asarray(px), method=tower)
        np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


class TestVideoPathParity:
    def test_video_features_match(self, torch_model):
        params = convert_hf_llava_onevision_state_dict(torch_model.state_dict(), TINY)
        model = LlavaOnevisionModel(TINY, dtype=jnp.float32)
        rng = np.random.default_rng(1)
        frames = rng.standard_normal((3, 8, 8, 3)).astype(np.float32)
        with torch.no_grad():
            want = torch_model.model.get_video_features(
                torch.tensor(frames).permute(0, 3, 1, 2)[None],
                vision_feature_layer=-1,
                vision_feature_select_strategy="full",
            ).numpy()[0]   # (F*pooled, D), newline appended in forward
        got = np.asarray(
            model.apply(params, jnp.asarray(frames), method=LlavaOnevisionModel.encode_images)
        )[0]
        # ours appends image_newline as the final token
        np.testing.assert_allclose(got[:-1], want, rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(
            got[-1],
            np.asarray(params["params"]["image_newline"]),
            rtol=1e-6,
        )

    def test_full_forward_with_video_matches(self, torch_model):
        params = convert_hf_llava_onevision_state_dict(torch_model.state_dict(), TINY)
        model = LlavaOnevisionModel(TINY, dtype=jnp.float32)
        rng = np.random.default_rng(2)
        frames = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
        # tokens/frame: 8/2=4 side -> pooled 2x2=4; 2 frames + newline = 9
        n_video_tokens = 2 * TINY.tokens_per_frame + 1
        ids = np.array([[5] + [VID_TOK] * n_video_tokens + [7, 9]])
        with torch.no_grad():
            want = torch_model(
                input_ids=torch.tensor(ids),
                pixel_values_videos=torch.tensor(frames).permute(0, 3, 1, 2)[None],
            ).logits.numpy()
        pos = build_mrope_position_ids(ids[0], 9999, [], 2)  # plain arange
        got = model.apply(
            params, jnp.asarray(ids), jnp.asarray(pos)[:, None], None,
            jnp.asarray(frames),
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=4e-4, atol=4e-4)


class TestGeneration:
    def test_greedy_matches_hf(self, torch_model):
        from tstar_tpu.models.generate import generate

        params = convert_hf_llava_onevision_state_dict(torch_model.state_dict(), TINY)
        model = LlavaOnevisionModel(TINY, dtype=jnp.float32)
        rng = np.random.default_rng(3)
        frames = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
        n_video_tokens = 2 * TINY.tokens_per_frame + 1
        ids = np.array([[5] + [VID_TOK] * n_video_tokens + [7]])
        with torch.no_grad():
            want = torch_model.generate(
                input_ids=torch.tensor(ids),
                pixel_values_videos=torch.tensor(frames).permute(0, 3, 1, 2)[None],
                max_new_tokens=5, do_sample=False,
                eos_token_id=199, pad_token_id=0,
            ).numpy()[0, ids.shape[1]:]
        pos = build_mrope_position_ids(ids[0], 9999, [], 2)[:, None]
        got = np.asarray(
            generate(
                model, params, ids, np.array([ids.shape[1]]), pos,
                max_new_tokens=5, eos_token_ids=[199], temperature=0.0,
                image_patches=jnp.asarray(frames), image_grid_hw=None,
                cache_dtype=jnp.float32,
            )
        )[0]
        n = min(len(want), len(got))
        np.testing.assert_array_equal(got[:n], want[:n])

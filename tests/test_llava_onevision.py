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


class TestAnyResImagePath:
    def test_matches_hf_get_image_features(self, torch_model):
        params = convert_hf_llava_onevision_state_dict(torch_model.state_dict(), TINY)
        model = LlavaOnevisionModel(TINY, dtype=jnp.float32)
        rng = np.random.default_rng(5)
        # pinpoints include [8,16]: image (8,16) -> base + 1x2 tile grid = 3
        tiles = rng.standard_normal((3, 8, 8, 3)).astype(np.float32)
        with torch.no_grad():
            want = torch_model.model.get_image_features(
                torch.tensor(tiles).permute(0, 3, 1, 2)[None],
                image_sizes=torch.tensor([[8, 16]]),
            )[0].numpy()
        got = np.asarray(
            model.apply(
                params, jnp.asarray(tiles), (8, 16), (1, 2),
                method=LlavaOnevisionModel.encode_anyres_image,
            )
        )
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=4e-4, atol=4e-4)

    def test_unpad_crops_rows_for_wide_images(self, torch_model):
        # original (4, 16) is wider than the (8, 16) tile canvas: rows crop.
        params = convert_hf_llava_onevision_state_dict(torch_model.state_dict(), TINY)
        model = LlavaOnevisionModel(TINY, dtype=jnp.float32)
        rng = np.random.default_rng(6)
        tiles = rng.standard_normal((3, 8, 8, 3)).astype(np.float32)
        with torch.no_grad():
            want = torch_model.model.get_image_features(
                torch.tensor(tiles).permute(0, 3, 1, 2)[None],
                image_sizes=torch.tensor([[4, 16]]),
            )[0].numpy()
        got = np.asarray(
            model.apply(
                params, jnp.asarray(tiles), (4, 16), (1, 2),
                method=LlavaOnevisionModel.encode_anyres_image,
            )
        )
        np.testing.assert_allclose(got, want, rtol=4e-4, atol=4e-4)


class TestAnyResProcessor:
    def test_matches_hf_image_processor(self):
        from transformers.models.llava_onevision.image_processing_llava_onevision import (
            LlavaOnevisionImageProcessor,
        )

        from tstar_tpu.models.llava_onevision import preprocess_anyres_image

        pinpoints = [[8, 8], [8, 16], [16, 8], [16, 16]]
        proc = LlavaOnevisionImageProcessor(
            size={"height": 8, "width": 8}, image_grid_pinpoints=pinpoints,
            image_mean=[0.5] * 3, image_std=[0.5] * 3,
        )
        # smooth gradient: PIL-vs-cv2 resampler differences stay small
        yy, xx = np.mgrid[0:10, 0:30]
        img = np.stack([yy * 20, xx * 8, yy * 10 + xx * 4], -1).astype(np.uint8)
        hf = proc(images=[img], return_tensors="np")
        want = hf["pixel_values"][0]                    # (n_patches, 3, 8, 8)
        got, image_size, grid = preprocess_anyres_image(img, TINY, pinpoints)
        assert image_size == (10, 30)
        assert got.shape[0] == want.shape[0] == 3
        assert grid == (1, 2)  # best pinpoint for (10, 30) is (8, 16)
        got_chw = got.transpose(0, 3, 1, 2)
        assert np.abs(got_chw - want).mean() < 0.05
        # (10, 30) into an (8, 16) canvas leaves padded rows top+bottom:
        # padding must land identically (normalized zero-pixels match exactly)
        np.testing.assert_allclose(got_chw[1:, :, 0], want[1:, :, 0], atol=1e-6)
        np.testing.assert_allclose(got_chw[1:, :, 7], want[1:, :, 7], atol=1e-6)

    def test_end_to_end_anyres_tokens(self, torch_model):
        # processor -> encode_anyres_image runs end to end with sane shape
        from tstar_tpu.models.llava_onevision import preprocess_anyres_image

        params = convert_hf_llava_onevision_state_dict(torch_model.state_dict(), TINY)
        model = LlavaOnevisionModel(TINY, dtype=jnp.float32)
        rng = np.random.default_rng(8)
        img = rng.integers(0, 256, (10, 21, 3), np.uint8)
        tiles, image_size, grid = preprocess_anyres_image(
            img, TINY, [[8, 8], [8, 16], [16, 8]]
        )
        out = model.apply(
            params, jnp.asarray(tiles), image_size, grid,
            method=LlavaOnevisionModel.encode_anyres_image,
        )
        assert out.ndim == 2 and out.shape[1] == 32
        assert np.isfinite(np.asarray(out)).all()


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

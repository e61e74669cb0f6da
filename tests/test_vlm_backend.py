"""End-to-end JaxVLMBackend: tiny checkpoint on disk -> UniversalGrounder.

Exercises the full chain the reference exercises with Qwen on GPU
(interface_grounding.py:52-150): checkpoint loading, image preprocessing,
chat templating, tokenization, cached generation, and decoding — hermetically
with a tiny random model written to a real checkpoint directory.
"""

import json

import numpy as np
import pytest

from tstar_tpu.grounding.universal import UniversalGrounder

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
safetensors = pytest.importorskip("safetensors")


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("qwen_ckpt")
    cfg = transformers.Qwen2VLConfig(
        text_config=dict(
            vocab_size=151700, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
            rope_theta=10000.0,
            rope_scaling={"type": "mrope", "mrope_section": [1, 1, 2]},
            max_position_embeddings=4096, rms_norm_eps=1e-5,
            tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=2, embed_dim=16, num_heads=2, mlp_ratio=2.0, patch_size=14,
            temporal_patch_size=2, spatial_merge_size=2, in_chans=3,
            hidden_size=32,
        ),
    )
    torch.manual_seed(0)
    model = transformers.Qwen2VLForConditionalGeneration(cfg)
    sd = {k: v.contiguous() for k, v in model.state_dict().items()}
    from safetensors.torch import save_file

    save_file(sd, str(d / "model.safetensors"))
    hf_cfg = json.loads(cfg.to_json_string())
    hf_cfg["text_config"]["rope_scaling"] = {"type": "mrope", "mrope_section": [1, 1, 2]}
    (d / "config.json").write_text(json.dumps(hf_cfg))

    # tiny byte-level vocab + merges (tokenizer files every checkpoint ships)
    from tstar_tpu.models.qwen_tokenizer import _bytes_to_unicode

    b2u = _bytes_to_unicode()
    vocab = {}
    for b in range(256):
        vocab.setdefault(b2u[b], len(vocab))
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    return str(d)


@pytest.fixture(scope="module")
def llava_checkpoint_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("llava_ckpt")
    cfg = transformers.LlavaOnevisionConfig(
        text_config=dict(
            model_type="qwen2", vocab_size=151700, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=64, rope_theta=10000.0,
            max_position_embeddings=4096, tie_word_embeddings=False,
        ),
        vision_config=dict(
            model_type="siglip_vision_model", hidden_size=16,
            num_hidden_layers=2, num_attention_heads=2, intermediate_size=32,
            patch_size=2, image_size=8, num_channels=3,
        ),
        image_token_index=151646, video_token_index=151647,
        image_grid_pinpoints=[[8, 8]], vision_feature_layer=-1,
        vision_feature_select_strategy="full",
    )
    torch.manual_seed(0)
    model = transformers.LlavaOnevisionForConditionalGeneration(cfg)
    from safetensors.torch import save_file

    save_file(
        {k: v.contiguous() for k, v in model.state_dict().items()},
        str(d / "model.safetensors"),
    )
    (d / "config.json").write_text(cfg.to_json_string())

    from tstar_tpu.models.qwen_tokenizer import _bytes_to_unicode

    b2u = _bytes_to_unicode()
    vocab = {}
    for b in range(256):
        vocab.setdefault(b2u[b], len(vocab))
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    return str(d)


class TestLlavaBackendEndToEnd:
    def test_grounder_dispatch_and_inference(self, llava_checkpoint_dir):
        g = UniversalGrounder(
            model_name="llava-onevision", model_path=llava_checkpoint_dir
        )
        rng = np.random.default_rng(0)
        frames = [rng.integers(0, 256, (32, 48, 3), np.uint8) for _ in range(3)]
        out = g.inference_qa(frames, "What color?", "A) Red\nB) Blue",
                             temperature=0.0)
        assert isinstance(out, str)
        out2 = g.inference_qa(frames, "What color?", "A) Red\nB) Blue",
                              temperature=0.0)
        assert out == out2  # greedy determinism through the facade


class TestJaxVLMBackendEndToEnd:
    def test_grounder_dispatch_and_inference(self, checkpoint_dir):
        import jax.numpy as jnp

        g = UniversalGrounder(model_name="qwen2-vl-tiny", model_path=checkpoint_dir)
        g.backend.max_pixels = 56 * 56
        rng = np.random.default_rng(0)
        frames = [rng.integers(0, 256, (64, 80, 3), np.uint8) for _ in range(2)]
        out = g.backend.inference_with_frames(
            "Here is a video:\n<image>\n<image>\nDescribe it.",
            frames=frames, temperature=0.0, max_tokens=4,
        )
        assert isinstance(out, str)  # random weights -> arbitrary text, no crash

    def test_qa_deterministic_at_temp0(self, checkpoint_dir):
        g = UniversalGrounder(model_name="qwen2-vl-tiny", model_path=checkpoint_dir)
        g.backend.max_pixels = 56 * 56
        rng = np.random.default_rng(1)
        frames = [rng.integers(0, 256, (64, 80, 3), np.uint8)]
        a = g.backend.inference_with_frames("Q: <image> what?", frames, 0.0, 4)
        b = g.backend.inference_with_frames("Q: <image> what?", frames, 0.0, 4)
        assert a == b


class TestBatchedInference:
    def test_batch_matches_serial_greedy(self, checkpoint_dir):
        """Batched generation (shared prefill/decode) == serial, greedy.

        Mixes two frame resolutions so the batch splits into two signature
        groups, exercising the grouping + padding + image-stream-order logic.
        """
        g = UniversalGrounder(model_name="qwen2-vl-tiny", model_path=checkpoint_dir)
        g.backend.max_pixels = 56 * 56
        rng = np.random.default_rng(2)
        reqs = [
            ("Q: <image> first?", [rng.integers(0, 256, (64, 80, 3), np.uint8)]),
            ("Q: <image> second, longer question text?",
             [rng.integers(0, 256, (64, 80, 3), np.uint8)]),
            ("Q: <image> other resolution?",
             [rng.integers(0, 256, (80, 64, 3), np.uint8)]),
        ]
        serial = [
            g.backend.inference_with_frames(q, f, temperature=0.0, max_tokens=4)
            for q, f in reqs
        ]
        batched = g.backend.inference_with_frames_batch(
            [q for q, _ in reqs], [f for _, f in reqs],
            temperature=0.0, max_tokens=4,
        )
        assert batched == serial

    def test_facade_qa_batch_uses_backend_batch(self, checkpoint_dir):
        g = UniversalGrounder(model_name="qwen2-vl-tiny", model_path=checkpoint_dir)
        g.backend.max_pixels = 56 * 56
        rng = np.random.default_rng(3)
        items = [
            {"frames": [rng.integers(0, 256, (64, 80, 3), np.uint8)],
             "question": f"what {i}?", "options": "A) x\nB) y"}
            for i in range(2)
        ]
        outs = g.inference_qa_batch(items, temperature=0.0)
        assert len(outs) == 2
        serial = [
            g.inference_qa(it["frames"], it["question"], it["options"],
                           temperature=0.0)
            for it in items
        ]
        assert outs == serial

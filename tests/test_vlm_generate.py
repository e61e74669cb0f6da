"""VLM generation, tokenizer, and processor parity tests."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from tstar_tpu.models.generate import generate
from tstar_tpu.models.qwen2vl import build_mrope_position_ids
from tstar_tpu.models.qwen2vl_processor import (
    build_chat_prompt,
    preprocess_image,
    smart_resize,
)
from tstar_tpu.models.qwen_tokenizer import QwenTokenizer

from tests.test_qwen2vl import IMG_TOK, TINY, flax_model_and_params, torch_model  # noqa: F401

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


class TestGreedyGenerationParity:
    def test_text_only_matches_hf_generate(self, torch_model, flax_model_and_params):
        model, params = flax_model_and_params
        rng = np.random.default_rng(0)
        ids = rng.integers(1, 150, size=(1, 7)).astype(np.int64)
        with torch.no_grad():
            want = torch_model.generate(
                input_ids=torch.tensor(ids), max_new_tokens=6, do_sample=False,
                eos_token_id=199, pad_token_id=0,
            ).numpy()[0, 7:]
        pos = build_mrope_position_ids(ids[0], IMG_TOK, [], 2)[:, None]
        got = np.asarray(
            generate(
                model, params, ids, np.array([7]), pos,
                max_new_tokens=6, eos_token_ids=[199], temperature=0.0,
                cache_dtype=jnp.float32,
            )
        )[0]
        n = min(len(want), len(got))
        np.testing.assert_array_equal(got[:n], want[:n])

    def test_multimodal_matches_hf_generate(self, torch_model, flax_model_and_params):
        model, params = flax_model_and_params
        rng = np.random.default_rng(1)
        patches = rng.standard_normal((16, 12)).astype(np.float32)
        ids = np.array([[5, 150, IMG_TOK, IMG_TOK, IMG_TOK, IMG_TOK, 7, 9]])
        with torch.no_grad():
            want = torch_model.generate(
                input_ids=torch.tensor(ids),
                pixel_values=torch.tensor(patches),
                image_grid_thw=torch.tensor([[1, 4, 4]]),
                max_new_tokens=5, do_sample=False,
                eos_token_id=199, pad_token_id=0,
            ).numpy()[0, 8:]
        pos = build_mrope_position_ids(ids[0], IMG_TOK, [(1, 4, 4)], 2)[:, None]
        got = np.asarray(
            generate(
                model, params, ids, np.array([8]), pos,
                max_new_tokens=5, eos_token_ids=[199], temperature=0.0,
                image_patches=jnp.asarray(patches)[None],
                image_grid_hw=(4, 4),
                cache_dtype=jnp.float32,
            )
        )[0]
        n = min(len(want), len(got))
        np.testing.assert_array_equal(got[:n], want[:n])

    def test_sampling_path_valid_and_deterministic(self, flax_model_and_params):
        """temperature > 0 runs the fused loop's sampling branch: tokens are
        in-vocab and reproducible for a fixed key."""
        import jax

        model, params = flax_model_and_params
        ids = np.array([[5, 6, 7, 9]])
        pos = build_mrope_position_ids(ids[0], IMG_TOK, [], 2)[:, None]
        outs = [
            np.asarray(generate(
                model, params, ids, np.array([4]), pos,
                max_new_tokens=6, eos_token_ids=[199], temperature=0.8,
                rng=jax.random.key(123), cache_dtype=jnp.float32,
            ))
            for _ in range(2)
        ]
        np.testing.assert_array_equal(outs[0], outs[1])
        assert outs[0].shape == (1, 6)
        assert (outs[0] >= 0).all() and (outs[0] < 200).all()

    def test_eos_freezes_sequence(self, flax_model_and_params):
        model, params = flax_model_and_params
        ids = np.array([[5, 6, 7]])
        pos = build_mrope_position_ids(ids[0], IMG_TOK, [], 2)[:, None]
        out = np.asarray(
            generate(
                model, params, ids, np.array([3]), pos,
                max_new_tokens=8, eos_token_ids=list(range(200)),  # everything stops
                temperature=0.0, cache_dtype=jnp.float32,
            )
        )[0]
        assert len(out) == 8  # padded to max_new_tokens after the stop


@pytest.fixture(scope="module")
def qwen_vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("qwen_vocab")
    # Byte-level: include all single printable byte symbols used by our texts.
    from tstar_tpu.models.qwen_tokenizer import _bytes_to_unicode

    b2u = _bytes_to_unicode()
    vocab = {}
    for b in range(256):
        vocab.setdefault(b2u[b], len(vocab))
    merges = [
        ("t", "h"), ("th", "e"),
        ("Ġ", "c"), ("Ġc", "o"), ("Ġco", "u"), ("Ġcou", "c"), ("Ġcouc", "h"),
        ("a", "n"), ("an", "d"),
        ("Ġ", "t"), ("Ġt", "v"),
    ]
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n"
    )
    return d


class TestQwenTokenizer:
    TEXTS = [
        "the couch and tv",
        "The COUCH!",
        "hello\nworld",
        "a,b;c 123",
        "  spaces  everywhere ",
    ]

    def test_parity_with_transformers(self, qwen_vocab_dir):
        ours = QwenTokenizer(
            str(qwen_vocab_dir / "vocab.json"), str(qwen_vocab_dir / "merges.txt")
        )
        theirs = transformers.Qwen2Tokenizer(
            vocab_file=str(qwen_vocab_dir / "vocab.json"),
            merges_file=str(qwen_vocab_dir / "merges.txt"),
        )
        for t in self.TEXTS:
            assert ours.encode(t) == theirs.encode(t), t

    def test_roundtrip_decode(self, qwen_vocab_dir):
        tok = QwenTokenizer(
            str(qwen_vocab_dir / "vocab.json"), str(qwen_vocab_dir / "merges.txt")
        )
        for t in self.TEXTS:
            assert tok.decode(tok.encode(t)) == t

    def test_special_tokens_split(self, qwen_vocab_dir):
        tok = QwenTokenizer(
            str(qwen_vocab_dir / "vocab.json"), str(qwen_vocab_dir / "merges.txt")
        )
        ids = tok.encode("<|im_start|>the<|im_end|>")
        assert ids[0] == 151644 and ids[-1] == 151645
        assert tok.decode(ids) == "the"
        assert tok.decode(ids, skip_special=False) == "<|im_start|>the<|im_end|>"


class TestProcessor:
    def test_smart_resize_matches_hf(self):
        from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
            smart_resize as hf_smart_resize,
        )

        for h, w in [(96, 160), (480, 640), (1080, 1920), (55, 300)]:
            assert smart_resize(h, w) == hf_smart_resize(h, w)

    def test_patch_layout_matches_hf(self):
        from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
            Qwen2VLImageProcessor,
        )
        from tstar_tpu.models.qwen2vl import Qwen2VLVisionConfig

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (56, 84, 3), np.uint8)
        proc = Qwen2VLImageProcessor(do_resize=False)
        hf_out = proc(images=[img], return_tensors="np")
        want = hf_out["pixel_values"]
        grid = hf_out["image_grid_thw"][0]

        cfg = Qwen2VLVisionConfig()
        got, (gh, gw) = preprocess_image(img, cfg, target_hw=(56, 84))
        assert (grid[1], grid[2]) == (gh, gw)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_chat_prompt_structure(self, qwen_vocab_dir):
        tok = QwenTokenizer(
            str(qwen_vocab_dir / "vocab.json"), str(qwen_vocab_dir / "merges.txt")
        )
        ids = build_chat_prompt(tok, "the <image> and <image> tv", 2, 3)
        assert ids.count(151655) == 6          # 2 images x 3 merged tokens
        assert ids.count(151652) == 2          # vision_start per image
        decoded = tok.decode(ids, skip_special=False)
        assert decoded.startswith("<|im_start|>system")
        assert decoded.rstrip().endswith("<|im_start|>assistant")

"""load_owlvit_checkpoint end-to-end from a real on-disk HF directory."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
pytest.importorskip("safetensors")


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("owlvit_ckpt")
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
    from safetensors.torch import save_file

    save_file(
        {k: v.contiguous() for k, v in model.state_dict().items()},
        str(d / "model.safetensors"),
    )
    (d / "config.json").write_text(hf_cfg.to_json_string())

    # CLIP-style vocab files (what real checkpoints ship)
    chars = list("abcdefghijklmnopqrstuvwxyz ")
    vocab = {}
    for ch in chars:
        vocab.setdefault(ch, len(vocab))
        vocab.setdefault(ch + "</w>", len(vocab))
    merges = [("c", "o"), ("co", "u"), ("cou", "c"), ("couc", "h</w>")]
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n"
    )
    return str(d), model


class TestLoadOwlVitCheckpoint:
    def test_loads_and_matches_torch(self, checkpoint_dir):
        path, torch_model = checkpoint_dir
        from tstar_tpu.models.loader import load_owlvit_checkpoint
        from tstar_tpu.models.owlvit import OwlViTDetector

        model, variables, tokenizer = load_owlvit_checkpoint(path, dtype=jnp.float32)
        assert model.cfg.vision.image_size == 64
        ids, mask = tokenizer.encode_batch(["couch"])
        rng = np.random.default_rng(0)
        px = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
        logits, boxes = model.apply(
            variables, jnp.asarray(px), jnp.asarray(ids), jnp.asarray(mask)
        )
        with torch.no_grad():
            out = torch_model(
                input_ids=torch.tensor(ids.astype(np.int64)),
                pixel_values=torch.tensor(px).permute(0, 3, 1, 2),
                attention_mask=torch.tensor(mask.astype(np.int64)),
            )
        np.testing.assert_allclose(
            np.asarray(logits), out.logits.numpy(), rtol=3e-4, atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(boxes), out.pred_boxes.numpy(), rtol=3e-4, atol=3e-4
        )

    def test_heuristic_from_checkpoint_dir(self, checkpoint_dir):
        path, _ = checkpoint_dir
        from tstar_tpu.framework.heuristics import initialize_heuristic
        from tstar_tpu.utils.config import SearchConfig

        h = initialize_heuristic("owl-vit", checkpoint_dir=path)
        assert h.name == "owl-vit"
        rng = np.random.default_rng(1)
        cache = jnp.asarray(rng.integers(0, 256, (128, 32, 64, 3), dtype=np.uint8))
        scorer = h.build_scorer(cache, ["couch"], [], SearchConfig())
        conf, presence = scorer.score_grid(jnp.arange(16, dtype=jnp.int32))
        assert conf.shape == (16,)
        assert bool(jnp.isfinite(conf).all())

"""Checkpoint readiness at PRODUCTION scale, fully offline (VERDICT r2 item 4).

Zero egress blocks the real released weights, so these tests fabricate
shape-faithful fakes — the exact tensor names and full production shapes of

  * ``google/owlvit-base-patch32`` (the reference's default heuristic,
    TStarFramework.py:175-179): a real HF directory layout built from
    ``transformers.OwlViTForObjectDetection`` at its DEFAULT config (the
    defaults ARE base-patch32);
  * ``yolo_world_v2_xl_obj365v1_goldg_cc3mlite_pretrain-5daf1395.pth``
    (install.sh:23, wired at TStarFramework.py:181-185): the mmyolo
    state_dict layout emitted by the torch replica of the mmyolo module
    graph (tests/test_yolo_loader.py) instantiated at the XL config, with a
    real CLIP-base text tower (CLIPTextConfig defaults);
  * ``Qwen/Qwen2-VL-2B-Instruct`` (interface_grounding.py:52-64): a sharded
    safetensors directory in the RELEASED key layout ("visual.*" +
    "model.*", tied embeddings so no lm_head — current transformers emits
    "model.visual.*"/"model.language_model.*", which real checkpoint files
    do not use).

Each test runs the full production path: loader entry -> converter ->
shape validation -> ONE forward at production dimensions.  After these, the
first real checkpoint load exercises no new code.
"""

import dataclasses
import json
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
pytest.importorskip("safetensors")

# These tests allocate multi-GB weight sets and large XLA CPU executables.
# Running them in the same interpreter as the rest of the suite is what
# crashed full-suite runs: first (r3 early) with them collected FIRST
# (renamed test_zz_* so they run last), then (r3 late) XLA's CPU compiler
# still segfaulted DURING the final 2B-param test under the suite's
# accumulated allocator pressure — with every test green up to that point.
# So each test here re-invokes itself in a FRESH interpreter: the heavy
# load+forward runs with a clean heap regardless of suite history, and the
# parent just checks the child's exit status.


_SUBPROC_ENV = "TSTAR_CKPT_READINESS_SUBPROC"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _isolate(request) -> bool:
    """True -> the caller should return (the body ran in a subprocess)."""
    if os.environ.get(_SUBPROC_ENV) == "1":
        return False  # we ARE the isolated child: run the body
    nodeid = request.node.nodeid
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-x", nodeid],
        cwd=_REPO,
        env={**os.environ, _SUBPROC_ENV: "1"},
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, (
        f"isolated run of {nodeid} failed (rc={proc.returncode}):\n"
        f"{proc.stdout[-4000:]}\n{proc.stderr[-2000:]}"
    )
    return True


@pytest.fixture(autouse=True)
def _release_memory():
    yield
    import gc

    jax.clear_caches()
    gc.collect()


def _write_clip_vocab(d):
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


class TestOwlVitBasePatch32:
    def test_full_size_load_and_forward(self, tmp_path, request):
        """HF owlvit-base-patch32 directory -> loader -> 768^2 forward."""
        if _isolate(request):
            return
        from safetensors.torch import save_file

        from tstar_tpu.models.loader import load_owlvit_checkpoint
        from tstar_tpu.models.owlvit import OwlViTDetector, postprocess_detections

        hf_cfg = transformers.OwlViTConfig()  # defaults == base-patch32
        assert hf_cfg.vision_config.image_size == 768
        assert hf_cfg.vision_config.patch_size == 32
        assert hf_cfg.text_config.vocab_size == 49408
        torch.manual_seed(0)
        tm = transformers.OwlViTForObjectDetection(hf_cfg)
        save_file(
            {k: v.contiguous() for k, v in tm.state_dict().items()},
            str(tmp_path / "model.safetensors"),
        )
        (tmp_path / "config.json").write_text(hf_cfg.to_json_string())
        _write_clip_vocab(tmp_path)
        del tm

        model, variables, tok = load_owlvit_checkpoint(
            str(tmp_path), dtype=jnp.float32
        )
        n_params = sum(
            int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables)
        )
        assert n_params > 100_000_000  # full-size, not a tiny stand-in

        ids, mask = tok.encode_batch(["a photo of a couch", " "])
        query_embeds = model.apply(
            variables, jnp.asarray(ids), jnp.asarray(mask),
            method=OwlViTDetector.encode_text,
        )
        pixels = jnp.asarray(
            np.random.default_rng(0).random((1, 768, 768, 3), np.float32)
        )
        feats = model.apply(
            variables, pixels, method=OwlViTDetector.encode_image
        )
        logits, boxes = model.apply(
            variables, feats, query_embeds, None, method=OwlViTDetector.predict
        )
        assert logits.shape == (1, 576, 2)  # (768/32)^2 patches, 2 queries
        assert boxes.shape == (1, 576, 4)
        scores, classes, bxs = postprocess_detections(
            logits, boxes, (768, 768)
        )
        assert bool(jnp.isfinite(scores).all())


class TestYoloWorldV2XL:
    def test_full_size_pth_load_and_forward(self, tmp_path, request):
        """mmyolo v2-XL .pth (real tensor names/shapes) -> converter ->
        eval_shape validation -> 640^2 forward."""
        if _isolate(request):
            return
        from tests.test_yolo_loader import _build_replica

        from tstar_tpu.models.yolo_loader import load_yolo_world_checkpoint
        from tstar_tpu.models.yoloworld import YoloTextEncoder, yoloworld_xl

        text_cfg = transformers.CLIPTextConfig()  # defaults == CLIP-base text
        assert text_cfg.vocab_size == 49408 and text_cfg.hidden_size == 512
        torch.manual_seed(0)
        text_model = transformers.CLIPTextModelWithProjection(text_cfg).eval()
        cfg = yoloworld_xl()
        top = _build_replica(cfg, text_model)
        top.eval()
        ckpt_name = (
            "yolo_world_v2_xl_obj365v1_goldg_cc3mlite_pretrain-5daf1395.pth"
        )
        torch.save({"state_dict": top.state_dict()}, str(tmp_path / ckpt_name))
        _write_clip_vocab(tmp_path)
        del top, text_model

        model, variables, text_enc, text_vars, tok = (
            load_yolo_world_checkpoint(str(tmp_path), size="xl",
                                       dtype=jnp.float32)
        )
        n_params = sum(
            int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables)
        )
        assert n_params > 60_000_000  # XL image side (~73M, BN folded)
        n_text = sum(
            int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(text_vars)
        )
        assert n_text > 60_000_000  # CLIP-base text tower (~63M)

        ids, mask = tok.encode_batch(["couch", "tv", " "])
        embeds = text_enc.apply(
            text_vars, jnp.asarray(ids), jnp.asarray(mask)
        )
        assert embeds.shape == (3, cfg.text_dim)
        size = cfg.image_size
        pixels = jnp.asarray(
            np.random.default_rng(1).random((1, size, size, 3), np.float32)
        )
        logits, boxes = model.apply(variables, pixels, embeds)
        anchors = sum((size // s) ** 2 for s in cfg.strides)
        assert logits.shape == (1, anchors, 3)
        assert boxes.shape == (1, anchors, 4)
        assert bool(jnp.isfinite(logits).all())
        assert bool(jnp.isfinite(boxes).all())


class TestQwen2VL2B:
    def test_full_size_sharded_load_and_forward(self, tmp_path, request):
        """Qwen2-VL-2B-config sharded safetensors dir, RELEASED key layout
        (visual.* / model.*, tied embeddings) -> loader -> multimodal
        prefill forward."""
        if _isolate(request):
            return
        from safetensors.torch import save_file

        from tstar_tpu.models.loader import load_qwen2vl_checkpoint
        from tstar_tpu.models.qwen2vl import build_mrope_position_ids

        cfg = transformers.Qwen2VLConfig(
            text_config=dict(
                vocab_size=151936, hidden_size=1536, num_hidden_layers=28,
                num_attention_heads=12, num_key_value_heads=2,
                intermediate_size=8960, rope_theta=1e6,
                rope_scaling={"type": "mrope", "mrope_section": [16, 24, 24]},
                max_position_embeddings=32768, tie_word_embeddings=True,
            ),
            vision_config=dict(
                depth=32, embed_dim=1280, num_heads=16, mlp_ratio=4.0,
                patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
                in_chans=3, hidden_size=1536,
            ),
            image_token_id=151655, video_token_id=151656,
            vision_start_token_id=151652, vision_end_token_id=151653,
        )
        torch.manual_seed(0)
        tm = transformers.Qwen2VLForConditionalGeneration(cfg).eval()
        sd = tm.state_dict()
        del tm

        # Rewrite to the RELEASED checkpoint layout: the hub files carry
        # "visual.*" and "model.*" (and, with tied embeddings, no lm_head);
        # current transformers emits "model.visual.*"/"model.language_model.*".
        released = {}
        for k, v in sd.items():
            if k == "lm_head.weight":
                continue  # 2B ties embeddings; released files omit lm_head
            if k.startswith("model.visual."):
                k = k[len("model."):]
            elif k.startswith("model.language_model."):
                k = "model." + k[len("model.language_model."):]
            released[k] = v.contiguous()
        del sd
        assert any(k.startswith("visual.") for k in released)
        assert any(k.startswith("model.layers.") for k in released)

        # Two shards + index, like the hub release.
        keys = sorted(released)
        half = len(keys) // 2
        shards = {
            "model-00001-of-00002.safetensors": keys[:half],
            "model-00002-of-00002.safetensors": keys[half:],
        }
        weight_map = {}
        for shard, ks in shards.items():
            save_file({k: released[k] for k in ks}, str(tmp_path / shard))
            weight_map.update({k: shard for k in ks})
        (tmp_path / "model.safetensors.index.json").write_text(
            json.dumps({"weight_map": weight_map})
        )
        del released

        cfg_json = json.loads(cfg.to_json_string())
        (tmp_path / "config.json").write_text(json.dumps(cfg_json))
        from tstar_tpu.models.qwen_tokenizer import _bytes_to_unicode

        b2u = _bytes_to_unicode()
        vocab = {b2u[b]: i for i, b in enumerate(range(256))}
        (tmp_path / "vocab.json").write_text(json.dumps(vocab))
        (tmp_path / "merges.txt").write_text("#version: 0.2\n")

        model, variables, tok = load_qwen2vl_checkpoint(
            str(tmp_path), dtype=jnp.float32
        )
        assert model.cfg.text.num_layers == 28
        assert model.cfg.text.tie_word_embeddings
        n_params = sum(
            int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables)
        )
        assert n_params > 2_000_000_000  # the full 2B

        # Multimodal prefill at real patch dims: one 28x28 image ->
        # grid (1, 2, 2) = 4 patches -> 1 merged image token.
        rng = np.random.default_rng(0)
        patches = jnp.asarray(
            rng.standard_normal((1, 4, 3 * 2 * 14 * 14)).astype(np.float32)
        )
        ids = np.array([[10, 151652, 151655, 151653, 20, 30]])
        pos = build_mrope_position_ids(
            ids[0], 151655, [(1, 2, 2)], model.cfg.vision.spatial_merge_size
        )[:, None]
        logits = model.apply(
            variables, jnp.asarray(ids), jnp.asarray(pos), None,
            patches, (2, 2),
        )
        assert logits.shape == (1, 6, 151936)
        assert bool(jnp.isfinite(logits).all())

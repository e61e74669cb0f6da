"""Real-checkpoint integration gate (VERDICT r3 item 5).

Zero egress keeps real released weights off this machine, so the hermetic
suite proves checkpoint *readiness* with fabricated weight sets
(``test_zz_checkpoint_readiness.py``).  This module closes the remaining
gap: an AUTO-DISCOVERING gate keyed on ``TSTAR_CKPT_ROOT`` that — the day
real weights land on disk — runs the full real-weights validation matrix
with ZERO new code:

  * HF-transformers-vs-Flax numerical parity at REAL dims for every
    discovered OWL-ViT/OWLv2, Qwen2-VL, and LLaVA-OneVision directory
    (the tiny-dim harnesses in test_owlvit.py / test_vlm_generate.py
    generalized to from_pretrained on the discovered dir);
  * YOLO-World ``.pth`` conversion plus a detections comparison against the
    torch replica of the mmyolo graph loaded with the SAME real weights
    (closes VERDICT r3 "Missing #2" as far as offline allows);
  * the LV-Haystack local-JSON eval through the dataset CLI with a real
    detector;
  * the verification-fidelity A/B (``scripts/verify_ab.py``) with real
    weights, recording the cache-vs-reference-resolution drift;
  * the throughput-knob recall A/B (``scripts/ab_knob_recall.py
    --checkpoint_dir``) at native geometry — verify@512/384, int8, w8a16
    keyframe/recall deltas vs bf16 (r5).

Without ``TSTAR_CKPT_ROOT`` everything here skips green — except the two
self-tests at the bottom, which fabricate a tiny-but-real HF checkpoint
directory and drive the SAME discovery + parity code end-to-end, so the
gate itself is exercised by the hermetic suite.

Usage once weights exist (see README "Real checkpoints"):

    TSTAR_CKPT_ROOT=/ckpts python -m pytest tests/test_real_checkpoints.py -v

Expected layout under the root (nesting up to 2 levels):
    owlvit-base-patch32/          HF dir (config.json model_type owlvit|owlv2)
    qwen2-vl-2b-instruct/         HF dir (model_type qwen2_vl / qwen2_5_vl)
    llava-onevision-qwen2-.../    HF dir (model_type llava_onevision)
    yolo_world_v2_xl_*.pth        mmyolo checkpoint (CLIP vocab.json/merges.txt
                                  in the same directory)
    lv_haystack/metadata.json     local-JSON dataset + videos under
    lv_haystack/videos/           the video_root referenced by the JSON
VLM checkpoints whose weight files exceed ~6 GB additionally require
``TSTAR_CKPT_HEAVY=1`` (a 7B f32 load needs ~60 GB host RAM).
"""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT_ROOT = os.environ.get("TSTAR_CKPT_ROOT", "")
HEAVY_BYTES = 6 * 1024**3


# ---------------------------------------------------------------------------
# discovery
# ---------------------------------------------------------------------------


def _model_type(d: str) -> str:
    cfg = os.path.join(d, "config.json")
    if not os.path.isfile(cfg):
        return ""
    try:
        with open(cfg) as f:
            return json.load(f).get("model_type", "")
    except (OSError, ValueError):
        return ""


def discover(root: str) -> dict:
    """Classify everything under ``root`` (depth <= 2) by checkpoint kind."""
    found = {"owlvit": [], "qwen": [], "llava": [], "yolo": [], "dataset": []}
    if not root or not os.path.isdir(root):
        return found
    dirs = [root] + sorted(
        p for pat in ("*", "*/*")
        for p in glob.glob(os.path.join(root, pat)) if os.path.isdir(p)
    )
    for d in dirs:
        mt = _model_type(d)
        if mt in ("owlvit", "owlv2"):
            found["owlvit"].append(d)
        elif mt.startswith("qwen2"):
            found["qwen"].append(d)
        elif mt.startswith("llava_onevision"):
            found["llava"].append(d)
        meta = os.path.join(d, "metadata.json")
        if os.path.isfile(meta) and os.path.isdir(os.path.join(d, "videos")):
            found["dataset"].append(d)
    for pat in ("*.pth", "*/*.pth"):
        found["yolo"].extend(sorted(glob.glob(os.path.join(root, pat))))
    return found


FOUND = discover(CKPT_ROOT)


def _weight_bytes(d: str) -> int:
    return sum(
        os.path.getsize(p)
        for pat in ("*.safetensors", "*.bin")
        for p in glob.glob(os.path.join(d, pat))
    )


def _params(kind: str):
    """pytest.param list for a checkpoint kind; one green skip when empty."""
    if FOUND[kind]:
        return [pytest.param(p, id=os.path.basename(p.rstrip("/")))
                for p in FOUND[kind]]
    reason = (
        f"no {kind} checkpoint under TSTAR_CKPT_ROOT={CKPT_ROOT!r} "
        "(set TSTAR_CKPT_ROOT to a directory of real weights to activate "
        "the real-checkpoint gate)"
    )
    return [pytest.param(None, id="none", marks=pytest.mark.skip(reason=reason))]


# ---------------------------------------------------------------------------
# parity drivers (plain functions so the fabricated-checkpoint self-test and
# the gated tests run the SAME code)
# ---------------------------------------------------------------------------


def run_owlvit_parity(ckpt_dir: str, atol: float = 5e-3) -> float:
    """HF torch vs Flax at the checkpoint's REAL dims.  Returns the max
    absolute post-sigmoid score deviation (the quantity the search
    consumes, interface_heuristic.py:243-247)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from tstar_tpu.models.loader import load_owlvit_checkpoint
    from tstar_tpu.models.owlvit import OwlViTDetector

    cls = (
        transformers.Owlv2ForObjectDetection
        if _model_type(ckpt_dir) == "owlv2"
        else transformers.OwlViTForObjectDetection
    )
    tm = cls.from_pretrained(ckpt_dir, local_files_only=True).eval()
    model, variables, tok = load_owlvit_checkpoint(ckpt_dir, dtype=jnp.float32)
    size = model.cfg.vision.image_size

    ids, mask = tok.encode_batch(["a photo of a couch", "a photo of a tv"])
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, size, size, 3)).astype(np.float32)

    with torch.no_grad():
        out = tm(
            input_ids=torch.tensor(np.asarray(ids, np.int64)),
            pixel_values=torch.tensor(pixels).permute(0, 3, 1, 2),
            attention_mask=torch.tensor(np.asarray(mask, np.int64)),
        )
    got_logits, got_boxes = model.apply(
        variables, jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask),
    )
    want_s = 1.0 / (1.0 + np.exp(-out.logits.numpy()))
    got_s = np.asarray(jax.nn.sigmoid(got_logits))
    np.testing.assert_allclose(got_s, want_s, atol=atol)
    np.testing.assert_allclose(
        np.asarray(got_boxes), out.pred_boxes.numpy(), atol=atol
    )
    return float(np.max(np.abs(got_s - want_s)))


def run_vlm_greedy_parity(ckpt_dir: str, kind: str, max_new_tokens: int = 4):
    """HF greedy generate vs ours, token for token, text-only prompt."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from tstar_tpu.models.generate import generate
    from tstar_tpu.models.loader import load_vlm_checkpoint
    from tstar_tpu.models.qwen2vl import build_mrope_position_ids

    mt = _model_type(ckpt_dir)
    cls_by_type = {
        "qwen2_vl": "Qwen2VLForConditionalGeneration",
        "qwen2_5_vl": "Qwen2_5_VLForConditionalGeneration",
        "llava_onevision": "LlavaOnevisionForConditionalGeneration",
    }
    cls = getattr(transformers, cls_by_type.get(mt, ""), None)
    if cls is None:
        cls = transformers.AutoModelForImageTextToText
    tm = cls.from_pretrained(
        ckpt_dir, torch_dtype=torch.float32, local_files_only=True
    ).eval()
    model, params, tok = load_vlm_checkpoint(ckpt_dir, dtype=jnp.float32)

    ids = np.asarray([tok.encode("Describe the couch in the scene.")], np.int64)
    eos = getattr(tm.generation_config, "eos_token_id", None) or 0
    eos_list = eos if isinstance(eos, list) else [eos]
    with torch.no_grad():
        want = tm.generate(
            input_ids=torch.tensor(ids), max_new_tokens=max_new_tokens,
            do_sample=False, eos_token_id=eos_list, pad_token_id=0,
        ).numpy()[0, ids.shape[1]:]
    merge = getattr(model.cfg.vision, "spatial_merge_size", 2)
    pos = build_mrope_position_ids(
        ids[0], model.cfg.image_token_id, [], merge
    )[:, None]
    got = np.asarray(generate(
        model, params, ids, np.array([ids.shape[1]]), pos,
        max_new_tokens=max_new_tokens, eos_token_ids=eos_list,
        temperature=0.0, cache_dtype=jnp.float32,
    ))[0]
    n = min(len(want), len(got))
    assert n > 0
    np.testing.assert_array_equal(got[:n], want[:n])


def run_yolo_conversion(pth_path: str):
    """Convert the real .pth and compare detections against the torch
    replica loaded with the SAME weights (independent graph transcription:
    agreement here means the converter and the replica both read mmyolo the
    same way on REAL tensors, not just on random ones)."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")

    from tstar_tpu.models.yolo_loader import load_yolo_world_checkpoint

    name = os.path.basename(pth_path)
    size = "small" if "_s_" in name else "xl"   # reference ships XL only
    ckpt_dir = os.path.dirname(pth_path)
    model, variables, text_enc, text_vars, tok = load_yolo_world_checkpoint(
        ckpt_dir, size=size, dtype=jnp.float32
    )

    ids, mask = tok.encode_batch(["couch", "tv", " "])
    embeds = text_enc.apply(text_vars, jnp.asarray(ids), jnp.asarray(mask))
    img = model.cfg.image_size
    rng = np.random.default_rng(0)
    pixels = rng.random((1, img, img, 3)).astype(np.float32)
    logits, boxes = model.apply(variables, jnp.asarray(pixels), embeds)
    assert bool(jnp.isfinite(logits).all()) and bool(jnp.isfinite(boxes).all())

    # Detections comparison vs the torch replica carrying the SAME real
    # weights — the first check of the mmyolo-graph transcription against
    # real tensors rather than a shared random fixture.
    from tests.test_yolo_loader import _build_replica, _replica_forward
    import transformers

    sd = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = sd.get("state_dict", sd)
    text_model = transformers.CLIPTextModelWithProjection(
        transformers.CLIPTextConfig()
    )
    replica = _build_replica(model.cfg, text_model)
    missing, unexpected = replica.load_state_dict(sd, strict=False)
    assert not missing, f"replica missing keys from real .pth: {missing[:10]}"
    replica.eval()
    with torch.no_grad():
        t_logits, t_boxes = _replica_forward(
            replica, model.cfg,
            torch.tensor(pixels).permute(0, 3, 1, 2),
            torch.tensor(np.asarray(embeds)),
        )
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(logits)),
        torch.sigmoid(t_logits).numpy(), atol=5e-3,
    )
    np.testing.assert_allclose(np.asarray(boxes), t_boxes.numpy(), rtol=1e-3,
                               atol=0.5)


# ---------------------------------------------------------------------------
# the gated tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ckpt_dir", _params("owlvit"))
def test_owlvit_real_weights_parity(ckpt_dir):
    drift = run_owlvit_parity(ckpt_dir)
    print(f"\n{os.path.basename(ckpt_dir)}: max score deviation {drift:.2e}")


@pytest.mark.parametrize("ckpt_dir", _params("qwen"))
def test_qwen_real_weights_greedy_parity(ckpt_dir):
    if _weight_bytes(ckpt_dir) > HEAVY_BYTES and not os.environ.get(
        "TSTAR_CKPT_HEAVY"
    ):
        pytest.skip("heavy checkpoint: set TSTAR_CKPT_HEAVY=1 to load it")
    run_vlm_greedy_parity(ckpt_dir, "qwen")


@pytest.mark.parametrize("ckpt_dir", _params("llava"))
def test_llava_real_weights_greedy_parity(ckpt_dir):
    if _weight_bytes(ckpt_dir) > HEAVY_BYTES and not os.environ.get(
        "TSTAR_CKPT_HEAVY"
    ):
        pytest.skip("heavy checkpoint: set TSTAR_CKPT_HEAVY=1 to load it")
    run_vlm_greedy_parity(ckpt_dir, "llava")


@pytest.mark.parametrize("pth_path", _params("yolo"))
def test_yolo_real_pth_conversion_and_detections(pth_path):
    run_yolo_conversion(pth_path)


@pytest.mark.parametrize("data_dir", _params("dataset"))
def test_lv_haystack_local_eval_with_real_detector(data_dir):
    if not FOUND["owlvit"]:
        pytest.skip("needs an owlvit checkpoint dir alongside the dataset")
    out_dir = os.path.join(data_dir, "gate_results")
    proc = subprocess.run(
        [sys.executable, "-m", "tstar_tpu.cli.dataset",
         "--local_json", os.path.join(data_dir, "metadata.json"),
         "--video_root", os.path.join(data_dir, "videos"),
         "--grounder", "fake", "--heuristic", "owl-vit",
         "--checkpoint_dir", FOUND["owlvit"][0],
         "--output_dir", out_dir, "--output_json_name", "gate.json",
         "--max_items", "2"],
        cwd=REPO, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    with open(os.path.join(out_dir, "owl-vit_gate.json")) as f:
        rows = json.load(f)
    assert rows and all("keyframe_timestamps" in r for r in rows)


@pytest.mark.parametrize("ckpt_dir", _params("owlvit"))
def test_knob_recall_ab_with_real_weights(ckpt_dir):
    """Runs the throughput-knob recall A/B (scripts/ab_knob_recall.py) at
    the checkpoint's NATIVE geometry — verify@512/384, int8, w8a16 — and
    records the keyframe-overlap / recall deltas vs the bf16 default.
    Completes the r5 hermetic A/B (PERFORMANCE.md "Knob recall A/B") with
    real weights the day they land."""
    proc = subprocess.run(
        [sys.executable, "scripts/ab_knob_recall.py",
         "--checkpoint_dir", ckpt_dir, "--scenes", "2", "--seeds", "2"],
        cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    json_lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert json_lines, proc.stdout[-2000:]
    report = json.loads(json_lines[-1])
    assert report["weights"] == "real"
    assert set(report["knobs"]) >= {"bf16", "verify512", "verify384",
                                    "int8", "w8a16"}
    for knob, e in report["knobs"].items():
        assert "recall_delta_vs_bf16" in e
        if knob != "bf16":
            assert "keyframe_overlap_vs_bf16" in e
    print("\nknob recall deltas (real weights): " + ", ".join(
        f"{k}: Δrecall {e['recall_delta_vs_bf16']:+.3f}, overlap "
        f"{e.get('keyframe_overlap_vs_bf16', 1.0):.3f}"
        for k, e in report["knobs"].items() if k != "bf16"
    ))


@pytest.mark.parametrize("ckpt_dir", _params("owlvit"))
def test_verify_ab_drift_with_real_weights(ckpt_dir):
    proc = subprocess.run(
        [sys.executable, "scripts/verify_ab.py",
         "--checkpoint_dir", ckpt_dir, "--videos", "2"],
        cwd=REPO, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    report = json.loads(proc.stdout[proc.stdout.index("{"):])
    assert report["weights"] == "real"
    assert report["videos"] == 2
    print(f"\nverify_ab drift: {report['removal_agreement']} removal "
          f"agreement, keyframe overlap {report['mean_keyframe_overlap']}")


# ---------------------------------------------------------------------------
# hermetic self-tests: the gate's own code paths must run WITHOUT real
# weights, so discovery or parity regressions surface now, not on
# weights-day.
# ---------------------------------------------------------------------------


def test_gate_discovery_classification(tmp_path):
    (tmp_path / "owlvit-base-patch32").mkdir()
    (tmp_path / "owlvit-base-patch32" / "config.json").write_text(
        json.dumps({"model_type": "owlvit"})
    )
    (tmp_path / "nested").mkdir()
    (tmp_path / "nested" / "qwen2-vl").mkdir()
    (tmp_path / "nested" / "qwen2-vl" / "config.json").write_text(
        json.dumps({"model_type": "qwen2_vl"})
    )
    (tmp_path / "yolo_world_v2_xl_pretrain.pth").write_bytes(b"")
    ds = tmp_path / "lv_haystack"
    (ds / "videos").mkdir(parents=True)
    (ds / "metadata.json").write_text("[]")
    found = discover(str(tmp_path))
    assert [os.path.basename(p) for p in found["owlvit"]] == [
        "owlvit-base-patch32"
    ]
    assert [os.path.basename(p) for p in found["qwen"]] == ["qwen2-vl"]
    assert len(found["yolo"]) == 1 and found["yolo"][0].endswith(".pth")
    assert [os.path.basename(p) for p in found["dataset"]] == ["lv_haystack"]
    assert discover("") == {k: [] for k in found}


def test_gate_parity_path_on_fabricated_checkpoint(tmp_path):
    """Drives run_owlvit_parity end-to-end on a fabricated tiny HF
    checkpoint directory — the exact code the real-weights day runs."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    pytest.importorskip("safetensors")
    from safetensors.torch import save_file

    from tests.test_zz_checkpoint_readiness import _write_clip_vocab

    hf_cfg = transformers.OwlViTConfig(
        text_config=dict(
            vocab_size=49408, hidden_size=24, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=48,
            max_position_embeddings=16,
        ),
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, patch_size=16, image_size=64,
        ),
        projection_dim=24,
    )
    torch.manual_seed(0)
    tm = transformers.OwlViTForObjectDetection(hf_cfg).eval()
    save_file(
        {k: v.contiguous() for k, v in tm.state_dict().items()},
        str(tmp_path / "model.safetensors"),
    )
    (tmp_path / "config.json").write_text(hf_cfg.to_json_string())
    _write_clip_vocab(tmp_path)

    drift = run_owlvit_parity(str(tmp_path), atol=5e-4)
    assert drift < 5e-4


def test_gate_knob_ab_path_on_fabricated_checkpoint(tmp_path):
    """Drives scripts/ab_knob_recall.py --checkpoint_dir end-to-end on a
    fabricated tiny HF checkpoint — the exact invocation
    test_knob_recall_ab_with_real_weights makes on weights-day (reduced to
    bf16 vs int8, 1 scene x 1 seed, to keep the hermetic suite fast)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    pytest.importorskip("safetensors")
    pytest.importorskip("cv2")
    from safetensors.torch import save_file

    from tests.test_zz_checkpoint_readiness import _write_clip_vocab

    hf_cfg = transformers.OwlViTConfig(
        text_config=dict(
            vocab_size=49408, hidden_size=24, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=48,
            max_position_embeddings=16,
        ),
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, patch_size=16, image_size=64,
        ),
        projection_dim=24,
    )
    torch.manual_seed(0)
    tm = transformers.OwlViTForObjectDetection(hf_cfg).eval()
    save_file(
        {k: v.contiguous() for k, v in tm.state_dict().items()},
        str(tmp_path / "model.safetensors"),
    )
    (tmp_path / "config.json").write_text(hf_cfg.to_json_string())
    _write_clip_vocab(tmp_path)

    proc = subprocess.run(
        [sys.executable, "scripts/ab_knob_recall.py",
         "--checkpoint_dir", str(tmp_path),
         "--scenes", "1", "--seeds", "1", "--knobs", "bf16,int8"],
        cwd=REPO, capture_output=True, text=True, timeout=1800,
        env={**os.environ, "TSTAR_FORCE_CPU": "1"},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    json_lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert json_lines, proc.stdout[-2000:]
    report = json.loads(json_lines[-1])
    assert report["weights"] == "real"
    assert set(report["knobs"]) == {"bf16", "int8"}
    assert "keyframe_overlap_vs_bf16" in report["knobs"]["int8"]

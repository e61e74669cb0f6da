"""One measured SYSTEM run of the full 3-stage pipeline on the attached chip.

The rebuilt ``eval_LV_Haystack.sh`` executed end-to-end as one process
(reference pipeline: ``eval_LV_Haystack.sh:24-59`` — search -> keyframe
metrics -> QA) with a REAL JAX VLM doing QA on device:

  1. synthesize a tiny local dataset (planted objects = ground truth);
  2. batched T* search with full-size OWL-ViT (random weights) on the chip;
  3. keyframe metrics (temporal PRF / SSIM / ANND);
  4. QA over the searched keyframes with a Flax Qwen2-VL running on the
     chip (a tiny random-weight checkpoint built offline, the same
     conversion path a real checkpoint takes — zero-egress environment).

Prints one JSON object with per-stage wall-clock timings.

    python scripts/run_system_tpu.py [--videos 2] [--duration 300]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_tiny_qwen_checkpoint(d: str) -> str:
    """Tiny random Qwen2-VL in real HF checkpoint format (offline)."""
    import torch
    import transformers
    from safetensors.torch import save_file

    cfg = transformers.Qwen2VLConfig(
        text_config=dict(
            vocab_size=151700, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
            rope_theta=10000.0,
            rope_scaling={"type": "mrope", "mrope_section": [2, 2, 4]},
            max_position_embeddings=4096, rms_norm_eps=1e-5,
            tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=2, embed_dim=32, num_heads=2, mlp_ratio=2.0, patch_size=14,
            temporal_patch_size=2, spatial_merge_size=2, in_chans=3,
            hidden_size=64,
        ),
    )
    torch.manual_seed(0)
    model = transformers.Qwen2VLForConditionalGeneration(cfg)
    sd = {k: v.contiguous() for k, v in model.state_dict().items()}
    save_file(sd, os.path.join(d, "model.safetensors"))
    hf_cfg = json.loads(cfg.to_json_string())
    hf_cfg["text_config"]["rope_scaling"] = {
        "type": "mrope", "mrope_section": [2, 2, 4]
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(hf_cfg, f)

    from tstar_tpu.models.qwen_tokenizer import _bytes_to_unicode

    b2u = _bytes_to_unicode()
    vocab = {}
    for b in range(256):
        vocab.setdefault(b2u[b], len(vocab))
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    return d


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--videos", type=int, default=2)
    p.add_argument("--duration", type=float, default=300.0,
                   help="base duration; videos cycle x1/x2/x3 so the batch "
                        "splits into multiple padded-length buckets")
    p.add_argument("--batch_videos", type=int, default=0,
                   help="videos per search batch (0 = all in one batch)")
    p.add_argument("--uniform_duration", action="store_true",
                   help="disable the duration mix (single bucket)")
    p.add_argument("--budget", type=float, default=1.0)
    p.add_argument("--detector_quant", type=str, default=None, choices=["int8", "w8a16"])
    p.add_argument("--verify_image_size", type=int, default=None)
    p.add_argument("--qa_batch", type=int, default=1)
    args = p.parse_args()

    from tstar_tpu.bench.evaluate import (
        compute_qa_accuracy,
        evaluate_search_results,
    )
    from tstar_tpu.bench.runner import run_dataset_batched
    from tstar_tpu.framework.heuristics import initialize_heuristic
    from tstar_tpu.grounding.fake import FakeGrounder
    from tstar_tpu.grounding.universal import UniversalGrounder
    from tstar_tpu.video.synthetic import PlantedObject, write_synthetic_video

    tmp = tempfile.mkdtemp(prefix="tstar_system_")
    timings = {}

    # ---- stage 0: dataset ----
    t0 = time.perf_counter()
    dataset = []
    durations = []
    for i in range(args.videos):
        path = os.path.join(tmp, f"v{i}.mp4")
        dur = args.duration if args.uniform_duration else args.duration * (
            1 + i % 3
        )
        durations.append(dur)
        ev = dur * (0.5 + 0.08 * i / max(1, args.videos))
        fps = 24.0
        write_synthetic_video(
            path, duration_sec=dur, fps=fps, hw=(192, 320),
            objects=[PlantedObject("couch", (ev, ev + 8.0), (200, 40, 40),
                                   (0.5, 0.5), 0.4)],
        )
        dataset.append({
            "video_id": f"v{i}",
            "video_path": path,
            "question": "What is the color of the couch?",
            "options": "A) Red\nB) Blue\nC) Green\nD) White",
            "gt_answer": "A",
            "gt_frame_index": [int(ev * fps) + 24],
        })
    timings["synthesize_s"] = round(time.perf_counter() - t0, 2)

    # ---- stage 1: batched search on the chip (eval_LV_Haystack.sh:24-31) ----
    search_out = os.path.join(tmp, "search_results.json")
    t0 = time.perf_counter()
    search_cfg = None
    if args.detector_quant or args.verify_image_size:
        from tstar_tpu.utils.config import SearchConfig

        search_cfg = SearchConfig(
            detector_quant=args.detector_quant,
            verify_image_size=args.verify_image_size,
        )
    results = run_dataset_batched(
        dataset,
        FakeGrounder(target_objects=["couch"], cue_objects=["tv"]),
        initialize_heuristic("owl-vit-random"),
        search_out,
        batch_videos=args.batch_videos or args.videos,
        search_budget=args.budget,
        confidence_threshold=2.0,     # worst case: full budget, no early exit
        config=search_cfg,
    )
    timings["search_s"] = round(time.perf_counter() - t0, 2)
    timings["videos"] = len(results)

    # bucket accounting (mixed durations -> multiple padded lengths; the
    # prefetch thread decodes+uploads the next bucket behind the search)
    from tstar_tpu.utils.config import SearchConfig as _SC
    from tstar_tpu.video.cache import probe_video_length

    probe_cfg = search_cfg or _SC()
    n_pads = [probe_video_length(d["video_path"], probe_cfg)[1]
              for d in dataset]
    timings["bucket_padded_lengths"] = sorted(set(n_pads))
    timings["buckets"] = len(set(n_pads))
    timings["prefetch"] = True  # search_videos default: decode+upload overlap
    frames_scored = sum(
        r.get("iterations", 0) * probe_cfg.frames_per_iteration
        for r in results
        if isinstance(r.get("iterations"), int)
    )
    # run_dataset_batched rows don't carry iterations; estimate from budget
    if frames_scored == 0:
        frames_scored = sum(
            min(probe_cfg.budget_cap, int(dur * args.budget))
            for dur in durations
        )
    timings["search_frames_scored"] = frames_scored
    timings["search_frames_per_sec"] = round(
        frames_scored / timings["search_s"], 1
    )

    # ---- stage 2: keyframe metrics (eval_LV_Haystack.sh:40-42) ----
    for r, item in zip(results, dataset):
        r.setdefault("gt_frame_index", item["gt_frame_index"])
        r.setdefault("gt_answer", item["gt_answer"])
    t0 = time.perf_counter()
    metrics = evaluate_search_results(results)
    timings["metrics_s"] = round(time.perf_counter() - t0, 2)

    # ---- stage 3: QA with the JAX VLM on the chip (:54-59) ----
    t0 = time.perf_counter()
    ckpt = build_tiny_qwen_checkpoint(tempfile.mkdtemp(prefix="qwen_tiny_"))
    timings["build_vlm_checkpoint_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    grounder = UniversalGrounder(model_name="qwen2-vl-tiny", model_path=ckpt)
    timings["load_vlm_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    accuracy, qa_results = compute_qa_accuracy(
        results, grounder, nframe=8, sampling_type="TStar",
        output_file=os.path.join(tmp, "qa.jsonl"),
        qa_batch=args.qa_batch,
    )
    timings["qa_s"] = round(time.perf_counter() - t0, 2)

    import jax

    print(json.dumps({
        "pipeline": "search -> metrics -> qa (single process, on-chip)",
        "device": str(jax.devices()[0].device_kind),
        "timings": timings,
        "search_metrics": {k: round(float(v), 4) for k, v in metrics.items()},
        "qa_accuracy_tiny_random_vlm": accuracy,
        "qa_items": len(qa_results),
        "artifacts_dir": tmp,
    }, indent=2))


if __name__ == "__main__":
    main()

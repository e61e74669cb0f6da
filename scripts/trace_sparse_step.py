"""Device-trace breakdown of a batched search step (sparse or worst-case).

Answers VERDICT r2 item 1's question: what bounds the sparse regime's
throughput plateau (9.8k f/s at B=8..16)?  Runs `--steps` masked batched
steps at `--batch` videos under `jax.profiler.start_trace` (works through
the axon relay), then aggregates device-side event durations by name and
buckets them into: detector forward, grid build/preprocess, smoother,
sampling/percentile/splat, scatter/state, other.

    python scripts/trace_sparse_step.py --batch 16 --steps 20
    # int8 worst-case step (VERDICT r2 item 6):
    python scripts/trace_sparse_step.py --batch 1 --steps 10 \
        --detector_threshold 0.005 --quant int8
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate_trace(trace_dir):
    """Sum complete ('X') event durations by name on device tracks."""
    files = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
    )
    assert files, f"no trace files under {trace_dir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device pids: process_name metadata containing 'TPU' / 'Device'
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if ("TPU" in name or "Device" in name or "/device:" in name)
        and "Host" not in name
    }
    totals = collections.Counter()
    counts = collections.Counter()
    longname = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0)  # microseconds
        totals[name] += dur
        counts[name] += 1
        args = e.get("args") or {}
        ln = args.get("long_name") or args.get("tf_op") or args.get("hlo_op")
        if ln and name not in longname:
            longname[name] = ln
    return totals, counts, longname, pid_names


BUCKETS = [
    # (bucket, patterns matched against event name + long_name, lowercase)
    ("detector_forward", ["transformer", "encoder", "attention", "qkv",
                          "mlp", "fc1", "fc2", "layers_", "patch", "conv",
                          "dot", "predict", "encode_image", "class_head",
                          "box_head", "layer_norm", "softmax"]),
    ("grid_build", ["build_detector_grid", "resize", "gather_frames",
                    "grid", "bilinear"]),
    ("smoother", ["smooth", "penta", "_sweep", "cyclic", "fit_smoother"]),
    ("sample_splat", ["sample", "percentile", "sort", "top_k", "gumbel",
                      "window_splat", "splat", "cumsum", "argsort"]),
    ("state_scatter", ["scatter", "dynamic-update", "dynamic_update",
                       "select", "while", "cond"]),
]


def bucket_of(name, ln):
    hay = (name + " " + (ln or "")).lower()
    for bucket, pats in BUCKETS:
        if any(p in hay for p in pats):
            return bucket
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--n_valid", type=int, default=1024)
    ap.add_argument("--detector_threshold", type=float, default=10.0,
                    help="10.0 = sparse regime (verify never fires); 0.005 "
                         "= reference default (worst case w/ random weights)")
    ap.add_argument("--quant", default=None, choices=[None, "int8"])
    ap.add_argument("--verify_image_size", type=int, default=None)
    ap.add_argument("--trace_dir", default="/tmp/sparse_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tstar_tpu.models.clip_tokenizer import HashTokenizer
    from tstar_tpu.models.owlvit import OwlViTDetector, owlvit_base_patch32
    from tstar_tpu.parallel.batched import _batched_step_jit
    from tstar_tpu.search.detector_scorer import OwlVitScorer, make_owlvit_scorer
    from tstar_tpu.search.state import init_state
    from tstar_tpu.utils.config import SearchConfig

    B, n_valid = args.batch, args.n_valid
    cfg = SearchConfig(
        search_budget=1.0, confidence_threshold=2.0,
        detector_threshold=args.detector_threshold,
        detector_quant=args.quant, verify_image_size=args.verify_image_size,
        use_pallas_preprocess=False, verify_batch=4,
    )
    n_pad = cfg.padded_frames(n_valid)

    model_cfg = owlvit_base_patch32()
    model = OwlViTDetector(model_cfg, dtype=jnp.bfloat16)
    size = model_cfg.vision.image_size
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, size, size, 3), jnp.bfloat16),
        jnp.zeros((2, model_cfg.text.max_length), jnp.int32),
    )
    tok = HashTokenizer(vocab_size=model_cfg.text.vocab_size,
                        context=model_cfg.text.max_length)
    rng = np.random.default_rng(0)
    scorers = []
    for _ in range(B):
        c = rng.integers(0, 256, (n_pad, *cfg.cache_hw, 3), dtype=np.uint8)
        c[n_valid:] = 0
        scorers.append(make_owlvit_scorer(
            model, variables, jnp.asarray(c),
            ["target"], ["cue one", "cue two"], tok, cfg,
        ))
    if B == 1:
        # single-video engine path (what bench.py's B=1 numbers measure)
        from tstar_tpu.search.engine import _masked_step_jit

        bsc = scorers[0]
        states = init_state(n_valid, 1, cfg, jax.random.key(10), n_pad=n_pad)
        step = _masked_step_jit
    else:
        bsc = OwlVitScorer(
            cache=jnp.stack([s.cache for s in scorers]),
            variables=variables,
            query_embeds=jnp.stack([s.query_embeds for s in scorers]),
            query_mask=jnp.stack([s.query_mask for s in scorers]),
            class_weights=jnp.stack([s.class_weights for s in scorers]),
            model=model,
            config=cfg,
            gb_awk=scorers[0].gb_awk,
            gb_bias=scorers[0].gb_bias,
            gb_ah=scorers[0].gb_ah,
        )
        states = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[init_state(n_valid, 1, cfg, jax.random.key(10 + i), n_pad=n_pad)
              for i in range(B)],
        )
        step = _batched_step_jit

    # compile + warm
    out = step(states, bsc, cfg)
    np.asarray(out.iteration)  # host fetch fence

    jax.profiler.start_trace(args.trace_dir)
    s = states
    for _ in range(args.steps):
        s = step(s, bsc, cfg)
    np.asarray(s.iteration)  # fence inside the trace window
    jax.profiler.stop_trace()

    totals, counts, longname, pid_names = aggregate_trace(args.trace_dir)
    total_us = sum(totals.values())
    per_step_ms = total_us / args.steps / 1e3
    print(f"\ndevice total: {total_us/1e3:.1f} ms over {args.steps} steps "
          f"(B={B}) -> {per_step_ms:.2f} ms/step device time")
    agg = collections.Counter()
    for name, us in totals.items():
        agg[bucket_of(name, longname.get(name))] += us
    print("\n== bucket breakdown ==")
    for bucket, us in agg.most_common():
        print(f"  {bucket:18s} {us/1e3:9.1f} ms  {100*us/total_us:5.1f}%")
    print(f"\n== top {args.top} events ==")
    for name, us in totals.most_common(args.top):
        ln = longname.get(name, "")
        print(f"  {us/1e3:9.2f} ms  x{counts[name]:<5d} "
              f"[{bucket_of(name, ln)}] {name}  {ln[:110]}")


if __name__ == "__main__":
    main()

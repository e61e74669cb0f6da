"""VLM serving throughput on the attached chip: prefill / decode / batched QA.

Measures the Qwen2-VL generation stack (models/generate.py: jitted prefill +
per-token decode with donated KV caches) at QA-like shapes — N frames of
vision tokens + a short question, 30 generated tokens (the reference's QA
cap) — for batch sizes {1, 4}.  Weights are random at a mid-size config
(~0.4B params): throughput depends on architecture and shapes, not weight
values (zero-egress environment; real checkpoints load through the same
path, models/loader.py).

Prints one JSON object.  Timing fences are host fetches (CLAUDE.md).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--decode_tokens", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tstar_tpu.models.generate import generate
    from tstar_tpu.models.qwen2vl import (
        Qwen2VLConfig,
        Qwen2VLModel,
        Qwen2VLTextConfig,
        Qwen2VLVisionConfig,
        build_mrope_position_ids,
    )

    cfg = Qwen2VLConfig(
        vision=Qwen2VLVisionConfig(
            depth=8, embed_dim=640, num_heads=10, mlp_ratio=4.0, patch_size=14,
            temporal_patch_size=2, spatial_merge_size=2, hidden_size=1024,
        ),
        text=Qwen2VLTextConfig(
            vocab_size=32000, hidden_size=1024, num_layers=16, num_heads=16,
            num_kv_heads=8, intermediate_size=2816, mrope_section=(8, 12, 12),
        ),
        image_token_id=31999,
    )
    model = Qwen2VLModel(cfg, dtype=jnp.bfloat16)

    # one frame = 24x24 patches -> 144 merged tokens (336^2 at patch 14)
    side = 24
    merged = (side // 2) * (side // 2)
    n_frames = args.frames
    patch_dim = cfg.vision.patch_size ** 2 * 3 * cfg.vision.temporal_patch_size
    rng = np.random.default_rng(0)

    img_block = [cfg.image_token_id] * merged
    ids_list = [101, 102, 103]
    grids = []
    for _ in range(n_frames):
        ids_list += img_block
        grids.append((1, side, side))
    ids_list += list(rng.integers(200, 31000, size=24))  # the question
    ids = np.asarray(ids_list, np.int32)[None]
    seq = ids.shape[1]
    pos = build_mrope_position_ids(ids[0], cfg.image_token_id, grids, 2)[:, None]
    patches = jnp.asarray(
        rng.standard_normal((n_frames, side * side, patch_dim)).astype(np.float32)
    ).astype(jnp.bfloat16)

    variables = model.init(
        jax.random.key(0), jnp.asarray(ids), jnp.asarray(pos), None,
        patches, (side, side),
    )

    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(variables)
    )

    report = {
        "model": {
            "params_m": round(n_params / 1e6, 1),
            "text_layers": cfg.text.num_layers,
            "hidden": cfg.text.hidden_size,
        },
        "prompt_tokens": int(seq),
        "vision_tokens": merged * n_frames,
        "decode_tokens": args.decode_tokens,
    }

    def run(batch, new_tokens):
        b_ids = np.repeat(ids, batch, axis=0)
        b_pos = np.repeat(pos, batch, axis=1)
        b_patches = jnp.concatenate([patches] * batch, axis=0)
        out = generate(
            model, variables, b_ids, np.full((batch,), seq, np.int32), b_pos,
            max_new_tokens=new_tokens, eos_token_ids=[0],
            temperature=0.0, image_patches=b_patches, image_grid_hw=(side, side),
        )
        return np.asarray(out)  # host fetch fence

    def best_of(batch, new_tokens, reps=3):
        run(batch, new_tokens)  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run(batch, new_tokens)
            best = min(best, time.perf_counter() - t0)
        return best

    for batch in (1, 4):
        t_full = best_of(batch, args.decode_tokens)
        # vision-encode + prefill alone (1 generated token): the decode rate
        # is computed from the DIFFERENCE, not the whole request
        t_prefill = best_of(batch, 1)
        t_decode = max(t_full - t_prefill, 1e-9)
        report[f"b{batch}"] = {
            "request_s": round(t_full, 3),
            "vision_prefill_s": round(t_prefill, 3),
            "prefill_tokens_per_s": round(batch * seq / t_prefill, 1),
            "decode_tokens_per_s_per_seq": round(
                (args.decode_tokens - 1) / t_decode, 1
            ),
            "qa_items_per_s": round(batch / t_full, 3),
        }

    dev = jax.devices()[0]
    report["device"] = getattr(dev, "device_kind", str(dev))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

"""Roofline the sparse (no-verify) batched search step (VERDICT r4 item 6).

PERFORMANCE.md's r3 dissection proved the sparse step is encoder memory
traffic; this script turns that claim into a NUMBER: from the TPU-compiled
module's scheduled (post-fusion) HLO, sum the HBM bytes each executed
top-level instruction moves (operand reads + output writes — fusion
internals live in VMEM and don't count), derive the bandwidth-attainable
step time and frames/s, and compare against the measured step.

Method notes:
  * POST-fusion by construction: we parse ``compiled.as_text()`` — the
    scheduled module — and count only instructions of executed computations
    (entry + called bodies), never fusion-internal ones.  XLA
    ``cost_analysis()['bytes accessed']`` is PRE-fusion and useless for this
    (documented in PERFORMANCE.md); its FLOPs count is fine and is what we
    use for the compute leg.
  * ``conditional`` branches count the CHEAPER branch: in the sparse regime
    the verification conditional takes its no-op branch every step.
  * ``while`` bodies count once per trip where the trip count is static
    (none in the sparse step's hot path).
  * This is a LOWER bound on real traffic (perfect overlap, no refetch);
    measured/attainable >= 90% means the step is at the bandwidth wall.

Run on the real chip (first compile ~2-4 min):
    python scripts/roofline_sparse.py --batch 8 [--measure]
"""

import argparse
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16, "token": 0, "opaque": 0,
}

# one array shape with optional layout braces, e.g.
# bf16[8,577,768]{2,1,0:T(8,128)(2,1)S(1)} or f32[] or pred[]
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\](\{[^}]*\})?")
# an instruction line: %name = <shape-or-tuple> opcode(...)
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\(?.*?\)?)\s+([\w\-]+)\((.*)$"
)


def _one_shape_bytes(dtype: str, dims: str) -> int:
    if dtype not in DTYPE_BYTES:
        return 0
    n = 1
    if dims:
        for d in dims.split(","):
            n *= int(d)
    return n * DTYPE_BYTES[dtype]


def shape_bytes(shape_text: str) -> int:
    """Total bytes of a shape string (array or tuple), any memory space."""
    return sum(
        _one_shape_bytes(dtype, dims)
        for dtype, dims, _ in _SHAPE_RE.findall(shape_text)
    )


def shape_hbm_bytes(shape_text: str) -> int:
    """Bytes of the HBM-resident parts only: scheduled TPU HLO annotates
    scratch-space buffers with S(k) in the layout (S(1)=VMEM, S(2)=SMEM/
    semaphores); buffers without an S() annotation live in the default
    space — HBM.  XLA pins many inter-fusion activations in VMEM, and those
    must NOT count as HBM traffic."""
    return sum(
        _one_shape_bytes(dtype, dims)
        for dtype, dims, layout in _SHAPE_RE.findall(shape_text)
        if "S(" not in (layout or "")
    )


def parse_hlo(text: str):
    """-> (computations, fusion_bodies): {comp_name: [instr dicts]} and the
    set of computation names used as fusion bodies (VMEM-internal)."""
    computations = {}
    fusion_bodies = set()
    current = None
    entry = None
    for line in text.splitlines():
        stripped = line.strip()
        header = re.match(r"^(ENTRY\s+)?%?([\w.\-]+)\s*\([^)]*\)\s*->", stripped)
        if header and stripped.endswith("{"):
            current = header.group(2)
            computations[current] = []
            if header.group(1):
                entry = current
            continue
        if stripped == "}":
            current = None
            continue
        if current is None:
            continue
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, shape_text, opcode, rest = m.groups()
        # operands: %references before any attribute list
        args_part = rest.split("),", 1)[0]
        operands = re.findall(r"%([\w.\-]+)", args_part)
        param_index = None
        if opcode == "parameter":
            pm = re.match(r"\s*(\d+)", rest)
            if pm:
                param_index = int(pm.group(1))
        target = None
        if opcode == "custom-call":
            tm = re.search(r'custom_call_target="([^"]+)"', rest)
            if tm:
                target = tm.group(1)
        called = re.findall(r"(?:calls|to_apply)=%?([\w.\-]+)", rest)
        branches = re.findall(
            r"(?:true_computation|false_computation|branch_computations)="
            r"\{?%?([\w.\-,%\s]+)\}?", rest,
        )
        cond_body = re.findall(
            r"(?:condition|body)=%?([\w.\-]+)", rest
        )
        if opcode == "fusion":
            fusion_bodies.update(called)
        computations[current].append(
            {
                "name": name, "shape": shape_text, "opcode": opcode,
                "operands": operands, "param_index": param_index,
                "target": target,
                "called": called, "branches": branches, "cond_body": cond_body,
            }
        )
    return computations, fusion_bodies, entry


# ops that read only SLICES of their first (table) operand, not the whole
# buffer: a fusion parameter used exclusively this way contributes only the
# sliced bytes to HBM traffic (the frame-cache gather is the big case — the
# (B, N_pad, ch, cw, 3) cache is NOT re-read whole every step, only the K
# sampled rows are).
_SLICING_OPS = {"gather", "dynamic-slice"}


def gather_param_reads(body_instrs) -> dict:
    """{param_index: bytes actually read} for body parameters whose EVERY
    use is the table operand of a gather/dynamic-slice."""
    params = {
        ins["name"]: ins["param_index"]
        for ins in body_instrs
        if ins["opcode"] == "parameter" and ins["param_index"] is not None
    }
    uses = {name: [] for name in params}
    for ins in body_instrs:
        for pos, o in enumerate(ins["operands"]):
            if o in uses:
                uses[o].append((ins, pos))
    out = {}
    for name, idx in params.items():
        us = uses[name]
        if us and all(
            ins["opcode"] in _SLICING_OPS and pos == 0 for ins, pos in us
        ):
            out[idx] = sum(shape_bytes(ins["shape"]) for ins, _ in us)
    return out


SKIP_OPS = {
    "parameter", "constant", "tuple", "get-tuple-element", "bitcast",
    "after-all", "add-dependency", "partition-id", "replica-id", "iota",
    # async completion halves (bytes counted at the -start op)
    "copy-done", "all-reduce-done", "all-gather-done", "collective-permute-done",
    "send-done", "recv-done", "fusion-done", "async-done", "async-update",
}
# custom-calls that move no data (markers / bitcast concatenation / index
# packing): the consumer of their output counts the actual read
FREE_CUSTOM_TARGETS = {
    "AssumeGatherIndicesInBound", "ConcatBitcast",
    "GatherScatterIndicesBitpacked", "Sharding",
}


def comp_bytes(comp_name, computations, fusion_bodies, shapes, memo, top=None):
    """HBM bytes of one executed computation (recursing into control flow).

    ``shapes`` maps (comp, instr) -> (total_bytes, hbm_bytes); reads count an
    operand's HBM part (VMEM-pinned producers are free), writes count the
    output's HBM part.  Slicing ops (gather / dynamic-slice / slice — incl.
    the async weight-streaming DMAs) read only the sliced bytes.
    """
    if comp_name in memo:
        return memo[comp_name]
    memo[comp_name] = 0  # cycle guard
    total = 0

    def recurse(c):
        return comp_bytes(c, computations, fusion_bodies, shapes, memo, top)

    for ins in computations.get(comp_name, []):
        op = ins["opcode"]
        if op in SKIP_OPS:
            continue
        if op == "while":
            for c in ins["cond_body"]:
                total += recurse(c)
            continue
        if op == "conditional":
            branch_names = []
            for b in ins["branches"]:
                branch_names += [
                    x.strip().lstrip("%") for x in b.split(",") if x.strip()
                ]
            branch_names += ins["called"]
            if branch_names:
                total += min(recurse(c) for c in branch_names)
            continue
        if op in ("call", "async-start"):
            # async-start wraps one real instruction (e.g. the slice DMAs
            # that stream weight blocks HBM->VMEM); its own output tuple is
            # operand aliases + context, so count only the wrapped body.
            for c in ins["called"]:
                total += recurse(c)
            continue
        if op == "custom-call" and ins.get("target") in FREE_CUSTOM_TARGETS:
            continue
        out_total, out_hbm = shapes.get((comp_name, ins["name"]), (0, 0))
        if op == "copy-start":
            # output tuple = (dest, source-alias, context): HBM parts cover
            # exactly the read (source in HBM) + write (dest in HBM)
            bytes_moved = out_hbm
            total += bytes_moved
            if top is not None and bytes_moved:
                top[f"{comp_name}/{ins['name']}:{op}"] += bytes_moved
            continue
        sliced = {}
        if op == "fusion" and ins["called"]:
            sliced = gather_param_reads(computations.get(ins["called"][0], []))
        elif op in _SLICING_OPS:
            sliced = {0: out_total}
        in_b = 0
        seen = set()
        for i, o in enumerate(ins["operands"]):
            if o in seen:   # aliased repeats (fused q|k|v views) read once
                continue
            seen.add(o)
            full_total, full_hbm = shapes.get((comp_name, o), (0, 0))
            if i in sliced:
                in_b += min(full_hbm, sliced[i])
            else:
                in_b += full_hbm
        total += out_hbm + in_b
        if top is not None and (out_hbm + in_b):
            top[f"{comp_name}/{ins['name']}:{op}"] += out_hbm + in_b
    memo[comp_name] = total
    return total


def module_hbm_bytes(text: str):
    """-> (bytes, top_instructions dict) for one executed module pass."""
    computations, fusion_bodies, entry = parse_hlo(text)
    shapes = {}
    for cname, instrs in computations.items():
        for ins in instrs:
            shapes[(cname, ins["name"])] = (
                shape_bytes(ins["shape"]), shape_hbm_bytes(ins["shape"])
            )
    top = defaultdict(int)
    memo = {}
    total = comp_bytes(entry, computations, fusion_bodies, shapes, memo, top)
    return total, dict(sorted(top.items(), key=lambda kv: -kv[1])[:20])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n_valid", type=int, default=1024)
    ap.add_argument("--measure", action="store_true",
                    help="also time the chained sparse search for measured f/s")
    ap.add_argument("--hbm_gbps", type=float, default=819.0,
                    help="device HBM bandwidth (v5e: 819 GB/s)")
    ap.add_argument("--out", default=None, help="write JSON here too")
    ap.add_argument("--dump_hlo", default=None,
                    help="write the scheduled HLO text here after compile")
    ap.add_argument("--from_hlo", default=None,
                    help="skip compile; account a previously dumped module")
    args = ap.parse_args()

    if args.from_hlo:
        with open(args.from_hlo) as f:
            text = f.read()
        hbm_bytes, top = module_hbm_bytes(text)
        print(json.dumps({
            "hbm_bytes_per_step": hbm_bytes,
            "t_mem_ms": round(hbm_bytes / (args.hbm_gbps * 1e9) * 1e3, 3),
            "top_traffic_mib": {
                k.split("/")[-1]: round(v / 2**20, 1)
                for k, v in list(top.items())[:20]
            },
        }))
        return

    import jax
    import jax.numpy as jnp

    from tstar_tpu.models.clip_tokenizer import HashTokenizer
    from tstar_tpu.models.owlvit import OwlViTDetector, owlvit_base_patch32
    from tstar_tpu.parallel.batched import batched_search_step
    from tstar_tpu.search.detector_scorer import OwlVitScorer, make_owlvit_scorer
    from tstar_tpu.search.state import init_state
    from tstar_tpu.utils.config import SearchConfig

    B, n_valid = args.batch, args.n_valid
    cfg = SearchConfig(
        search_budget=1.0, confidence_threshold=2.0,
        detector_threshold=10.0, use_pallas_preprocess=False, verify_batch=4,
    )
    n_pad = cfg.padded_frames(n_valid)
    iters = cfg.iteration_cap(n_valid)

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
    base = make_owlvit_scorer(
        model, variables,
        jnp.zeros((n_pad, *cfg.cache_hw, 3), jnp.uint8),
        ["target"], ["cue one", "cue two"], tok, cfg,
    )
    c_np = rng.integers(0, 256, (B, n_pad, *cfg.cache_hw, 3), dtype=np.uint8)
    c_np[:, n_valid:] = 0
    bsc = OwlVitScorer(
        cache=jnp.asarray(c_np),
        variables=variables,
        query_embeds=jnp.stack([base.query_embeds] * B),
        query_mask=jnp.stack([base.query_mask] * B),
        class_weights=jnp.stack([base.class_weights] * B),
        model=model,
        config=cfg,
    )
    del c_np
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[init_state(n_valid, 1, cfg, jax.random.key(200 + i), n_pad=n_pad)
          for i in range(B)],
    )

    print(f"compiling masked batched step at B={B}...", flush=True)
    step = jax.jit(batched_search_step, static_argnums=2)
    compiled = step.lower(stacked, bsc, cfg).compile()
    text = compiled.as_text()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(text)
    hbm_bytes, top = module_hbm_bytes(text)

    # Compute leg: per-image encoder+predict FLOPs from cost_analysis (its
    # FLOP count is trustworthy; only its bytes are pre-fusion).
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        step_flops = float(ca.get("flops", 0.0))
        flops_source = "cost_analysis(step)"
    except Exception:
        step_flops = B * 110e9
        flops_source = "analytic 110 GFLOP/image"
    if not step_flops:
        step_flops = B * 110e9
        flops_source = "analytic 110 GFLOP/image"

    peak_flops = 197e12  # v5e bf16
    bw = args.hbm_gbps * 1e9
    t_mem = hbm_bytes / bw
    t_flops = step_flops / peak_flops
    t_bound = max(t_mem, t_flops)
    frames_per_step = B * cfg.frames_per_iteration
    out = {
        "batch": B,
        "hbm_bytes_per_step": hbm_bytes,
        "step_flops": step_flops,
        "flops_source": flops_source,
        "t_mem_ms": round(t_mem * 1e3, 3),
        "t_flops_ms": round(t_flops * 1e3, 3),
        "bound": "memory" if t_mem >= t_flops else "compute",
        "attainable_frames_per_sec": round(frames_per_step / t_bound, 1),
        "attainable_step_ms": round(t_bound * 1e3, 3),
        "top_traffic": {
            k.split("/")[-1]: round(v / 2**20, 1) for k, v in
            list(top.items())[:12]
        },
    }

    if args.measure:
        import time

        from tstar_tpu.parallel.batched import run_search_batched_chained

        def run():
            _, secs = run_search_batched_chained(
                stacked, bsc, cfg, max_iterations=iters
            )
            np.asarray(secs)  # host fetch: the only reliable fence

        run()  # compile
        best = min(
            (lambda t0=time.perf_counter(): (run(), time.perf_counter() - t0)[1])()
            for _ in range(3)
        )
        measured = B * iters * cfg.frames_per_iteration / best
        out["measured_frames_per_sec"] = round(measured, 1)
        out["measured_step_ms"] = round(best / iters * 1e3, 3)
        out["measured_over_attainable"] = round(
            measured / out["attainable_frames_per_sec"], 3
        )

    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

"""TPU attention kernels for the encoder towers.

Two kernels live here:

1. ``fused_mha_from_qkv`` — the r3 single-block, layout-native Pallas MHA
   that IS the production path for large image batches (gate:
   ``use_fused_mha``; design + measured crossover at its definition below).
2. ``flash_mha`` — the stock Pallas flash kernel, a MEASURED NEGATIVE kept
   as an opt-in (TSTAR_FLASH_ATTENTION=1).  The full story, because the
   microbenchmarks lie in both directions at these shapes
   (v5e, S=577, 12 heads x 64):

  * r2: stock blocks, isolated → flash 2x slower than XLA.  Correct sign,
    wrong magnitude.
  * r3: tuned blocks (block_q=128, block_kv=S_pad), isolated
    dependent-chain loop → flash "3-12x faster" (0.37 ms vs 4.48 ms at
    B=1).  WRONG: the dependent chain (out feeds q) inflates the XLA side
    ~5x; inside the real encoder XLA's attention costs ~0.8 ms/layer at
    B=16, which is near the bandwidth bound of its materialized f32
    (B, H, S, S) probabilities.
  * r3 END-TO-END (the only numbers that matter, scripts/bench_sparse.py):
    sparse-regime search with flash routed in measured 6,183 f/s at B=1
    (vs 7,047 XLA), 9,807 at B=8 (neutral), 8,341 at B=16 (vs 9,573) —
    the kernel's (B,S,H,D)->(B,H,S,D) transposes + padding + lost fusion
    with the surrounding layernorm/projection epilogues outweigh the probs
    traffic it avoids.

``flash_mha`` takes/returns the models' native (B, S, H, D) layout, pads S
to a 128 multiple, masks the pads with segment ids, and matches
``jax.nn.dot_product_attention``'s math (1/sqrt(D) scaling, f32 softmax);
numerics agree to bf16 tolerance.  ``use_flash_attention`` gates it: opt-in
env var + TPU backend + no additive bias.
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning

# Explicit trace-time kill switch for the Pallas kernel suite (used by the
# opt-in quantized/fused-LN variants whose layouts the partitioning rules
# below don't cover, and available to user code).
_FUSED_MHA_DISABLED = contextvars.ContextVar("fused_mha_disabled", default=False)


@contextlib.contextmanager
def fused_mha_disabled():
    """Trace-time disable of the fused Pallas MHA (and the patch kernel)."""
    token = _FUSED_MHA_DISABLED.set(True)
    try:
        yield
    finally:
        _FUSED_MHA_DISABLED.reset(token)


# ---------------------------------------------------------------------------
# Mesh kernel info: how the ambient mesh divides the shapes the kernels see.
#
# Under GSPMD/shardy a jitted trace sees GLOBAL shapes, but the measured
# crossovers (batch >= 8 for the fused MHA and patch kernels) are about the
# PER-SHARD work each device runs, and tensor-parallel support needs the
# model-axis degree to lay the fused q|k|v projection out in shard-major
# groups.  Every batched entry point (parallel/batched.run_search_batched*)
# infers (dp, tp) from its state arrays' shardings and enters this context
# around the trace, so kernel gates apply per-shard shapes identically no
# matter which entry point the caller used (VERDICT r3 items 2 + 8).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MeshKernelInfo:
    dp: int = 1     # divisor of the leading (image-batch) axis across shards
    tp: int = 1     # model-axis degree (fused q|k|v shard groups)


_MESH_KERNEL_INFO = contextvars.ContextVar(
    "mesh_kernel_info", default=MeshKernelInfo()
)


@contextlib.contextmanager
def mesh_kernel_info(dp: int = 1, tp: int = 1):
    """Declare the ambient mesh's (dp, tp) division for kernel gating."""
    token = _MESH_KERNEL_INFO.set(MeshKernelInfo(dp=max(1, dp), tp=max(1, tp)))
    try:
        yield
    finally:
        _MESH_KERNEL_INFO.reset(token)


def current_mesh_kernel_info() -> MeshKernelInfo:
    return _MESH_KERNEL_INFO.get()


def infer_mesh_kernel_info(array, model_axis: str = "model") -> MeshKernelInfo:
    """Derive (dp, tp) from a CONCRETE array's NamedSharding.

    ``array`` is typically the batched search state's leading-axis-sharded
    ``P``; dp is the product of mesh axes sharding its leading dim and tp is
    the mesh's model-axis size.  Tracers and unsharded arrays yield the
    default (1, 1)."""
    from jax.sharding import NamedSharding

    try:
        sharding = array.sharding
    except Exception:  # noqa: BLE001 — tracer without a committed sharding
        return MeshKernelInfo()
    if not isinstance(sharding, NamedSharding):
        return MeshKernelInfo()
    mesh = sharding.mesh
    spec = sharding.spec
    dp = 1
    if len(spec) >= 1 and spec[0] is not None:
        axes = spec[0] if isinstance(spec[0], tuple) else (spec[0],)
        for a in axes:
            dp *= dict(mesh.shape).get(a, 1)
    tp = dict(mesh.shape).get(model_axis, 1)
    return MeshKernelInfo(dp=dp, tp=tp)


def _pad_to(n: int, multiple: int) -> int:
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


# ---------------------------------------------------------------------------
# Single-block fused MHA (r3): a layout-native Pallas kernel for the encoder
# shapes (S=577, 12 heads x 64, bf16).
#
# Why another attempt after the stock-flash negative above: the r3 B=16
# device trace shows XLA's fused attention near the bandwidth bound of its
# MATERIALIZED f32 (B, H, S, S) probabilities (~255 MB/layer at B=16) plus
# ~4.6 ms of K-layout copies — ~10 ms of a ~25 ms sparse step.  The stock
# kernel lost to (a) (B,S,H,D)->(B,H,S,D) transposes outside the kernel,
# (b) 128-row q streaming with flash running-max rescaling that these tiny
# sequences don't need, and (c) lost fusion with the projection epilogues.
# This kernel removes all three:
#
#   * it consumes the FUSED QKV PROJECTION OUTPUT (B, S, 3D) directly —
#     the grid is (B, H) and each program DMAs its head's 64-lane slices
#     (columns [h*64:...], [D + h*64:...], [2D + h*64:...]) straight out of
#     the projection layout; no transpose, no split, no pad anywhere;
#   * S=577 fits VMEM whole, so the softmax is ONE exact pass (max-sub,
#     exp, normalize) over a VMEM-resident (S, S) f32 logits tile — the
#     probabilities never touch HBM (the entire win);
#   * the output block writes straight into the (B, S, D) layout the
#     out_proj matmul consumes.
#
# Numerics: bf16 QK matmul with f32 accumulation, f32 softmax (matching
# jax.nn.dot_product_attention), probs cast to bf16 for the AV matmul (the
# same approximation class as the rest of the bf16 tower; parity pinned in
# tests/test_attention_kernel.py, e2e tolerance in the detector tests).
# ---------------------------------------------------------------------------


def _mha_kernel(
    q_ref, k_ref, v_ref, o_ref, *,
    scale: float, dh: int, hpb: int, p16: bool = False,
):
    # hpb heads share a 128-lane block (Mosaic requires lane-dim blocks in
    # multiples of 128; Dh=64 -> 2 heads per program, statically sliced).
    #
    # VPU economy over the (S, S) tile (the kernel's internal bound —
    # pure-MXU attention FLOPs are ~1 ms/step of its 4.1 at B=16):
    #  * softmax runs in the exp2 domain with the 1/sqrt(dh) scale and
    #    log2(e) folded into ONE multiplier (exp lowers to exp2 anyway;
    #    this just removes a separate scale pass);
    #  * normalization is DEFERRED past the AV matmul: the (S, S) divide
    #    becomes an (S, Dh) divide — 1/9th the elements at S=577.  The
    #    unnormalized bf16 probs are <= 1 (max-subtracted), so the f32 AV
    #    accumulation is as safe as the normalized form, and dividing the
    #    f32 accumulator by the f32 row sum afterwards is (slightly) more
    #    accurate than truncating normalized probs to bf16 first.
    log2e = 1.4426950408889634
    for i in range(hpb):
        q = q_ref[0][:, i * dh:(i + 1) * dh]            # (S, Dh) bf16
        k = k_ref[0][:, i * dh:(i + 1) * dh]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * log2e)                             # (S, S) f32, log2 dom
        m = jnp.max(logits, axis=-1, keepdims=True)
        if p16:
            # TSTAR_MHA_P16 (bf16 towers only): round the unnormalized
            # probs to bf16 in the exp2 expression and take the row sum
            # from the SAME bf16 values the AV matmul consumes — drops
            # the separate f32->bf16 cast pass over the (S, S) tile and
            # halves its write/read bytes.  The deferred-norm denominator
            # then matches the rounded probs exactly (self-consistent);
            # vs the f32-sum form the outputs differ at the bf16 level.
            p = jnp.exp2(logits - m).astype(jnp.bfloat16)
            s = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        else:
            p = jnp.exp2(logits - m)                    # unnormalized probs
            s = jnp.sum(p, axis=-1, keepdims=True)      # (S, 1) f32
            p = p.astype(q.dtype)
        acc = jax.lax.dot_general(
            p, v_ref[0][:, i * dh:(i + 1) * dh],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # (S, Dh) f32
        o_ref[0, :, i * dh:(i + 1) * dh] = (acc / s).astype(o_ref.dtype)


def _mha_pallas(
    qkv: jax.Array, num_heads: int, interpret: bool, groups: int = 1
) -> jax.Array:
    """The raw pallas_call (single device / one shard).

    ``groups=1``: the plain fused layout, columns [q | k | v].
    ``groups=G``: the SHARD-MAJOR tensor-parallel layout
    [q_0|k_0|v_0 | q_1|k_1|v_1 | ...] where group g carries heads
    [g*H/G, (g+1)*H/G) — the layout ``models/transformer.py`` builds under a
    tp mesh so that a last-axis sharding of degree G leaves each shard a
    self-contained q|k|v block.  The output is plain head-major (B, S, D) in
    both cases (groups are contiguous head ranges), so downstream out_proj
    is identical.
    """
    b, s, three_d = qkv.shape
    d = three_d // 3
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)

    def vmem_est(cand: int) -> int:
        # Conservative per-program VMEM stack estimate: double-buffered
        # q/k/v in-blocks + out-blocks plus the f32 logits / bf16 probs
        # tiles, times 2 for compiler slack — calibrated against the one
        # measured OOM (hpb=12 at S=577: io+tile = 9.3 MB pre-slack, 18.7 MB
        # after the 2x factor, vs Mosaic's actual 18.41 MB stack > the
        # 16 MB scoped limit — the 2x slack is what makes the guard trip).
        lanes = dh * cand
        s8 = -(-s // 8) * 8
        sl = -(-s // 128) * 128
        io = 8 * (s * lanes * 2)            # (3 in x2 + out x2) bf16
        tile = s8 * sl * 6                  # f32 logits + bf16 probs
        return 2 * (io + tile)

    def valid(cand: int) -> bool:
        return (
            cand > 0
            and num_heads % cand == 0
            and (dh * cand) % 128 == 0
            and (num_heads // cand) % groups == 0
        )

    base = max(1, 128 // dh)                # heads per 128-lane block
    # Default heads-per-program: TWO 128-lane blocks when they fit — the r4
    # interleaved sweep (scripts/ab_mha_hpb.py, B=16 sparse) measured
    # hpb=4 at +2.2% over hpb=2 (15,837 vs 15,497 f/s median; hpb=6
    # +1.8%): more heads per program let Mosaic overlap head i+1's QK^T
    # with head i's VPU softmax and halve the grid-switch count.  Falls
    # back to one block when head count / tp-group divisibility or the
    # VMEM estimate say no (e.g. 12-head tp=2 meshes: blocks must divide
    # groups).
    hpb = base
    if valid(2 * base) and vmem_est(2 * base) <= 14 * 1024 * 1024:
        hpb = 2 * base
    # TSTAR_MHA_HPB: trace-time heads-per-program override (A/B knob).
    # Numerics are bit-identical (same per-head math, only the program
    # granularity changes).  Invalid values (head count / lane tiling /
    # tp-group divisibility / VMEM estimate) silently keep the default.
    env_hpb = os.environ.get("TSTAR_MHA_HPB")
    if env_hpb:
        try:
            cand = int(env_hpb)
        except ValueError:
            cand = 0                    # non-numeric: keep the default
        if valid(cand) and vmem_est(cand) <= 14 * 1024 * 1024:
            hpb = cand
    # TSTAR_MHA_P16=1 (opt-in, bf16 towers): bf16 probs + bf16-derived row
    # sum — see _mha_kernel.
    p16 = (
        os.environ.get("TSTAR_MHA_P16", "0") == "1"
        and qkv.dtype == jnp.bfloat16
    )
    assert num_heads % hpb == 0 and (dh * hpb) % 128 == 0, (num_heads, dh)
    blocks = num_heads // hpb
    assert blocks % groups == 0, (blocks, groups)
    bpg = blocks // groups                  # head-blocks per shard group

    def head_block(section):
        # Column-block of the q/k/v section for grid head-block hi: group
        # g = hi // bpg starts at block 3*bpg*g; its q/k/v sections are bpg
        # blocks each.  groups=1 reduces to the plain [q | k | v] offsets.
        def index(bi, hi, section=section):
            g, j = hi // bpg, hi % bpg
            return (bi, 0, 3 * bpg * g + section * bpg + j)

        return pl.BlockSpec((1, s, dh * hpb), index)

    return pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale, dh=dh, hpb=hpb, p16=p16),
        grid=(b, blocks),
        in_specs=[head_block(0), head_block(1), head_block(2)],
        out_specs=pl.BlockSpec((1, s, dh * hpb), lambda bi, hi: (bi, 0, hi)),
        out_shape=jax.ShapeDtypeStruct((b, s, d), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv)


# GSPMD/shardy cannot partition a pallas_call on its own, but the kernel's
# grid is embarrassingly parallel over (batch, head-group), so
# custom_partitioning wrappers make sharded executions run the kernel
# locally per shard:
#   * groups=1 (``_fused_mha_cp``): batch (dp) sharding only — sequence and
#     feature axes pinned replicated, because a last-axis sharding of the
#     PLAIN [q | k | v] layout hands each shard mixed q/k/v columns.
#   * groups=G (``_tp_cp``): the shard-major grouped layout (see
#     ``_mha_pallas``) makes a last-axis sharding of degree T | G leave each
#     shard G/T whole q|k|v blocks, so the partition rule lowers a LOCAL
#     kernel with H/T heads — Megatron-style head parallelism with zero
#     collectives inside the attention block (the out_proj psum stays where
#     GSPMD already puts it).  The shardy rule expresses this with compound
#     factors: "b s (g t e) -> b s (g e)" — only the group factor g may
#     shard, and it propagates between operand and result.
def _cp_batch_spec(arg_shapes):
    from jax.sharding import PartitionSpec as P

    spec = arg_shapes[0].sharding.spec
    batch = spec[0] if len(spec) >= 1 else None
    return P(batch, None, None)


def _cp_infer(num_heads, interpret, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding

    return NamedSharding(mesh, _cp_batch_spec(arg_shapes))


def _cp_partition(num_heads, interpret, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, _cp_batch_spec(arg_shapes))

    def lower(qkv_local):
        return _mha_pallas(qkv_local, num_heads, interpret)

    return mesh, lower, sharding, (sharding,)


def _mha_pallas_plain(qkv, num_heads, interpret):
    # groups-free wrapper: custom_partitioning would otherwise treat the
    # defaulted ``groups`` parameter as a traced operand.
    return _mha_pallas(qkv, num_heads, interpret)


_fused_mha_cp = custom_partitioning(_mha_pallas_plain, static_argnums=(1, 2))
_fused_mha_cp.def_partition(
    infer_sharding_from_operands=_cp_infer,   # GSPMD propagation path
    partition=_cp_partition,
    # Shardy propagation path: batch factor passes through, sequence and
    # feature factors must stay replicated (the per-shard kernel needs
    # whole rows and whole q|k|v sections).
    sharding_rule="b s x -> b s d",
    need_replication_factors=("s", "x", "d"),
)


def _axes_product(mesh, entry) -> int:
    if entry is None:
        return 1
    axes = entry if isinstance(entry, tuple) else (entry,)
    shape = dict(mesh.shape)
    n = 1
    for a in axes:
        n *= shape.get(a, 1)
    return n


def _tp_spec(arg_shapes):
    """(batch, None, last) spec of the qkv operand."""
    from jax.sharding import PartitionSpec as P

    spec = arg_shapes[0].sharding.spec
    batch = spec[0] if len(spec) >= 1 else None
    last = spec[2] if len(spec) >= 3 else None
    return P(batch, None, last)


@functools.lru_cache(maxsize=None)
def _tp_cp(groups: int, e: int):
    """custom_partitioning instance for the grouped (tp) layout.

    Cached per (groups, per-group head width e = D/groups): the shardy rule
    needs concrete factor sizes.  The partition callback lowers a LOCAL
    kernel whose head count and group count divide by the last-axis sharding
    degree T (T must divide ``groups``; the gate guarantees it)."""

    def fn(qkv, num_heads, interpret):
        return _mha_pallas(qkv, num_heads, interpret, groups=groups)

    def infer(num_heads, interpret, mesh, arg_shapes, result_shape):
        from jax.sharding import NamedSharding

        return NamedSharding(mesh, _tp_spec(arg_shapes))

    def partition(num_heads, interpret, mesh, arg_shapes, result_shape):
        from jax.sharding import NamedSharding

        spec = _tp_spec(arg_shapes)
        t = _axes_product(mesh, spec[2])
        assert groups % max(t, 1) == 0 and num_heads % max(t, 1) == 0, (
            f"last-axis sharding degree {t} must divide tp groups {groups} "
            f"and heads {num_heads}"
        )
        sharding = NamedSharding(mesh, spec)

        def lower(qkv_local):
            return _mha_pallas(
                qkv_local, num_heads // t, interpret, groups=groups // t
            )

        return mesh, lower, sharding, (sharding,)

    cp = custom_partitioning(fn, static_argnums=(1, 2))
    cp.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="b s (g t e) -> b s (g e)",
        need_replication_factors=("s", "t", "e"),
        g=groups, t=3, e=e,
    )
    return cp


@functools.partial(
    jax.jit, static_argnames=("num_heads", "interpret", "tp_groups")
)
def fused_mha_from_qkv(
    qkv: jax.Array,
    num_heads: int,
    *,
    interpret: bool = False,
    tp_groups: int = 1,
) -> jax.Array:
    """Self-attention straight from the fused projection output.

    ``tp_groups=1``: ``qkv`` is (B, S, 3*D) with columns [0:D) = q,
    [D:2D) = k, [2D:3D) = v, each head-major — exactly the layout produced
    by concatenating the q/k/v projection weights.  Batch-sharded inputs
    (dp mesh axis) partition into per-shard kernel calls.

    ``tp_groups=G``: ``qkv`` is in the SHARD-MAJOR grouped layout
    [q_0|k_0|v_0|...|q_{G-1}|k_{G-1}|v_{G-1}] (group g = heads
    [g*H/G, (g+1)*H/G)), which ``models/transformer.py`` builds under a
    model-axis mesh; a last-axis sharding of degree T | G then runs a local
    kernel with H/T heads per shard — no re-gather, no collectives inside
    the block.  Unsharded execution of the grouped layout is bit-identical
    to the plain layout (same per-head math, contiguous head groups).

    Returns the attention output (B, S, D) head-major, ready for
    ``out_proj`` in both layouts.
    """
    if tp_groups > 1:
        d = qkv.shape[-1] // 3
        return _tp_cp(tp_groups, d // tp_groups)(qkv, num_heads, interpret)
    return _fused_mha_cp(qkv, num_heads, interpret)


# Measured e2e crossover (r3, scripts/ab_attention.py, interleaved
# in-process A/B, 577-token encoder).  WIN at large image batches, where
# XLA's materialized f32 probs traffic dominates: B=16 sparse search
# 14,013 vs 10,299 f/s (+36%, consistent across every interleaved rep).
# LOSS in the small-batch saturated regimes, where XLA overlaps the probs
# traffic behind the surrounding matmuls and a separate kernel only
# serializes: worst-case B=1 883 vs 910, B=4 951 vs 990 (-4%); B=1 sparse
# neutral-in-noise (6,633 vs 6,587).  Same lesson as the fused-LayerNorm
# and stock-flash results: beating XLA's fusions pays where its lowering
# is bandwidth-bound, not where its scheduler already overlaps the cost.
_MIN_FUSED_BATCH = 8


def fused_mha_plan(
    b: int, s: int, three_d: int, num_heads: int, attn_bias
):
    """Gate + layout plan for ``fused_mha_from_qkv``.

    Returns ``None`` (don't fuse) or the ``tp_groups`` layout to build:
    1 under no mesh / dp-only meshes, the model-axis degree under
    tensor-parallel meshes (the shard-major grouped q|k|v layout).

    Auto-gates on the measured crossover above: TPU, no additive bias,
    S in [256, 1152] (the (S, S) f32 logits tile must fit VMEM), head
    blocks must tile to 128 lanes — per SHARD under tensor parallelism —
    and the PER-SHARD image batch must be large enough that XLA's probs
    traffic binds (mesh division via ``mesh_kernel_info``, set by the
    batched entry points; VERDICT r3 item 8).  ``TSTAR_FUSED_MHA``: "0"
    disables, "force" bypasses the batch gate (A/B harness).
    """
    env = os.environ.get("TSTAR_FUSED_MHA", "1")
    if env == "0":
        return None
    if _FUSED_MHA_DISABLED.get():
        return None                     # explicit trace-time disable
    if attn_bias is not None:
        return None
    try:
        if jax.default_backend() != "tpu":
            return None
    except Exception:  # noqa: BLE001 — backend not initialized yet
        return None
    info = _MESH_KERNEL_INFO.get()
    tp = info.tp
    if num_heads % tp or (three_d // 3) % tp:
        return None                     # heads must split evenly over shards
    heads_local = num_heads // tp
    dh = three_d // 3 // num_heads
    hpb = 128 // dh if dh and not 128 % dh else 0
    if dh % 128 and (not hpb or heads_local % hpb):
        return None                     # cannot form 128-lane head blocks
    # Upper bound: the (S, S) f32 logits tile must fit VMEM with room for
    # the q/k/v/out blocks (S=1152 -> 5.3 MB logits; S=2048 would be
    # 16.8 MB and Mosaic-OOM).  Production S here is 577.
    if not (256 <= s <= 1152):
        return None
    b_local = b // info.dp if info.dp > 1 and b % info.dp == 0 else b
    if env != "force" and b_local < _MIN_FUSED_BATCH:
        return None
    return tp


def use_fused_mha(qkv: jax.Array, num_heads: int, attn_bias) -> bool:
    """Boolean form of ``fused_mha_plan`` (tests / simple callers)."""
    b, s, three_d = qkv.shape
    return fused_mha_plan(b, s, three_d, num_heads, attn_bias) is not None


def use_flash_attention(q: jax.Array, attn_bias) -> bool:
    """Trace-time gate for routing encoder attention through Pallas flash.

    Opt-in: end-to-end the XLA path wins at every measured batch size (see
    module docstring)."""
    if not os.environ.get("TSTAR_FLASH_ATTENTION"):
        return False
    if attn_bias is not None:
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # noqa: BLE001 — backend not initialized yet
        return False
    b, s, h, d = q.shape
    # Tiny sequences (text towers) fit XLA's fusion fine; the kernel wants
    # lane-aligned head_dim.
    return s >= 256 and d % 64 == 0


def use_bf16_probs(q: jax.Array, attn_bias) -> bool:
    """Opt-in gate (TSTAR_ATTN_PROBS_BF16=1) for ``bf16_probs_attention``."""
    if not os.environ.get("TSTAR_ATTN_PROBS_BF16"):
        return False
    if attn_bias is not None or q.dtype != jnp.bfloat16:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


def bf16_probs_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """(B, S, H, D) attention with the materialized probabilities in bf16.

    XLA's fused ``dot_product_attention`` stores the (B, H, S, S) attention
    probabilities in f32 — the single largest HBM traffic item of the B=16
    sparse search step (r3 device trace: ~255 MB/layer at B=16/S=577).
    This variant computes the softmax in f32 (same max-subtracted math) but
    casts the probs to bf16 before the AV matmul, halving that traffic.
    Approximation note: probs carry ~3 significant digits; the whole tower
    already runs bf16 compute, so this stays within the same approximation
    class (it does shift detector confidences at the 1e-3 level).
    """
    d = q.shape[-1]
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / (d ** 0.5))
    probs = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def flash_mha(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """(B, S, H, D) self-attention via the Pallas TPU flash kernel."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, s, h, d = q.shape
    s_pad = _pad_to(s, 128)

    def to_flash(t):
        t = t.transpose(0, 2, 1, 3)  # (B, H, S, D)
        if s_pad != s:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        return t

    seg = None
    if s_pad != s:
        ids = (jnp.arange(s_pad) < s).astype(jnp.int32)
        ids = jnp.broadcast_to(ids[None], (b, s_pad))
        seg = SegmentIds(q=ids, kv=ids)

    # Measured-best blocking: q streams in 128-row blocks while the whole
    # (padded) kv sequence stays resident per block; cap kv blocks at 1024
    # for long sequences so VMEM holds them.
    block_kv = s_pad if s_pad <= 1024 else 512
    block_q = min(128, s_pad)
    bs = BlockSizes(
        block_q=block_q, block_k_major=block_kv, block_k=block_kv, block_b=1,
        block_q_major_dkv=block_q, block_k_major_dkv=block_kv,
        block_k_dkv=block_kv, block_q_dkv=block_q,
        block_k_major_dq=block_kv, block_k_dq=block_kv, block_q_dq=block_q,
    )
    out = flash_attention(
        to_flash(q), to_flash(k), to_flash(v), segment_ids=seg,
        sm_scale=1.0 / (d ** 0.5), block_sizes=bs,
    )
    return out[:, :, :s, :].transpose(0, 2, 1, 3)

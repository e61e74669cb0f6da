"""Fused LayerNorm -> matmul Pallas kernel — a MEASURED e2e NEGATIVE.

OPT-IN via ``TSTAR_LN_MATMUL=1``; the default path keeps XLA's unfused
LN + Dense.  Measured r3 (scripts/ab_ln_matmul.py, interleaved
in-process): B=8 sparse 12,522 vs 13,884 f/s unfused (−10%), B=16 11,995
vs 14,096 (−15%).

The experiment and why it lost — kept because the post-mortem is the
useful part.  The post-MHA B=16 device trace
(scripts/trace_sparse_step.py) bills LayerNorm ``convert_reduce_fusion``
events at ~5.7 ms of a ~17.7 ms step, the largest non-matmul line, which
made folding each pre-norm LN into the projection it feeds (ln1 -> qkv,
ln2 -> fc1) look like a ~30% win:

    out = LN(x; scale, bias) @ W + b

one pass, W VMEM-resident, the normalized activation never touching HBM.
The e2e loss proves those LN events were NOT critical path: summed trace
durations ignore that the TensorCore runs its VPU and MXU concurrently —
XLA schedules the (VPU-bound) LN reduce fusions to overlap preceding
(MXU-bound) matmuls, so their wall-cost is mostly hidden, and this kernel
drags the LN INTO the serial MXU stream while breaking XLA's
residual-add/LN fusions around it.  Trace methodology rule derived from
this (PERFORMANCE.md): a fusion candidate is only real if the events it
removes are MXU-stream or HBM-bound, like the materialized attention
probs the fused MHA kernel removed — not VPU work.

Reference mapping: the reference runs HF CLIP-style pre-norm blocks on GPU
(`TStar/interface_heuristic.py:200-280` via transformers); this kernel is
the TPU lowering of the same math.

Numerics: f32 row stats, params double-cast (f32 -> compute dtype -> f32)
exactly like models/transformer.LayerNorm; matmul in the compute dtype
with f32 accumulation, output cast to the compute dtype, bias added in the
compute dtype — the same approximation class as the unfused
LayerNorm + Dense pair (parity pinned in tests/test_ln_matmul.py).

Sharding: like the fused MHA, GSPMD cannot auto-partition a pallas_call;
the custom_partitioning rule shards the ROW axis (flattened batch x
sequence) and pins features replicated.  Tensor-parallel traces (W
column-sharded) must disable via kernels.attention.fused_mha_disabled()
(one switch for all Pallas fusion kernels on the tp-unsupported list).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning

from tstar_tpu.kernels.attention import _FUSED_MHA_DISABLED


def _ln_matmul_kernel(x_ref, s_ref, b_ref, w_ref, c_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)                       # (blk, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    mul = jax.lax.rsqrt(var + eps) * s_ref[...]              # (1, D) f32
    h = ((x - mean) * mul + b_ref[...]).astype(o_ref.dtype)
    out = jax.lax.dot_general(
        h, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)
    o_ref[...] = out + c_ref[...]


def _ln_matmul_pallas(
    x2d: jax.Array,        # (R, D) compute dtype
    scale32: jax.Array,    # (1, D) f32 (already double-cast, see ln_matmul)
    bias32: jax.Array,     # (1, D) f32
    w: jax.Array,          # (D, N) compute dtype
    b: jax.Array,          # (1, N) compute dtype
    eps: float,
    interpret: bool,
) -> jax.Array:
    r, d = x2d.shape
    n = w.shape[1]
    # W stays VMEM-resident across the row grid; block rows sized so the
    # f32 dot tile + W fit comfortably (N=3072 -> ~8 MB total at blk=128).
    blk = 256 if n <= 2304 else 128
    blk = min(blk, max(8, r))
    return pl.pallas_call(
        functools.partial(_ln_matmul_kernel, eps=eps),
        grid=(pl.cdiv(r, blk),),
        in_specs=[
            pl.BlockSpec((blk, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((d, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((blk, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, n), x2d.dtype),
        interpret=interpret,
    )(x2d, scale32, bias32, w, b)


def _cp_row_spec(arg_shapes):
    from jax.sharding import PartitionSpec as P

    spec = arg_shapes[0].sharding.spec
    rows = spec[0] if len(spec) >= 1 else None
    return P(rows, None)


def _cp_infer(eps, interpret, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding

    return NamedSharding(mesh, _cp_row_spec(arg_shapes))


def _cp_partition(eps, interpret, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding, PartitionSpec as P

    rows = NamedSharding(mesh, _cp_row_spec(arg_shapes))
    rep2 = NamedSharding(mesh, P(None, None))

    def lower(x2d, scale32, bias32, w, b):
        return _ln_matmul_pallas(x2d, scale32, bias32, w, b, eps, interpret)

    return mesh, lower, rows, (rows, rep2, rep2, rep2, rep2)


_ln_matmul_cp = custom_partitioning(
    lambda x2d, scale32, bias32, w, b, eps, interpret: _ln_matmul_pallas(
        x2d, scale32, bias32, w, b, eps, interpret
    ),
    static_argnums=(5, 6),
)
_ln_matmul_cp.def_partition(
    infer_sharding_from_operands=_cp_infer,
    partition=_cp_partition,
    # Shardy rule: rows shard through, feature axes replicated.
    # factor order follows first appearance (Shardy requires the special
    # factor list sorted by factor index): r, d, u1, u2, n, u3
    sharding_rule="r d, u1 d, u2 d, d n, u3 n -> r n",
    need_replication_factors=("d", "u1", "u2", "n", "u3"),
)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def ln_matmul(
    x: jax.Array,          # (..., D) compute dtype
    scale: jax.Array,      # (D,) f32 LayerNorm scale
    bias: jax.Array,       # (D,) f32 LayerNorm bias
    w: jax.Array,          # (D, N)
    b: jax.Array,          # (N,)
    *,
    eps: float,
    interpret: bool = False,
) -> jax.Array:
    """``LayerNorm(x) @ w + b`` in one Pallas pass -> (..., N)."""
    d = x.shape[-1]
    lead = x.shape[:-1]
    dtype = x.dtype
    # Match models/transformer.LayerNorm's param handling exactly:
    # f32 params -> compute dtype -> f32.
    scale32 = scale.astype(dtype).astype(jnp.float32).reshape(1, d)
    bias32 = bias.astype(dtype).astype(jnp.float32).reshape(1, d)
    out = _ln_matmul_cp(
        x.reshape(-1, d), scale32, bias32, w.astype(dtype),
        b.astype(dtype).reshape(1, -1), eps, interpret,
    )
    return out.reshape(*lead, w.shape[1])


# Row gate used when the opt-in is enabled (same crossover expression as
# the fused MHA: 8 images x 577 tokens).
_MIN_ROWS = 4096


def use_ln_matmul(x: jax.Array, n_out: int) -> bool:
    """Gate for the fused LN->matmul path — OPT-IN (measured negative).

    ``TSTAR_LN_MATMUL``: unset/"0" disables (the default — see module
    docstring), "1" enables with the row gate, "force" bypasses the row
    gate.  Requires TPU, 3-d bf16 activations, 128-lane-tileable dims,
    and a VMEM-resident weight (D * N <= 768 * 3072).
    """
    env = os.environ.get("TSTAR_LN_MATMUL", "0")
    if env == "0":
        return False
    from tstar_tpu.kernels.attention import _MESH_KERNEL_INFO

    if _FUSED_MHA_DISABLED.get():
        return False                    # explicit kernel-suite kill switch
    info = _MESH_KERNEL_INFO.get()
    if info.dp > 1 or info.tp > 1:
        return False                    # no partitioning rule for this kernel
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # noqa: BLE001 — backend not initialized yet
        return False
    if x.ndim != 3 or x.dtype != jnp.bfloat16:
        return False
    d = x.shape[-1]
    if d % 128 or n_out % 128 or d * n_out > 768 * 3072:
        return False
    rows = x.shape[0] * x.shape[1]
    return env == "force" or rows >= _MIN_ROWS

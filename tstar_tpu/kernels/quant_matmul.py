"""Fused dynamic-quantize -> int8 matmul Pallas kernel — MEASURED NEGATIVE.

OPT-IN via ``TSTAR_W8A8_KERNEL=1``; the default W8A8 path keeps XLA's
lowering.  Measured r3 (scripts/ab_w8a8.py, interleaved in-process,
worst-case B=1 int8 search): 904 vs 1,063 f/s (-15%).

The hypothesis and why it lost: the int8 step trace (PERFORMANCE.md
"int8's ceiling, quantified") bills ~74% of the int8 verify forward to
non-dense work dominated by activation-quantization STAGING — XLA
materializes the full f32 scaled activation (e.g. (4, 577, 3072) before
fc2, ~56 MB/layer round-trip) between the per-token abs-max reduce and
the int8 dot.  This kernel quantizes each activation row block in VMEM
and feeds the MXU int8 dot directly, so that staging never touches HBM —
yet it measures 15% slower e2e.  Conclusion mirrors the LN->matmul
post-mortem: at these shapes XLA overlaps the staging traffic behind
MXU work well enough that its summed trace time is not critical path,
and a separate kernel serializes quantize (VPU) against the dot (MXU)
that XLA's schedule runs concurrently across layers.  The win condition
(PERFORMANCE.md critical-path rule, now sharpened) is HBM traffic that
GROWS with batch and saturates the schedule — the attention probs at
batch >= 8 — not merely "bytes visible in the trace".

Math is bit-identical to ``ops/quant.py dense_w8a8`` (same f32 absmax,
round, clip, i32 accumulation, dequant multiply order); parity is pinned
in tests/test_quant_matmul.py.  The reference has no quantized path (this
whole surface is a TPU-first addition, opt-in via
``SearchConfig.detector_quant``).

Sharding: row-axis custom_partitioning like kernels/ln_matmul.py;
tensor-parallel traces disable via kernels.attention.fused_mha_disabled().
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning

from tstar_tpu.kernels.attention import _FUSED_MHA_DISABLED


def _w8a8_kernel(x_ref, w_ref, ws_ref, b_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)                     # (blk, K)
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    xs = jnp.maximum(absmax, 1e-12) / 127.0                # (blk, 1)
    q = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * xs * ws_ref[...] + b_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


def _w8a8_pallas(x2d, w_i8, ws, b, out_dtype_name: str, interpret: bool):
    r, k = x2d.shape
    n = w_i8.shape[1]
    blk = 256 if max(k, n) <= 2304 else 128
    blk = min(blk, max(8, r))
    return pl.pallas_call(
        _w8a8_kernel,
        grid=(pl.cdiv(r, blk),),
        in_specs=[
            pl.BlockSpec((blk, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),   # int8 W VMEM-resident
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((blk, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, n), jnp.dtype(out_dtype_name)),
        interpret=interpret,
    )(x2d, w_i8, ws, b)


def _cp_row_spec(arg_shapes):
    from jax.sharding import PartitionSpec as P

    spec = arg_shapes[0].sharding.spec
    rows = spec[0] if len(spec) >= 1 else None
    return P(rows, None)


def _cp_infer(out_dtype_name, interpret, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding

    return NamedSharding(mesh, _cp_row_spec(arg_shapes))


def _cp_partition(out_dtype_name, interpret, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding, PartitionSpec as P

    rows = NamedSharding(mesh, _cp_row_spec(arg_shapes))
    rep2 = NamedSharding(mesh, P(None, None))

    def lower(x2d, w_i8, ws, b):
        return _w8a8_pallas(x2d, w_i8, ws, b, out_dtype_name, interpret)

    return mesh, lower, rows, (rows, rep2, rep2, rep2)


_w8a8_cp = custom_partitioning(
    lambda x2d, w_i8, ws, b, out_dtype_name, interpret: _w8a8_pallas(
        x2d, w_i8, ws, b, out_dtype_name, interpret
    ),
    static_argnums=(4, 5),
)
_w8a8_cp.def_partition(
    infer_sharding_from_operands=_cp_infer,
    partition=_cp_partition,
    # factor order follows first appearance: r, k, n, u1, u2
    sharding_rule="r k, k n, u1 n, u2 n -> r n",
    need_replication_factors=("k", "n", "u1", "u2"),
)


@functools.partial(jax.jit, static_argnames=("out_dtype_name", "interpret"))
def w8a8_matmul(
    x: jax.Array,          # (..., K) float activations
    w_i8: jax.Array,       # (K, N) int8 kernel
    w_scale: jax.Array,    # (N,) f32 per-channel scale
    bias: jax.Array,       # (N,) f32 (zeros when the layer has none)
    *,
    out_dtype_name: str,
    interpret: bool = False,
) -> jax.Array:
    """Fused ``dense_w8a8``: quantize rows in VMEM, int8 MXU dot, dequant."""
    k = x.shape[-1]
    lead = x.shape[:-1]
    out = _w8a8_cp(
        x.reshape(-1, k), w_i8,
        w_scale.astype(jnp.float32).reshape(1, -1),
        bias.astype(jnp.float32).reshape(1, -1),
        out_dtype_name, interpret,
    )
    return out.reshape(*lead, w_i8.shape[1])


def use_w8a8_kernel(x: jax.Array, k: int, n: int) -> bool:
    """Gate for routing ``dense_w8a8`` through the fused kernel.

    OPT-IN (measured negative, module docstring): unset/"0" disables,
    "1" enables.  Requires TPU, >=2-d activations, 128-lane-tileable
    dims, and a VMEM-resident int8 weight (K * N <= 768 * 3072 bytes).
    """
    env = os.environ.get("TSTAR_W8A8_KERNEL", "0")
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
    if x.ndim < 2:
        return False
    if k % 128 or n % 128 or k * n > 768 * 3072:
        return False
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    return rows >= 128

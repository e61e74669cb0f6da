"""Pallas fused LayerNorm for the detector encoder's hot path.

Why: the r3 B=16 sparse-step device trace (PERFORMANCE.md "The sparse
plateau, dissected") shows XLA's layernorm lowerings
(``convert_reduce_fusion.*``: f32 stats + bf16 normalize) running at ~10%
of v5e HBM bandwidth — ~0.48 ms each for a (16*577, 768) bf16 tensor whose
one-pass traffic is ~28 MB (~0.04 ms at streaming rate).  Twelve of them
cost ~5.7 ms of a 26 ms step.  The lane-dimension (D) reduction is the
culprit: XLA emits it as a multi-pass cross-lane reduce.

This kernel does the obvious one-pass thing: stream row blocks through
VMEM, compute f32 mean/variance per row, normalize, write once.  Each row's
statistics depend only on that row, so the ragged last row-block is safe
(out-of-bounds lanes never cross rows; D=768 is lane-exact).

Numerics match ``flax.linen.LayerNorm`` (use_fast_variance=True): f32
statistics, scale/bias cast to the compute dtype first (flax's
``promote_dtype`` does this), ``y = (x - mean) * (rsqrt(var+eps) * scale)
+ bias`` cast to the output dtype.  Parity is pinned in
``tests/test_layernorm.py`` (interpret mode on CPU).

Role: replaces the reference's torch ``nn.LayerNorm`` inside HF models
(reference runs stock transformers, ``TStar/interface_heuristic.py:200``);
here the norm is a measured TPU kernel on the search hot path.

Gating mirrors kernels/attention.py: opt-out env ``TSTAR_PALLAS_LN=0``;
only used on TPU for lane-exact feature dims (D % 128 == 0).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


# Measured e2e crossover (r3, scripts/ab_layernorm.py, interleaved in-process
# A/B).  WIN at 577 rows (single grid image; latency-bound regime): B=1
# sparse search beat XLA's LN in every interleaved pair, best 4,492 vs
# 2,964 f/s — XLA's cross-lane reduce fusion is latency-bound at small
# shapes.  LOSS everywhere the step is already saturated: forcing all LNs
# to Pallas measured ~6% slower in the verification-heavy worst case at
# both B=1 (862 vs 905 f/s) and B=4 (929 vs 988; 2,308-row LNs overlap
# behind matmuls in XLA's schedule, a separate kernel only serializes) and
# ~4% slower at 9,232 rows / B=16 sparse (9,843 vs 10,261; XLA streams
# large shapes at full rate).  The row gate keeps exactly the measured win.
_MAX_FUSED_ROWS = 1024


def use_pallas_layernorm(x: jax.Array) -> bool:
    """True when the fused kernel should run: TPU, lane-exact D, small rows.

    ``TSTAR_PALLAS_LN``: "0" disables, "force" bypasses the row gate (A/B
    harness), default auto-gates on the measured crossover above.
    """
    env = os.environ.get("TSTAR_PALLAS_LN", "1")
    if env == "0":
        return False
    from tstar_tpu.kernels.attention import (
        _FUSED_MHA_DISABLED,
        _MESH_KERNEL_INFO,
    )

    if _FUSED_MHA_DISABLED.get():
        return False    # explicit kernel-suite kill switch
    info = _MESH_KERNEL_INFO.get()
    if info.dp > 1 or info.tp > 1:
        # No partitioning rule for this kernel (unlike fused MHA/patch):
        # mesh traces must stay on XLA's LN.  Moot in practice — the row
        # gate already excludes every mesh regime (B >= 8 -> rows > 1024).
        return False
    if x.shape[-1] % 128 != 0 or x.ndim < 2:
        return False
    if jax.default_backend() != "tpu":
        return False
    if env == "force":
        return True
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    return rows <= _MAX_FUSED_ROWS


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float, param_dtype):
    x = x_ref[...].astype(jnp.float32)                      # (R_blk, D)
    d = x.shape[-1]
    # sum/d (not sum * reciprocal): bit-matches jnp.mean / flax stats
    mean = jnp.sum(x, axis=-1, keepdims=True) / d
    var = jnp.sum(x * x, axis=-1, keepdims=True) / d - mean * mean
    # flax promote_dtype casts params to the compute dtype BEFORE the math;
    # mirror it so enabling the kernel is numerically invisible.
    scale = scale_ref[...].astype(param_dtype).astype(jnp.float32)
    bias = bias_ref[...].astype(param_dtype).astype(jnp.float32)
    mul = jax.lax.rsqrt(var + eps) * scale
    o_ref[...] = ((x - mean) * mul + bias).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "block_rows", "interpret")
)
def fused_layernorm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    eps: float = 1e-5,
    block_rows: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """LayerNorm over the last axis of ``x`` (any leading shape), one pass.

    ``scale``/``bias`` are (D,) parameters (any float dtype; they are cast
    to ``x.dtype`` first, matching flax).  Output dtype == ``x.dtype``.
    """
    d = x.shape[-1]
    lead = x.shape[:-1]
    rows = 1
    for s in lead:
        rows *= s
    x2 = x.reshape(rows, d)
    blk = min(block_rows, max(8, rows))
    grid = (pl.cdiv(rows, blk),)
    out = pl.pallas_call(
        functools.partial(
            _ln_kernel, eps=float(eps), param_dtype=x.dtype
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((blk, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        interpret=interpret,
    )(x2, scale.reshape(1, d), bias.reshape(1, d))
    return out.reshape(*lead, d)

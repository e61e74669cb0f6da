"""Int8 (W8A8) matmul primitives for TPU MXU acceleration.

TPU MXUs run int8 x int8 -> int32 matmuls at twice the bf16 rate (v5e:
394.5 TOPS int8 vs 197 TFLOPS bf16), so quantizing the detector's dense
layers roughly doubles the FLOP ceiling of the search hot loop.  The
reference runs its detectors in fp16/fp32 CUDA (``TStar/
interface_heuristic.py:116-125,237-243``) and has no quantized path; this
is a TPU-first addition, opt-in via ``SearchConfig.detector_quant``.

Scheme: symmetric per-output-channel weight quantization (static, computed
once at scorer build) + symmetric per-token dynamic activation quantization
(absmax, computed in-graph).  Accumulation is int32 on the MXU; dequant is
a rank-1 outer product of the two scale vectors fused into the epilogue by
XLA.  No zero points: both sides are symmetric, which keeps the MXU path a
single plain ``dot_general``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weight(w, axis: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-channel int8 quantization of a kernel.

    ``w`` is an (in, out) matrix (flax Dense layout); channels are the
    output features (reduction over ``axis=0``).  Returns
    (w_int8 (in, out), scale (out,) float32) with w ~= w_int8 * scale.
    """
    w = np.asarray(w, np.float32)
    absmax = np.max(np.abs(w), axis=axis)
    scale = np.maximum(absmax, 1e-12) / 127.0
    q = np.clip(np.round(w / np.expand_dims(scale, axis)), -127, 127)
    return q.astype(np.int8), scale.astype(np.float32)


def quantize_activation(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dynamic symmetric per-token (last-axis) int8 quantization.

    Returns (x_int8 (..., K), scale (..., 1) float32) with x ~= x_int8 * scale.
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(x_i8: jax.Array, w_i8: jax.Array) -> jax.Array:
    """(..., K) int8 x (K, N) int8 -> (..., N) int32 on the MXU."""
    return jax.lax.dot_general(
        x_i8, w_i8,
        dimension_numbers=(((x_i8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def dense_w8a16(
    x: jax.Array,              # (..., K) float activations (bf16 in prod)
    w_i8: jax.Array,           # (K, N) int8 kernel
    w_scale: jax.Array,        # (N,) float32 per-channel scale
    bias: Optional[jax.Array] = None,   # (N,) float32
    out_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """Weight-only int8 dense: full-precision activations x int8 kernel.

    The kernel is stored int8 in HBM (half the bytes of bf16) and
    dequantized on the fly before the dot; activations stay bf16, so the
    scheme has none of the dynamic activation-quant staging that the r3
    ceiling analysis identified as ~74% of the W8A8 step cost
    (PERFORMANCE.md "int8's ceiling").  The matmul itself runs bf16 on the
    MXU (no 2x int8 FLOP rate), and the only numerics delta vs the bf16
    baseline is the int8 rounding of the weights (~0.4% relative), with NO
    per-token activation error.

    MEASURED (r5, scripts/ab_w8a16.py): an end-to-end LOSS at every batch
    and regime — 2-6% below plain bf16 (see PERFORMANCE.md "Weight-only
    int8 (W8A16)").  The hoped-for bandwidth win never materializes: consistent
    with the r3 int8-dequant matvec post-mortem, XLA does not stream the
    convert+scale through the dot's weight operand — the dequantized bf16
    kernel is materialized, so the weight path costs
    int8-read + bf16-write + bf16-read instead of one bf16 read — and at
    production batches weight bytes are a minor share of step traffic
    anyway (activations dominate).  Kept opt-in as the tighter-numerics
    rung (``detector_quant='w8a16'``), not a perf knob.
    """
    out_dtype = out_dtype or x.dtype
    w = (w_i8.astype(jnp.float32) * w_scale).astype(x.dtype)
    y = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias
    return y.astype(out_dtype)


def dense_w8a8(
    x: jax.Array,              # (..., K) float activations
    w_i8: jax.Array,           # (K, N) int8 kernel
    w_scale: jax.Array,        # (N,) float32 per-channel scale
    bias: Optional[jax.Array] = None,   # (N,) float32
    out_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """Quantized dense layer: dynamic-per-token int8 activations x int8 kernel.

    Numerically this computes ``round(x/sx) @ round(w/sw) * sx*sw + b`` — the
    standard W8A8 scheme; tests/test_quant.py pins the math bit-for-bit
    against a NumPy simulation and bounds the end-to-end drift on the full
    detector.

    An opt-in fused quantize->int8-matmul Pallas kernel exists
    (kernels/quant_matmul.py, ``TSTAR_W8A8_KERNEL=1``, same math) — it
    removes XLA's f32 activation-staging HBM traffic but measured 15%
    SLOWER e2e (post-mortem in that module); the default stays here.
    """
    out_dtype = out_dtype or x.dtype
    from tstar_tpu.kernels.quant_matmul import use_w8a8_kernel, w8a8_matmul

    if use_w8a8_kernel(x, w_i8.shape[0], w_i8.shape[1]):
        b = bias if bias is not None else jnp.zeros(
            (w_i8.shape[1],), jnp.float32
        )
        return w8a8_matmul(
            x, w_i8, w_scale, b, out_dtype_name=jnp.dtype(out_dtype).name
        )
    x_i8, x_scale = quantize_activation(x)
    acc = int8_matmul(x_i8, w_i8)
    y = acc.astype(jnp.float32) * x_scale * w_scale
    if bias is not None:
        y = y + bias
    return y.astype(out_dtype)

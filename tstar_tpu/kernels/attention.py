"""TPU flash attention for the encoder towers (Pallas, stock kernel).

MEASURED NEGATIVE — kept as an opt-in (TSTAR_FLASH_ATTENTION=1), not the
default.  The full story, because the microbenchmarks lie in both
directions at these shapes (v5e, S=577, 12 heads x 64):

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

import os

import jax
import jax.numpy as jnp


def _pad_to(n: int, multiple: int) -> int:
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


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

"""CLIP-style pre-norm transformer blocks shared by the vision models.

TPU notes: attention and MLP matmuls are expressed as single large einsums so
XLA tiles them onto the MXU; compute dtype is configurable (bfloat16 on TPU,
float32 for parity tests) while parameters stay float32.  Sequence lengths in
this framework are small and static (577 vision tokens, 16 text tokens).
Attention routing (measured r3, numbers in kernels/attention.py): large
image batches go through the layout-native single-block Pallas MHA
(``fused_mha_from_qkv`` — XLA's fused attention is bandwidth-bound on its
materialized f32 probs there, +36% e2e at B=16), small batches stay on
XLA's fused attention (its scheduler overlaps the probs traffic; a separate
kernel measured ~4% slower in the verification-heavy worst case).  The
stock Pallas flash kernel remains an opt-in measured NEGATIVE
(TSTAR_FLASH_ATTENTION=1).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


ACTIVATIONS: dict[str, Callable] = {
    "quick_gelu": quick_gelu,
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "gelu_tanh": lambda x: nn.gelu(x, approximate=True),
    "silu": nn.silu,
}


def apply_layernorm(
    x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float, dtype
) -> jax.Array:
    """The LayerNorm math shared by the module and the fused-projection
    fallbacks: Pallas streaming kernel in its measured-win regime, else
    flax's use_fast_variance path (f32 stats, params cast to the compute
    dtype, ``y = (x - mean) * (rsqrt(var+eps) * scale) + bias``)."""
    x = x.astype(dtype)
    from tstar_tpu.kernels.layernorm import (
        fused_layernorm,
        use_pallas_layernorm,
    )

    if use_pallas_layernorm(x):
        return fused_layernorm(x, scale, bias, eps=eps)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean
    mul = jax.lax.rsqrt(var + eps) * scale.astype(dtype).astype(jnp.float32)
    y = (x32 - mean) * mul + bias.astype(dtype).astype(jnp.float32)
    return y.astype(dtype)


class LayerNorm(nn.Module):
    """nn.LayerNorm drop-in that routes to the Pallas fused kernel on TPU.

    Param tree is identical to ``nn.LayerNorm`` (f32 ``scale``/``bias``), so
    checkpoint converters and parity tests are unchanged.  On TPU the
    normalize runs as ONE streaming pass (``kernels/layernorm.py``) instead
    of XLA's ~10%-of-bandwidth cross-lane reduce fusion; elsewhere (and via
    ``TSTAR_PALLAS_LN=0``) ``apply_layernorm`` bit-matches flax's
    use_fast_variance path.
    """

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (d,))
        bias = self.param("bias", nn.initializers.zeros_init(), (d,))
        return apply_layernorm(x, scale, bias, self.epsilon, self.dtype)


class _LayerNormParams(nn.Module):
    """Declares a LayerNorm's (scale, bias) without running it, so the
    fused LN->matmul projections (kernels/ln_matmul.py) can consume the
    params while the checkpoint tree keeps the standard layer_norm1/2
    names (declaration order matches LayerNorm: scale, then bias)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,)
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )
        return scale, bias


class _LinearParams(nn.Module):
    """Declares a Dense layer's (kernel, bias) without running it, so fused
    projections can keep the standard q_proj/k_proj/v_proj checkpoint tree."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class MultiHeadAttention(nn.Module):
    """Standard multi-head attention.

    The core runs through ``jax.nn.dot_product_attention`` so XLA can pick
    its fused attention lowering.  Measured r2 on a v5e: 2.8x faster than a
    hand-written einsum/softmax stack in isolation (23.2 vs 64.1 ms,
    12-layer 16x577x768 bf16), NEUTRAL inside the full search step (the
    production graph already fused well) — kept for the isolated win on
    larger VLM prefill shapes and for simplicity.  Same math: scale
    1/sqrt(head_dim), f32 softmax, additive bias; parity tests unchanged.
    """

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                      # (B, S, D)
        attn_bias: Optional[jax.Array] = None,  # broadcastable to (B, H, S, S)
        ln: Optional[tuple] = None,        # (scale, bias, eps): pre-norm x
    ) -> jax.Array:
        d = x.shape[-1]
        assert d % self.num_heads == 0
        head_dim = d // self.num_heads
        dense = lambda name: nn.Dense(d, dtype=self.dtype, name=name)

        # Parameters stay as separate q/k/v (HF checkpoint layout), but the
        # three projections run as ONE (D, 3D) matmul: at this framework's
        # shapes (S=577, D=768) three separate dots measure ~7% MFU on v5e
        # while the fused dot tiles normally.  The concat is loop-invariant
        # (weights), so XLA hoists it out of the search while_loop; numerics
        # are identical per output column.
        from tstar_tpu.kernels.attention import fused_mha_plan

        plan = (
            fused_mha_plan(x.shape[0], x.shape[1], 3 * d, self.num_heads,
                           attn_bias)
            if x.ndim == 3 else None
        )
        params = [
            _LinearParams(d, d, name=name)()
            for name in ("q_proj", "k_proj", "v_proj")
        ]
        if plan is not None and plan > 1:
            # Tensor-parallel fused-kernel layout: interleave per-shard-group
            # column blocks [q_g | k_g | v_g] so a model-axis sharding of the
            # (D, 3D) weight (each q/k/v kernel is already column-sharded,
            # parallel/shardings.py) leaves every shard a self-contained
            # q|k|v section — the regrouping maps shard-local slices to
            # shard-local slices, so GSPMD moves no data.  Head order within
            # and across groups is unchanged (groups are contiguous head
            # ranges), so the kernel's head-major output and out_proj are
            # identical to the plain layout.
            g = plan
            cols = [jnp.split(k, g, axis=1) for k, _ in params]
            w = jnp.concatenate(
                [c[gi] for gi in range(g) for c in cols], axis=1
            ).astype(self.dtype)
            bcols = [jnp.split(bb, g) for _, bb in params]
            bias3 = jnp.concatenate(
                [c[gi] for gi in range(g) for c in bcols]
            ).astype(self.dtype)
        else:
            w = jnp.concatenate(
                [k for k, _ in params], axis=1
            ).astype(self.dtype)
            bias3 = jnp.concatenate([b for _, b in params]).astype(self.dtype)
        if ln is not None:
            # Pre-norm fusion: x is the RESIDUAL-stream input; the LN folds
            # into the QKV projection (kernels/ln_matmul.py) so the
            # normalized activation never round-trips HBM.
            ln_scale, ln_bias, ln_eps = ln
            from tstar_tpu.kernels.ln_matmul import ln_matmul, use_ln_matmul

            if use_ln_matmul(x, 3 * d):
                qkv = ln_matmul(x, ln_scale, ln_bias, w, bias3, eps=ln_eps)
            else:
                h = apply_layernorm(x, ln_scale, ln_bias, ln_eps, self.dtype)
                qkv = jnp.einsum("...sd,de->...se", h, w) + bias3
        else:
            qkv = jnp.einsum("...sd,de->...se", x, w) + bias3

        from tstar_tpu.kernels.attention import fused_mha_from_qkv

        if plan is not None:
            # Layout-native single-block Pallas MHA: consumes the fused
            # projection output directly (no split/transpose), keeps the
            # (S, S) probabilities in VMEM (measured r3: XLA's fused
            # attention is bandwidth-bound on its materialized f32 probs
            # at these shapes — numbers in kernels/attention.py).  Under a
            # tensor-parallel mesh ``plan`` > 1 and qkv is in the grouped
            # shard-major layout built above; the kernel's
            # custom_partitioning then runs H/tp heads per shard.
            out = fused_mha_from_qkv(qkv, self.num_heads, tp_groups=plan)
            return dense("out_proj")(out)

        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(*t.shape[:-1], self.num_heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        if attn_bias is not None:
            b, s = x.shape[0], x.shape[1]
            attn_bias = jnp.broadcast_to(
                attn_bias, (attn_bias.shape[0], self.num_heads, s, s)
            )
        from tstar_tpu.kernels.attention import (
            bf16_probs_attention,
            flash_mha,
            use_bf16_probs,
            use_flash_attention,
        )

        if use_flash_attention(q, attn_bias):
            # opt-in Pallas flash (measured e2e negative; kernels/attention.py)
            out = flash_mha(q, k, v)
        elif use_bf16_probs(q, attn_bias):
            # opt-in: halve the materialized-probs HBM traffic
            out = bf16_probs_attention(q, k, v)
        else:
            out = jax.nn.dot_product_attention(q, k, v, bias=attn_bias)
        out = out.reshape(*x.shape[:-1], d)
        return dense("out_proj")(out)


class TransformerMLP(nn.Module):
    intermediate_size: int
    activation: str = "quick_gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, ln: Optional[tuple] = None) -> jax.Array:
        d = x.shape[-1]
        if ln is not None:
            # Pre-norm fusion into fc1 (see MultiHeadAttention).
            ln_scale, ln_bias, ln_eps = ln
            fc1_w, fc1_b = _LinearParams(
                self.intermediate_size, d, name="fc1"
            )()
            from tstar_tpu.kernels.ln_matmul import ln_matmul, use_ln_matmul

            if use_ln_matmul(x, self.intermediate_size):
                h = ln_matmul(
                    x, ln_scale, ln_bias, fc1_w.astype(self.dtype),
                    fc1_b, eps=ln_eps,
                )
            else:
                h = apply_layernorm(x, ln_scale, ln_bias, ln_eps, self.dtype)
                h = (
                    jnp.einsum("...sd,dn->...sn", h, fc1_w.astype(self.dtype))
                    + fc1_b.astype(self.dtype)
                )
        else:
            h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")(x)
        h = ACTIVATIONS[self.activation](h)
        return nn.Dense(d, dtype=self.dtype, name="fc2")(h)


class EncoderLayer(nn.Module):
    """Pre-norm block: x += attn(ln1(x)); x += mlp(ln2(x)).

    The LN params are declared here (same layer_norm1/2 checkpoint names)
    and passed INTO the projections so each pre-norm CAN fuse with the
    matmul it feeds (kernels/ln_matmul.py — an opt-in measured NEGATIVE:
    XLA overlaps the VPU-bound LN behind MXU matmuls, see that module's
    post-mortem).  The default path applies ``apply_layernorm``, which is
    byte-identical to the LayerNorm module.
    """

    num_heads: int
    intermediate_size: int
    activation: str = "quick_gelu"
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, attn_bias: Optional[jax.Array] = None) -> jax.Array:
        d = x.shape[-1]
        ln1 = _LayerNormParams(d, name="layer_norm1")()
        x = x + MultiHeadAttention(self.num_heads, dtype=self.dtype, name="self_attn")(
            x, attn_bias, ln=(*ln1, self.eps)
        )
        ln2 = _LayerNormParams(d, name="layer_norm2")()
        x = x + TransformerMLP(
            self.intermediate_size, self.activation, dtype=self.dtype, name="mlp"
        )(x, ln=(*ln2, self.eps))
        return x


class Encoder(nn.Module):
    num_layers: int
    num_heads: int
    intermediate_size: int
    activation: str = "quick_gelu"
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, attn_bias: Optional[jax.Array] = None) -> jax.Array:
        for i in range(self.num_layers):
            x = EncoderLayer(
                self.num_heads,
                self.intermediate_size,
                self.activation,
                self.eps,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, attn_bias)
        return x


def causal_bias(seq_len: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask of shape (1, 1, S, S)."""
    mask = jnp.tril(jnp.ones((seq_len, seq_len), bool))
    neg = jnp.finfo(dtype).min
    return jnp.where(mask, 0.0, neg)[None, None].astype(dtype)


def padding_bias(attention_mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Additive key-padding mask (B, 1, 1, S) from a 0/1 mask (B, S)."""
    neg = jnp.finfo(dtype).min
    return jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg).astype(dtype)

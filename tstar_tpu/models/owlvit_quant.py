"""Int8-quantized OWL-ViT vision tower for the search hot loop.

The vision encoder is ~95% of every detector forward (12 layers x ~9.1
GFLOP at 577 tokens vs ~2 GFLOP for patch conv + heads), and the worst-case
T* search runs 17 such forwards per step (grid + 16 verifications; reference
hot loop ``TStar/interface_searcher.py:444-491``).  Quantizing the six dense
matmuls of every encoder layer to W8A8 (see ops/quant.py) moves ~89% of
encoder FLOPs onto the int8 MXU path, which peaks at 2x the bf16 rate on
v5e/v6e.

What stays high-precision (accuracy-critical, FLOP-cheap):
  * patch-embedding conv, class/box heads, text tower: bf16 (unchanged);
  * layernorms and softmax statistics: float32;
  * attention QK^T / AV matmuls: bf16 via ``jax.nn.dot_product_attention``
    (~10% of layer FLOPs; attention activations have outliers that W8A8
    handles poorly, and the fused lowering is already fast).

Math mirrors ``models/owlvit.py`` ``VisionTower`` + ``encode_image`` exactly
apart from the quantization rounding; ``tests/test_quant.py`` bounds the
end-to-end drift (per-patch feature cosine, detection-score agreement) on
random weights.  Opt-in via ``SearchConfig.detector_quant='int8'`` — default
off until validated against real released checkpoints.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from tstar_tpu.models.owlvit import OwlViTConfig
from tstar_tpu.models.transformer import ACTIVATIONS
from tstar_tpu.ops.quant import dense_w8a8, dense_w8a16, quantize_weight


def _as_f32(x) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x, np.float32))


def _qlinear(lin: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    w_i8, scale = quantize_weight(lin["kernel"])
    return {
        "w": jnp.asarray(w_i8),
        "s": jnp.asarray(scale),
        "b": _as_f32(lin["bias"]),
    }


def _ln_params(ln: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    return {"scale": _as_f32(ln["scale"]), "bias": _as_f32(ln["bias"])}


def quantize_vision_tower(variables: Any, cfg: OwlViTConfig) -> Dict[str, Any]:
    """Quantize the vision-tower weights once -> pytree of int8 kernels.

    The result is passed to jitted code as an ARGUMENT (never closed over —
    see CLAUDE.md on HLO-constant bloat through the remote-compile relay).
    """
    p = variables["params"]
    v = p["vision"]
    layers = []
    for i in range(cfg.vision.num_layers):
        lyr = v["encoder"][f"layers_{i}"]
        attn = lyr["self_attn"]
        # Q/K/V share the same (layernormed) input, so their kernels fuse
        # into ONE (D, 3D) int8 matmul: the input is quantized once and the
        # MXU sees a single larger contraction.  Per-channel scales make the
        # fusion exact (identical to three separate quantized matmuls).
        qkv = {
            key: np.concatenate(
                [np.asarray(attn[name][key], np.float32)
                 for name in ("q_proj", "k_proj", "v_proj")],
                axis=-1 if key == "kernel" else 0,
            )
            for key in ("kernel", "bias")
        }
        layers.append({
            "ln1": _ln_params(lyr["layer_norm1"]),
            "ln2": _ln_params(lyr["layer_norm2"]),
            "qkv": _qlinear(qkv),
            "o": _qlinear(attn["out_proj"]),
            "fc1": _qlinear(lyr["mlp"]["fc1"]),
            "fc2": _qlinear(lyr["mlp"]["fc2"]),
        })
    return {
        "patch_kernel": _as_f32(v["patch_embedding"]["kernel"]),
        "cls": _as_f32(v["class_embedding"]),
        "pos": _as_f32(v["position_embedding"]),
        "pre_ln": _ln_params(v["pre_layernorm"]),
        "layers": tuple(layers),
        "post_ln": _ln_params(p["post_layernorm"]),
        "merged_ln": _ln_params(p["merged_layernorm"]),
    }


def _layernorm(x: jax.Array, ln: Dict[str, jnp.ndarray], eps: float) -> jax.Array:
    """LayerNorm with float32 statistics; returns float32."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y * ln["scale"] + ln["bias"]


def encode_image_int8(
    qparams: Dict[str, Any],
    pixels: jax.Array,          # (B, S, S, 3) CLIP-normalized (or None)
    cfg: OwlViTConfig,
    dtype=jnp.bfloat16,
    patch_embeds: jax.Array = None,   # (B, P, D) precomputed (composed path)
    weight_only: bool = False,
) -> jax.Array:
    """Quantized counterpart of ``OwlViTDetector.encode_image``.

    (B, S, S, 3) pixels -> merged per-patch features (B, P, D) ready for
    ``OwlViTDetector.predict``.  When ``patch_embeds`` is given (the
    composed cache->embedding projection, kernels/image.py), ``pixels`` is
    ignored and the tower starts after the patch matmul — the patch
    embedding stays bf16 under int8 by design, so both entries share it.

    ``weight_only`` (``SearchConfig.detector_quant='w8a16'``) runs the same
    int8 weight pytree through ``dense_w8a16``: bf16 activations, int8
    weights dequantized into the matmul — no dynamic activation quantization
    (the measured W8A8 bottleneck) and strictly tighter numerics.
    """
    if weight_only:
        # Activations compute in bf16 exactly like the unquantized tower
        # (the f32 layernorm outputs would otherwise force slow f32 dots).
        def dense(x, w, s, b, out_dtype):
            return dense_w8a16(x.astype(dtype), w, s, b, out_dtype=out_dtype)
    else:
        dense = dense_w8a8
    c = cfg.vision
    eps = c.eps
    ps = c.patch_size

    from tstar_tpu.models.owlvit import patchify

    if patch_embeds is not None:
        patches = patch_embeds.astype(dtype)
    else:
        x_p = patchify(pixels.astype(dtype), ps)
        w_p = qparams["patch_kernel"].astype(dtype).reshape(-1, c.hidden_size)
        patches = jnp.einsum("bpk,kd->bpd", x_p, w_p)
    b = patches.shape[0]
    cls = jnp.broadcast_to(
        qparams["cls"].astype(dtype), (b, 1, c.hidden_size)
    )
    x = jnp.concatenate([cls, patches], axis=1)
    x = x + qparams["pos"].astype(dtype)[None]
    x = _layernorm(x, qparams["pre_ln"], eps).astype(dtype)

    head_dim = c.hidden_size // c.num_heads
    seq = x.shape[1]
    act = ACTIVATIONS[c.activation]
    for lyr in qparams["layers"]:
        h = _layernorm(x, lyr["ln1"], eps)
        qkv = dense(
            h, lyr["qkv"]["w"], lyr["qkv"]["s"], lyr["qkv"]["b"], out_dtype=dtype
        )
        from tstar_tpu.kernels.attention import (
            flash_mha,
            fused_mha_from_qkv,
            fused_mha_plan,
            use_flash_attention,
        )

        # plan == 1 only: this path builds the PLAIN q|k|v layout, so the
        # grouped tensor-parallel plan (> 1) must fall through to the XLA
        # attention (the quantized tower has no grouped-weight builder).
        if fused_mha_plan(b, seq, qkv.shape[-1], c.num_heads, None) == 1:
            attn = fused_mha_from_qkv(qkv, c.num_heads)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            split = lambda t: t.reshape(b, seq, c.num_heads, head_dim)
            if use_flash_attention(split(q), None):
                attn = flash_mha(split(q), split(k), split(v))
            else:
                attn = jax.nn.dot_product_attention(
                    split(q), split(k), split(v)
                )
            attn = attn.reshape(b, seq, c.hidden_size)
        x = x + dense(
            attn, lyr["o"]["w"], lyr["o"]["s"], lyr["o"]["b"], out_dtype=dtype
        )
        h = _layernorm(x, lyr["ln2"], eps)
        h = dense(
            h, lyr["fc1"]["w"], lyr["fc1"]["s"], lyr["fc1"]["b"],
            out_dtype=jnp.float32,
        )
        h = act(h)
        x = x + dense(
            h, lyr["fc2"]["w"], lyr["fc2"]["s"], lyr["fc2"]["b"], out_dtype=dtype
        )

    hidden = _layernorm(x, qparams["post_ln"], eps)    # (B, 1+P, D) f32
    cls_token = hidden[:, :1, :]
    feats = hidden[:, 1:, :] * cls_token
    feats = _layernorm(feats, qparams["merged_ln"], eps)
    return feats.astype(dtype)

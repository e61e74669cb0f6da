"""Qwen2.5-VL vision tower — the reference's actual VLM family
(``TStar/interface_grounding.py:49``: Qwen2_5_VLForConditionalGeneration).

Differences from the Qwen2-VL tower (models/qwen2vl.py):
  * RMSNorm instead of LayerNorm (block norms and the merger's ln_q);
  * SwiGLU MLP with biases instead of a 2-layer GELU MLP;
  * windowed attention: patches are reordered into window-raster order and
    most blocks attend only within 112px windows (block-diagonal mask built
    from static segment ids); ``fullatt_block_indexes`` attend globally;
    outputs reorder back after the merger.

The language model is the same Qwen2 decoder, reused unchanged.  Parity vs a
tiny random ``Qwen2_5_VLForConditionalGeneration`` is tested in
``tests/test_qwen25vl.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tstar_tpu.models.qwen2vl import RMSNorm, apply_rope, vision_rope_angles


@dataclasses.dataclass(frozen=True)
class Qwen25VisionConfig:
    depth: int = 32
    embed_dim: int = 1280            # HF: vision hidden_size
    num_heads: int = 16
    intermediate_size: int = 3456
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    in_channels: int = 3
    hidden_size: int = 3584          # LM width (HF: out_hidden_size)
    window_size: int = 112
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2


def window_partition(grid_h: int, grid_w: int, cfg: Qwen25VisionConfig):
    """Static window layout for one image (numpy, trace-time).

    Returns (window_index over merge-units, segment id per PATCH in window
    order).  Mirrors HF ``get_window_index``: merge-units (2x2 patch groups)
    are gathered window-by-window; padding units are dropped.
    """
    m = cfg.spatial_merge_size
    win = cfg.window_size // m // cfg.patch_size     # units per window side
    uh, uw = grid_h // m, grid_w // m
    index = np.arange(uh * uw).reshape(uh, uw)
    pad_h = (-uh) % win
    pad_w = (-uw) % win
    padded = np.full((uh + pad_h, uw + pad_w), -1, np.int64)
    padded[:uh, :uw] = index
    nwh, nww = (uh + pad_h) // win, (uw + pad_w) // win
    blocks = (
        padded.reshape(nwh, win, nww, win).transpose(0, 2, 1, 3).reshape(-1, win * win)
    )
    window_index = []
    seg_ids_units = []
    for w, block in enumerate(blocks):
        units = block[block >= 0]
        window_index.extend(units.tolist())
        seg_ids_units.extend([w] * len(units))
    window_index = np.asarray(window_index, np.int64)           # (uh*uw,)
    seg_units = np.asarray(seg_ids_units, np.int64)
    unit = m * m
    seg_patches = np.repeat(seg_units, unit)                     # per patch
    return window_index, seg_patches


class Qwen25VisionBlock(nn.Module):
    cfg: Qwen25VisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin, attn_bias):
        c = self.cfg
        h = RMSNorm(c.eps, dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * c.embed_dim, dtype=self.dtype, name="qkv")(h)
        qkv = qkv.reshape(*x.shape[:-1], 3, c.num_heads, c.head_dim)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        q, k = apply_rope(q, k, cos, sin)
        scale = c.head_dim ** -0.5
        logits = jnp.einsum("...qhd,...khd->...hqk", q * scale, k.astype(q.dtype))
        logits = logits + attn_bias.astype(logits.dtype)
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(self.dtype)
        out = jnp.einsum("...hqk,...khd->...qhd", probs, v)
        out = out.reshape(*x.shape[:-1], c.embed_dim)
        x = x + nn.Dense(c.embed_dim, dtype=self.dtype, name="proj")(out)

        h = RMSNorm(c.eps, dtype=self.dtype, name="norm2")(x)
        gate = nn.Dense(c.intermediate_size, dtype=self.dtype, name="gate_proj")(h)
        up = nn.Dense(c.intermediate_size, dtype=self.dtype, name="up_proj")(h)
        x = x + nn.Dense(c.embed_dim, dtype=self.dtype, name="down_proj")(
            nn.silu(gate) * up
        )
        return x


class Qwen25VisionTower(nn.Module):
    """Same call signature as Qwen2VLVisionTower: (patches, grid_hw)."""

    cfg: Qwen25VisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patches: jax.Array, grid_hw: Tuple[int, int]) -> jax.Array:
        c = self.cfg
        grid_h, grid_w = grid_hw
        x = nn.Dense(c.embed_dim, use_bias=False, dtype=self.dtype, name="patch_embed")(
            patches.astype(self.dtype)
        )
        angles = vision_rope_angles(grid_h, grid_w, c.head_dim, c.spatial_merge_size)
        window_index, seg_patches = window_partition(grid_h, grid_w, c)

        # reorder patches (and their rope angles) into window order
        unit = c.spatial_merge_size ** 2
        n_units = (grid_h * grid_w) // unit
        perm = (
            np.repeat(window_index * unit, unit)
            + np.tile(np.arange(unit), n_units)
        )
        x = x[..., perm, :]
        emb = np.concatenate([angles[perm]] * 2, axis=-1)
        cos = jnp.asarray(np.cos(emb))[..., None, :]
        sin = jnp.asarray(np.sin(emb))[..., None, :]

        neg = jnp.finfo(jnp.float32).min
        seg = jnp.asarray(seg_patches)
        window_bias = jnp.where(seg[:, None] == seg[None, :], 0.0, neg)[None]
        full_bias = jnp.zeros_like(window_bias)

        for i in range(c.depth):
            bias = full_bias if i in c.fullatt_block_indexes else window_bias
            x = Qwen25VisionBlock(c, dtype=self.dtype, name=f"blocks_{i}")(
                x, cos, sin, bias
            )

        x = RMSNorm(c.eps, dtype=self.dtype, name="merger_ln")(x)
        x = x.reshape(*x.shape[:-2], n_units, unit * c.embed_dim)
        x = nn.Dense(unit * c.embed_dim, dtype=self.dtype, name="merger_fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(c.hidden_size, dtype=self.dtype, name="merger_fc2")(x)

        # restore original merge-unit order
        reverse = np.argsort(window_index)
        return x[..., reverse, :]


# ---------------------------------------------------------------------------
# HF conversion (vision part; the LM converts via convert_hf_qwen2vl_state_dict)
# ---------------------------------------------------------------------------

def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr.astype(np.float32)


def convert_hf_qwen25_vision(sd: Dict[str, Any], cfg: Qwen25VisionConfig) -> Dict:
    def pick(*names):
        for n in names:
            if n in sd:
                return sd[n]
        raise KeyError(names[0])

    def vp(name):
        return (f"visual.{name}", f"model.visual.{name}")

    def linear(name, bias=True):
        out = {"kernel": _t(pick(*vp(name + ".weight"))).T}
        if bias:
            out["bias"] = _t(pick(*vp(name + ".bias")))
        return out

    def rms(name):
        return {"scale": _t(pick(*vp(name + ".weight")))}

    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _t(pick(*vp("patch_embed.proj.weight"))).reshape(cfg.embed_dim, -1).T
        },
        "merger_ln": rms("merger.ln_q"),
        "merger_fc1": linear("merger.mlp.0"),
        "merger_fc2": linear("merger.mlp.2"),
    }
    for i in range(cfg.depth):
        params[f"blocks_{i}"] = {
            "norm1": rms(f"blocks.{i}.norm1"),
            "norm2": rms(f"blocks.{i}.norm2"),
            "qkv": linear(f"blocks.{i}.attn.qkv"),
            "proj": linear(f"blocks.{i}.attn.proj"),
            "gate_proj": linear(f"blocks.{i}.mlp.gate_proj"),
            "up_proj": linear(f"blocks.{i}.mlp.up_proj"),
            "down_proj": linear(f"blocks.{i}.mlp.down_proj"),
        }
    return params

"""SigLIP vision tower in Flax (LLaVA-OneVision's image encoder).

Matches HF ``SiglipVisionModel``: conv patch embedding (no CLS token),
learned position embeddings, pre-LN encoder with tanh-approximated GELU.
Feature extraction returns the requested hidden-state layer WITHOUT the final
post-layernorm, matching LLaVA-OV's ``vision_feature_layer`` semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tstar_tpu.models.transformer import Encoder


@dataclasses.dataclass(frozen=True)
class SiglipVisionConfig:
    hidden_size: int = 1152
    num_layers: int = 27
    num_heads: int = 16
    intermediate_size: int = 4304
    patch_size: int = 14
    image_size: int = 384
    eps: float = 1e-6

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


class SiglipVisionTower(nn.Module):
    cfg: SiglipVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array, feature_layer: int = -1) -> jax.Array:
        """pixels (B, S, S, 3) normalized -> hidden states of the selected
        layer (B, P, D); feature_layer indexes [embeddings, layer1, ...]."""
        c = self.cfg
        x = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            (c.patch_size, c.patch_size), padding="VALID",
            use_bias=True, dtype=self.dtype, name="patch_embedding",
        )(pixels.astype(self.dtype))
        b = x.shape[0]
        x = x.reshape(b, -1, c.hidden_size)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (c.num_patches, c.hidden_size),
        )
        x = x + pos.astype(self.dtype)[None]

        hidden: List[jax.Array] = [x]
        for i in range(c.num_layers):
            from tstar_tpu.models.transformer import EncoderLayer

            x = EncoderLayer(
                c.num_heads, c.intermediate_size, "gelu_tanh", c.eps,
                dtype=self.dtype, name=f"layers_{i}",
            )(x)
            hidden.append(x)
        # post_layernorm exists in checkpoints but feature layers are taken
        # BEFORE it (HF hidden_states semantics); keep params for parity.
        _ = nn.LayerNorm(epsilon=c.eps, dtype=self.dtype, name="post_layernorm")(x)
        return hidden[feature_layer if feature_layer >= 0 else len(hidden) + feature_layer]


def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr.astype(np.float32)


def convert_hf_siglip(sd: Dict[str, Any], cfg: SiglipVisionConfig, prefix: str) -> Dict:
    """HF SiglipVisionModel weights (under ``prefix``) -> Flax params."""

    def linear(name):
        return {
            "kernel": _t(sd[f"{prefix}{name}.weight"]).T,
            "bias": _t(sd[f"{prefix}{name}.bias"]),
        }

    def ln(name):
        return {
            "scale": _t(sd[f"{prefix}{name}.weight"]),
            "bias": _t(sd[f"{prefix}{name}.bias"]),
        }

    params: Dict[str, Any] = {
        "patch_embedding": {
            "kernel": _t(sd[f"{prefix}embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0),
            "bias": _t(sd[f"{prefix}embeddings.patch_embedding.bias"]),
        },
        "position_embedding": _t(sd[f"{prefix}embeddings.position_embedding.weight"]),
        "post_layernorm": ln("post_layernorm"),
    }
    for i in range(cfg.num_layers):
        lp = f"encoder.layers.{i}."
        params[f"layers_{i}"] = {
            "layer_norm1": ln(lp + "layer_norm1"),
            "layer_norm2": ln(lp + "layer_norm2"),
            "self_attn": {
                "q_proj": linear(lp + "self_attn.q_proj"),
                "k_proj": linear(lp + "self_attn.k_proj"),
                "v_proj": linear(lp + "self_attn.v_proj"),
                "out_proj": linear(lp + "self_attn.out_proj"),
            },
            "mlp": {
                "fc1": linear(lp + "mlp.fc1"),
                "fc2": linear(lp + "mlp.fc2"),
            },
        }
    return params

"""Local HF checkpoint loading for the Flax models (no network).

The reference pulls ``google/owlvit-base-patch32`` from the Hub at runtime
(``TStar/interface_heuristic.py:207-210``); here weights come from a local
checkpoint directory (``config.json`` + ``model.safetensors`` or
``pytorch_model.bin`` + tokenizer ``vocab.json``/``merges.txt``) and are
converted to Flax params.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax.numpy as jnp

from tstar_tpu.models.clip_tokenizer import ClipTokenizer
from tstar_tpu.models.owlvit import (
    OwlViTConfig,
    OwlViTDetector,
    TextConfig,
    VisionConfig,
    convert_hf_owlvit_state_dict,
)


def _read_state_dict(path: str) -> Dict[str, Any]:
    st_path = os.path.join(path, "model.safetensors")
    if os.path.exists(st_path):
        try:
            from safetensors import safe_open

            out = {}
            with safe_open(st_path, framework="numpy") as f:
                for k in f.keys():
                    out[k] = f.get_tensor(k)
            return out
        except ImportError:
            pass
        try:
            from safetensors.torch import load_file

            return load_file(st_path)
        except ImportError as e:
            raise RuntimeError(
                "model.safetensors present but safetensors is unavailable"
            ) from e
    bin_path = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch

        return torch.load(bin_path, map_location="cpu", weights_only=True)
    raise FileNotFoundError(
        f"no model.safetensors or pytorch_model.bin under {path}"
    )


def config_from_hf_json(cfg: Dict[str, Any]) -> OwlViTConfig:
    v, t = cfg["vision_config"], cfg["text_config"]
    return OwlViTConfig(
        vision=VisionConfig(
            hidden_size=v.get("hidden_size", 768),
            num_layers=v.get("num_hidden_layers", 12),
            num_heads=v.get("num_attention_heads", 12),
            intermediate_size=v.get("intermediate_size", 3072),
            patch_size=v.get("patch_size", 32),
            image_size=v.get("image_size", 768),
            activation=v.get("hidden_act", "quick_gelu"),
            eps=v.get("layer_norm_eps", 1e-5),
        ),
        text=TextConfig(
            vocab_size=t.get("vocab_size", 49408),
            hidden_size=t.get("hidden_size", 512),
            num_layers=t.get("num_hidden_layers", 12),
            num_heads=t.get("num_attention_heads", 8),
            intermediate_size=t.get("intermediate_size", 2048),
            max_length=t.get("max_position_embeddings", 16),
            activation=t.get("hidden_act", "quick_gelu"),
            eps=t.get("layer_norm_eps", 1e-5),
        ),
        projection_dim=cfg.get("projection_dim", 512),
    )


def load_owlvit_checkpoint(
    checkpoint_dir: str, dtype=jnp.bfloat16
) -> Tuple[OwlViTDetector, Dict, ClipTokenizer]:
    """-> (model, variables, tokenizer) from a local HF checkpoint dir."""
    with open(os.path.join(checkpoint_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = config_from_hf_json(hf_cfg)
    sd = _read_state_dict(checkpoint_dir)
    # Strip framework prefixes some exports carry.
    sd = { (k[6:] if k.startswith("model.") else k): v for k, v in sd.items() }
    variables = convert_hf_owlvit_state_dict(sd, cfg)
    model = OwlViTDetector(cfg, dtype=dtype)
    tokenizer = ClipTokenizer.from_dir(checkpoint_dir, context=cfg.text.max_length)
    return model, variables, tokenizer

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


def _read_sharded_state_dict(path: str) -> Dict[str, Any]:
    """Handles single-file and sharded (index.json) checkpoints."""
    index = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        shards = sorted(set(weight_map.values()))
        out: Dict[str, Any] = {}
        from safetensors import safe_open

        for shard in shards:
            with safe_open(os.path.join(path, shard), framework="numpy") as f:
                for k in f.keys():
                    out[k] = f.get_tensor(k)
        return out
    return _read_state_dict(path)


def qwen2vl_config_from_hf_json(cfg: Dict[str, Any]):
    from tstar_tpu.models.qwen2vl import (
        Qwen2VLConfig,
        Qwen2VLTextConfig,
        Qwen2VLVisionConfig,
    )

    t = cfg.get("text_config", cfg)
    v = cfg["vision_config"]
    rope_scaling = t.get("rope_scaling") or cfg.get("rope_scaling") or {}
    is_25 = "window_size" in v or "out_hidden_size" in v or (
        cfg.get("model_type", "").startswith("qwen2_5")
    )
    if is_25:
        from tstar_tpu.models.qwen25_vision import Qwen25VisionConfig

        vision = Qwen25VisionConfig(
            depth=v.get("depth", 32),
            embed_dim=v.get("hidden_size", v.get("embed_dim", 1280)),
            num_heads=v.get("num_heads", 16),
            intermediate_size=v.get("intermediate_size", 3456),
            patch_size=v.get("patch_size", 14),
            temporal_patch_size=v.get("temporal_patch_size", 2),
            spatial_merge_size=v.get("spatial_merge_size", 2),
            hidden_size=v.get("out_hidden_size", t.get("hidden_size", 3584)),
            window_size=v.get("window_size", 112),
            fullatt_block_indexes=tuple(v.get("fullatt_block_indexes", (7, 15, 23, 31))),
        )
    else:
        vision = Qwen2VLVisionConfig(
            depth=v.get("depth", 32),
            embed_dim=v.get("embed_dim", 1280),
            num_heads=v.get("num_heads", 16),
            mlp_ratio=v.get("mlp_ratio", 4.0),
            patch_size=v.get("patch_size", 14),
            temporal_patch_size=v.get("temporal_patch_size", 2),
            spatial_merge_size=v.get("spatial_merge_size", 2),
            hidden_size=v.get("hidden_size", t.get("hidden_size", 3584)),
        )
    return Qwen2VLConfig(
        vision=vision,
        text=Qwen2VLTextConfig(
            vocab_size=t.get("vocab_size", 152064),
            hidden_size=t.get("hidden_size", 3584),
            num_layers=t.get("num_hidden_layers", 28),
            num_heads=t.get("num_attention_heads", 28),
            num_kv_heads=t.get("num_key_value_heads", 4),
            intermediate_size=t.get("intermediate_size", 18944),
            rms_norm_eps=t.get("rms_norm_eps", 1e-6),
            rope_theta=t.get("rope_theta", 1e6),
            mrope_section=tuple(rope_scaling.get("mrope_section", (16, 24, 24))),
            tie_word_embeddings=t.get(
                "tie_word_embeddings", cfg.get("tie_word_embeddings", False)
            ),
        ),
        image_token_id=cfg.get("image_token_id", 151655),
        video_token_id=cfg.get("video_token_id", 151656),
        vision_start_token_id=cfg.get("vision_start_token_id", 151652),
    )


def load_qwen2vl_checkpoint(checkpoint_dir: str, dtype=jnp.bfloat16):
    """-> (Qwen2VLModel, variables, QwenTokenizer) from a local HF dir."""
    from tstar_tpu.models.qwen2vl import Qwen2VLModel, convert_hf_qwen2vl_state_dict
    from tstar_tpu.models.qwen_tokenizer import QwenTokenizer

    with open(os.path.join(checkpoint_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = qwen2vl_config_from_hf_json(hf_cfg)
    sd = _read_sharded_state_dict(checkpoint_dir)
    variables = convert_hf_qwen2vl_state_dict(sd, cfg)
    model = Qwen2VLModel(cfg, dtype=dtype)
    tokenizer = QwenTokenizer.from_dir(checkpoint_dir)
    return model, variables, tokenizer


def llava_onevision_config_from_hf_json(cfg: Dict[str, Any]):
    from tstar_tpu.models.llava_onevision import LlavaOnevisionConfig
    from tstar_tpu.models.qwen2vl import Qwen2VLTextConfig
    from tstar_tpu.models.siglip import SiglipVisionConfig

    t = cfg["text_config"]
    v = cfg["vision_config"]
    head_dim = t.get("hidden_size", 3584) // t.get("num_attention_heads", 28)
    return LlavaOnevisionConfig(
        vision=SiglipVisionConfig(
            hidden_size=v.get("hidden_size", 1152),
            num_layers=v.get("num_hidden_layers", 27),
            num_heads=v.get("num_attention_heads", 16),
            intermediate_size=v.get("intermediate_size", 4304),
            patch_size=v.get("patch_size", 14),
            image_size=v.get("image_size", 384),
        ),
        text=Qwen2VLTextConfig(
            vocab_size=t.get("vocab_size", 152064),
            hidden_size=t.get("hidden_size", 3584),
            num_layers=t.get("num_hidden_layers", 28),
            num_heads=t.get("num_attention_heads", 28),
            num_kv_heads=t.get("num_key_value_heads", 4),
            intermediate_size=t.get("intermediate_size", 18944),
            rms_norm_eps=t.get("rms_norm_eps", 1e-6),
            rope_theta=t.get("rope_theta", 1e6),
            mrope_section=(head_dim // 2, 0, 0),   # plain 1-D rope
            tie_word_embeddings=t.get("tie_word_embeddings", False),
        ),
        image_token_id=cfg.get("image_token_index", 151646),
        video_token_id=cfg.get("video_token_index", 151647),
        vision_feature_layer=cfg.get("vision_feature_layer", -1),
        vision_feature_select_strategy=cfg.get(
            "vision_feature_select_strategy", "full"
        ),
        projector_bias=cfg.get("multimodal_projector_bias", True),
    )


def load_llava_onevision_checkpoint(checkpoint_dir: str, dtype=jnp.bfloat16):
    from tstar_tpu.models.llava_onevision import (
        LlavaOnevisionModel,
        convert_hf_llava_onevision_state_dict,
    )
    from tstar_tpu.models.qwen_tokenizer import QwenTokenizer

    with open(os.path.join(checkpoint_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = llava_onevision_config_from_hf_json(hf_cfg)
    sd = _read_sharded_state_dict(checkpoint_dir)
    variables = convert_hf_llava_onevision_state_dict(sd, cfg)
    model = LlavaOnevisionModel(cfg, dtype=dtype)
    tokenizer = QwenTokenizer.from_dir(checkpoint_dir)
    return model, variables, tokenizer


def load_vlm_checkpoint(checkpoint_dir: str, dtype=jnp.bfloat16):
    """Family-dispatching VLM loader: reads config.json model_type."""
    with open(os.path.join(checkpoint_dir, "config.json")) as f:
        model_type = json.load(f).get("model_type", "")
    if model_type.startswith("llava_onevision"):
        return load_llava_onevision_checkpoint(checkpoint_dir, dtype)
    return load_qwen2vl_checkpoint(checkpoint_dir, dtype)


def save_flax_params(variables: Dict, checkpoint_dir: str, filename: str) -> str:
    """Save a Flax params pytree as a flat .npz (native checkpoint format)."""
    import numpy as np
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables, sep="|")
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, filename)
    np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})
    return path


def load_flax_params(checkpoint_dir: str, filename: str) -> Dict:
    import numpy as np
    from flax import traverse_util

    with np.load(os.path.join(checkpoint_dir, filename)) as data:
        flat = {k: data[k] for k in data.files}
    return traverse_util.unflatten_dict(flat, sep="|")


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

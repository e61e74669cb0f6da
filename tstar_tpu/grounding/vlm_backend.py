"""JAX VLM backend: Qwen2-VL inference on TPU for grounding and QA.

Drop-in counterpart of the reference's torch ``QwenInterface``
(``TStar/interface_grounding.py:52-150``), exposing the same
``inference_with_frames(query, frames, temperature, max_tokens)`` surface the
``UniversalGrounder`` facade dispatches to.  Weights load from a local HF
checkpoint directory; compute is bfloat16 with optional tensor-parallel
sharding over a device mesh.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


class JaxVLMBackend:
    def __init__(
        self,
        model_path: str,
        dtype=None,
        max_pixels: int = 448 * 448,
        mesh=None,
        seed: int = 0,
    ):
        import jax
        import jax.numpy as jnp

        from tstar_tpu.models.loader import load_vlm_checkpoint

        dtype = dtype if dtype is not None else jnp.bfloat16
        self.model, self.variables, self.tokenizer = load_vlm_checkpoint(
            model_path, dtype=dtype
        )
        from tstar_tpu.models.llava_onevision import LlavaOnevisionModel

        self._is_llava = isinstance(self.model, LlavaOnevisionModel)
        if mesh is not None:
            from tstar_tpu.parallel.shardings import shard_variables

            self.variables = shard_variables(mesh, self.variables)
        self.max_pixels = max_pixels
        self._rng = jax.random.key(seed)

    def inference_with_frames(
        self,
        query: str,
        frames: Optional[Sequence[np.ndarray]] = None,
        temperature: float = 0.7,
        max_tokens: int = 128,
        **kw,
    ) -> str:
        import jax
        import jax.numpy as jnp

        from tstar_tpu.models.generate import generate

        frames = [np.asarray(f) for f in (frames or [])]
        if self._is_llava:
            from tstar_tpu.models.llava_onevision import prepare_llava_inputs

            inputs = prepare_llava_inputs(self.tokenizer, query, frames, self.model.cfg)
        else:
            from tstar_tpu.models.qwen2vl_processor import prepare_vlm_inputs

            inputs = prepare_vlm_inputs(
                self.tokenizer, query, frames, self.model.cfg.vision,
                max_pixels=self.max_pixels,
                image_token_id=self.model.cfg.image_token_id,
            )
        self._rng, key = jax.random.split(self._rng)
        patches = inputs["image_patches"]
        tokens = generate(
            self.model,
            self.variables,
            inputs["input_ids"],
            inputs["prompt_lens"],
            inputs["position_ids"],
            max_new_tokens=max_tokens,
            eos_token_ids=[self.tokenizer.eos_id, self.tokenizer.pad_id],
            temperature=temperature,
            rng=key,
            image_patches=jnp.asarray(patches) if patches is not None else None,
            image_grid_hw=inputs["image_grid_hw"],
        )
        ids = np.asarray(tokens)[0].tolist()
        stops = {self.tokenizer.eos_id, self.tokenizer.pad_id}
        out = []
        for t in ids:
            if t in stops:
                break
            out.append(t)
        return self.tokenizer.decode(out).strip()

    # Legacy shim mirroring QwenInterface.inference (interface_grounding.py:135).
    def inference(self, query: str, frames=None, max_new_tokens: int = 128) -> str:
        return self.inference_with_frames(
            query=query, frames=frames or [], max_tokens=max_new_tokens
        )

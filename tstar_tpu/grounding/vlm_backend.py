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

    def inference_with_frames_batch(
        self,
        queries: Sequence[str],
        frames_list: Sequence[Sequence[np.ndarray]],
        temperature: float = 0.7,
        max_tokens: int = 128,
    ) -> list:
        """Batched generation: many (query, frames) requests per forward.

        The reference answers QA items one ``model.generate`` call at a time
        (``LVHaystackBench/val_qa_results.py:261-267``); on TPU a batch of B
        prompts shares one prefill + decode, using the MXU far better at
        these small model sizes.  Requests are grouped by input signature
        (image grid + patch shape) so every group stacks into static shapes;
        prompts right-pad to a 128-multiple bucket to bound retraces.
        Greedy (temperature 0) results are identical to the serial path —
        pinned by tests/test_vlm_backend.py.
        """
        import jax
        import jax.numpy as jnp

        from tstar_tpu.models.generate import generate

        if self._is_llava:
            # AnyRes tiling makes cross-item shapes heterogeneous; keep the
            # LLaVA path serial.
            return [
                self.inference_with_frames(q, f, temperature, max_tokens)
                for q, f in zip(queries, frames_list)
            ]
        from tstar_tpu.models.qwen2vl_processor import prepare_vlm_inputs

        prepared = []
        for query, frames in zip(queries, frames_list):
            frames = [np.asarray(f) for f in (frames or [])]
            prepared.append(
                prepare_vlm_inputs(
                    self.tokenizer, query, frames, self.model.cfg.vision,
                    max_pixels=self.max_pixels,
                    image_token_id=self.model.cfg.image_token_id,
                )
            )

        def signature(inp):
            p = inp["image_patches"]
            return (inp["image_grid_hw"], None if p is None else p.shape)

        groups: dict = {}
        for i, inp in enumerate(prepared):
            groups.setdefault(signature(inp), []).append(i)

        pad_id = self.tokenizer.pad_id
        outputs = [""] * len(prepared)
        for (grid_hw, _), idxs in groups.items():
            lens = [int(prepared[i]["prompt_lens"][0]) for i in idxs]
            s_pad = -(-max(lens) // 128) * 128
            b = len(idxs)
            ids = np.full((b, s_pad), pad_id, np.int32)
            pos = np.zeros((3, b, s_pad), np.int32)
            for row, i in enumerate(idxs):
                inp = prepared[i]
                L = lens[row]
                ids[row, :L] = inp["input_ids"][0]
                pos[:, row, :L] = inp["position_ids"][:, 0]
            patches = None
            if grid_hw is not None:
                # concatenation order == row order: embed() scatters the
                # flattened image stream over image tokens in (B, S) order.
                patches = jnp.asarray(
                    np.concatenate(
                        [prepared[i]["image_patches"] for i in idxs], axis=0
                    )
                )
            self._rng, key = jax.random.split(self._rng)
            tokens = generate(
                self.model,
                self.variables,
                ids,
                np.asarray(lens, np.int32),
                pos,
                max_new_tokens=max_tokens,
                eos_token_ids=[self.tokenizer.eos_id, self.tokenizer.pad_id],
                temperature=temperature,
                rng=key,
                image_patches=patches,
                image_grid_hw=grid_hw,
            )
            tokens = np.asarray(tokens)
            stops = {self.tokenizer.eos_id, self.tokenizer.pad_id}
            for row, i in enumerate(idxs):
                out = []
                for t in tokens[row].tolist():
                    if t in stops:
                        break
                    out.append(t)
                outputs[i] = self.tokenizer.decode(out).strip()
        return outputs

    # Legacy shim mirroring QwenInterface.inference (interface_grounding.py:135).
    def inference(self, query: str, frames=None, max_new_tokens: int = 128) -> str:
        return self.inference_with_frames(
            query=query, frames=frames or [], max_tokens=max_new_tokens
        )

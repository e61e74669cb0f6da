"""Universal grounder facade: backend dispatch + the three inference APIs.

Mirrors the reference ``TStarUniversalGrounder``
(``TStar/interface_grounding.py:327-468``): substring dispatch on the model
name ("gpt" / "qwen" / "llava" / here also "fake"), 8-frame uniform video
sampling for grounding, strict 2-line grounding parse with object-name
normalization, multiple-choice QA capped at 30 generated tokens, and
open-ended QA.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Tuple

from tstar_tpu.grounding.fake import FakeVLM
from tstar_tpu.grounding.prompts import (
    REPROMPT_SUFFIX,
    GroundingParseError,
    build_grounding_prompt,
    build_open_qa_prompt,
    build_qa_prompt,
    parse_grounding_response,
)
from tstar_tpu.utils.images import load_video_frames

logger = logging.getLogger(__name__)


class UniversalGrounder:
    def __init__(
        self,
        model_name: str = "gpt-4o",
        model_path: Optional[str] = None,
        api_key: Optional[str] = None,
        num_frames: int = 8,
        backend=None,
        parse_retries: int = 1,
    ):
        self.model_name = model_name
        self.num_frames = num_frames
        # Bounded re-prompt budget on a malformed grounding response
        # (SURVEY §5.3).  0 restores the reference's crash-on-first-failure
        # behavior (interface_grounding.py:393-395).
        self.parse_retries = max(0, int(parse_retries))
        if backend is not None:
            self.backend = backend
        else:
            name = model_name.lower()
            if "fake" in name:
                self.backend = FakeVLM()
            elif "gpt" in name:
                from tstar_tpu.grounding.openai_backend import OpenAIBackend

                self.backend = OpenAIBackend(model=model_name, api_key=api_key)
            elif "qwen" in name or "llava" in name:
                import os

                path = model_path or model_name
                if not os.path.isdir(path):
                    raise ValueError(
                        f"JAX VLM backends load from a LOCAL checkpoint "
                        f"directory; pass model_path= (got {path!r})"
                    )
                from tstar_tpu.grounding.vlm_backend import JaxVLMBackend

                self.backend = JaxVLMBackend(path)
            else:
                raise ValueError(
                    "model_name must contain one of: 'gpt', 'qwen', 'llava', 'fake'"
                )

    def inference_query_grounding(
        self,
        video_path: str,
        question: str,
        options: Optional[str] = None,
        temperature: float = 0.0,
        max_tokens: int = 512,
    ) -> Tuple[List[str], List[str]]:
        frames = load_video_frames(video_path, num_frames=self.num_frames)
        prompt = build_grounding_prompt(question, options, len(frames))
        response = self.backend.inference_with_frames(
            query=prompt, frames=frames, temperature=temperature, max_tokens=max_tokens
        )
        return self._parse_with_retry(
            response, prompt, frames, temperature, max_tokens
        )

    def _parse_with_retry(self, response, prompt, frames, temperature, max_tokens):
        """Parse a grounding response, re-prompting up to ``parse_retries``
        times with an explicit two-line format reminder on a malformed
        response (SURVEY §5.3; the reference crashes the item immediately,
        interface_grounding.py:393-395)."""
        for attempt in range(self.parse_retries + 1):
            try:
                return parse_grounding_response(response)
            except GroundingParseError:
                if attempt == self.parse_retries:
                    raise
                logger.warning(
                    "grounding parse failed (attempt %d/%d); re-prompting "
                    "with an explicit format reminder",
                    attempt + 1, self.parse_retries + 1,
                )
                response = self.backend.inference_with_frames(
                    query=prompt + REPROMPT_SUFFIX, frames=frames,
                    temperature=temperature, max_tokens=max_tokens,
                )

    def inference_query_grounding_batch(
        self,
        requests,            # sequence of dicts: {video_path, question, options}
        temperature: float = 0.0,
        max_tokens: int = 512,
    ) -> List:
        """Ground many (video, question) items at once (ours; the reference
        grounds strictly serially, run_TStar_onDataset.py:195-205).

        Returns one entry per request: ``(targets, cues)`` on success or the
        per-item ``Exception`` on failure (frame decode or response parse) —
        callers keep per-item failure semantics.  Uses the backend's batched
        path when present; a batch-level failure falls back to serial calls.
        """
        frames_list, prompts, errors = [], [], {}
        for i, req in enumerate(requests):
            try:
                frames = load_video_frames(
                    req["video_path"], num_frames=self.num_frames
                )
                frames_list.append(frames)
                prompts.append(build_grounding_prompt(
                    req["question"], req.get("options"), len(frames)
                ))
            except Exception as e:  # noqa: BLE001 — per-item failure
                errors[i] = e
                frames_list.append(None)
                prompts.append(None)

        ok = [i for i in range(len(requests)) if i not in errors]
        responses = {}
        batch_fn = getattr(self.backend, "inference_with_frames_batch", None)
        if batch_fn is not None and len(ok) > 1:
            try:
                outs = batch_fn(
                    [prompts[i] for i in ok], [frames_list[i] for i in ok],
                    temperature=temperature, max_tokens=max_tokens,
                )
                responses = dict(zip(ok, outs))
            except Exception as e:  # noqa: BLE001 — fall back to serial
                logger.error("batched grounding failed (%s); retrying serially", e)
        for i in ok:
            if i in responses:
                continue
            try:
                responses[i] = self.backend.inference_with_frames(
                    query=prompts[i], frames=frames_list[i],
                    temperature=temperature, max_tokens=max_tokens,
                )
            except Exception as e:  # noqa: BLE001
                errors[i] = e

        results: List = []
        for i in range(len(requests)):
            if i in errors:
                results.append(errors[i])
                continue
            try:
                results.append(self._parse_with_retry(
                    responses[i], prompts[i], frames_list[i],
                    temperature, max_tokens,
                ))
            except Exception as e:  # noqa: BLE001 — strict 2-line parse
                results.append(e)
        return results

    def inference_qa(
        self,
        frames,
        question: str,
        options: str,
        temperature: float = 0.2,
        max_tokens: int = 128,
    ) -> str:
        prompt = build_qa_prompt(question, options, len(frames))
        # The reference caps QA generation at 30 tokens regardless of the
        # caller's max_tokens (interface_grounding.py:443).
        response = self.backend.inference_with_frames(
            query=prompt, frames=frames, temperature=temperature, max_tokens=30
        )
        return response.strip()

    def inference_qa_batch(
        self,
        items,                      # sequence of dicts: {frames, question, options}
        temperature: float = 0.2,
    ) -> List[str]:
        """Answer many QA items at once (ours; the reference answers one item
        per ``generate`` call, val_qa_results.py:261-267).

        Uses the backend's batched path when it has one (JaxVLMBackend groups
        requests into shared prefill/decode forwards); otherwise falls back
        to per-item calls.  Same 30-token cap as ``inference_qa``.
        """
        prompts = [
            build_qa_prompt(it["question"], it["options"], len(it["frames"]))
            for it in items
        ]
        batch_fn = getattr(self.backend, "inference_with_frames_batch", None)
        if batch_fn is not None and len(items) > 1:
            responses = batch_fn(
                prompts, [it["frames"] for it in items],
                temperature=temperature, max_tokens=30,
            )
        else:
            responses = [
                self.backend.inference_with_frames(
                    query=p, frames=it["frames"],
                    temperature=temperature, max_tokens=30,
                )
                for p, it in zip(prompts, items)
            ]
        return [r.strip() for r in responses]

    def inference_openend_qa(
        self, frames, question: str, temperature: float = 0.2, max_tokens: int = 2048
    ) -> str:
        prompt = build_open_qa_prompt(question, len(frames))
        response = self.backend.inference_with_frames(
            query=prompt, frames=frames, temperature=temperature, max_tokens=max_tokens
        )
        return response.strip()


# Reference-compatible alias (TStar/interface_grounding.py:327).
TStarUniversalGrounder = UniversalGrounder

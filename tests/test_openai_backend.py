"""Mocked-transport tests for the OpenAI grounding backend.

The environment has no network egress, so the transport is a stub client;
this covers the only otherwise-untested reference-parity surface
(``TStar/interface_grounding.py:151-324``): ``<image>``-tag interleaving,
``detail: low`` base64 frames, retry behaviour, and strict-vs-reference
error handling (the reference swallows all exceptions into ``"Error: ..."``
strings, ``:211-212,239-240,281-282,323-324``).
"""

import sys
import types

import numpy as np
import pytest


class _FakeCompletions:
    def __init__(self, script):
        self.script = list(script)  # items: Exception or str
        self.calls = []

    def create(self, **kwargs):
        self.calls.append(kwargs)
        action = self.script.pop(0)
        if isinstance(action, Exception):
            raise action
        msg = types.SimpleNamespace(content=action)
        return types.SimpleNamespace(
            choices=[types.SimpleNamespace(message=msg)]
        )


class _FakeClient:
    def __init__(self, script):
        self.chat = types.SimpleNamespace(completions=_FakeCompletions(script))


@pytest.fixture()
def backend_factory(monkeypatch):
    fake_openai = types.ModuleType("openai")
    fake_openai.OpenAI = lambda api_key=None: types.SimpleNamespace()
    monkeypatch.setitem(sys.modules, "openai", fake_openai)
    monkeypatch.setenv("OPENAI_API_KEY", "test-key")

    from tstar_tpu.grounding.openai_backend import OpenAIBackend

    def make(script, **kw):
        b = OpenAIBackend(retry_backoff=0.0, **kw)
        b._client = _FakeClient(script)
        return b

    return make


FRAME = np.full((8, 8, 3), 128, np.uint8)


class TestInterleave:
    def test_image_tags_interleave_text_and_frames(self, backend_factory):
        b = backend_factory(["ok"])
        b.inference_with_frames(
            "Look at <image> and <image> then answer.", [FRAME, FRAME]
        )
        call = b._client.chat.completions.calls[0]
        content = call["messages"][1]["content"]
        kinds = [p["type"] for p in content]
        # frame i follows text part i (interface_grounding.py:296-313)
        assert kinds == ["text", "image_url", "text", "image_url", "text"]
        assert content[0]["text"] == "Look at"
        assert content[2]["text"] == "and"
        img = content[1]["image_url"]
        assert img["detail"] == "low"
        assert img["url"].startswith("data:image/jpeg;base64,")

    def test_no_tags_appends_frames(self, backend_factory):
        b = backend_factory(["ok"])
        b.inference_with_frames("Describe.", [FRAME])
        content = b._client.chat.completions.calls[0]["messages"][1]["content"]
        assert [p["type"] for p in content] == ["text", "image_url"]

    def test_system_message_and_model_threaded(self, backend_factory):
        b = backend_factory(["fine"])
        out = b.inference_text_only("hello", system_message="sys", temperature=0.2)
        call = b._client.chat.completions.calls[0]
        assert out == "fine"
        assert call["model"] == "gpt-4o"
        assert call["messages"][0] == {"role": "system", "content": "sys"}
        assert call["temperature"] == 0.2


class TestRetriesAndErrors:
    def test_retries_then_succeeds(self, backend_factory):
        b = backend_factory([RuntimeError("503"), RuntimeError("503"), "  answer  "])
        assert b.inference_text_only("q") == "answer"
        assert len(b._client.chat.completions.calls) == 3

    def test_strict_raises_typed_error_after_retries(self, backend_factory):
        from tstar_tpu.grounding.openai_backend import OpenAIBackendError

        b = backend_factory([RuntimeError("boom")] * 3)
        with pytest.raises(OpenAIBackendError, match="boom"):
            b.inference_text_only("q")
        assert len(b._client.chat.completions.calls) == 3

    def test_reference_mode_swallows_into_error_string(self, backend_factory):
        # Reference behaviour: exceptions become "Error: ..." strings
        # (interface_grounding.py:211-212).
        b = backend_factory([RuntimeError("boom")] * 3, strict=False)
        out = b.inference_text_only("q")
        assert out.startswith("Error:") and "boom" in out

    def test_missing_api_key_raises(self, monkeypatch):
        fake_openai = types.ModuleType("openai")
        fake_openai.OpenAI = lambda api_key=None: None
        monkeypatch.setitem(sys.modules, "openai", fake_openai)
        monkeypatch.delenv("OPENAI_API_KEY", raising=False)
        from tstar_tpu.grounding.openai_backend import OpenAIBackend

        with pytest.raises(ValueError, match="OPENAI_API_KEY"):
            OpenAIBackend()

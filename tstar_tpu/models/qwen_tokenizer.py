"""Qwen2 tokenizer: GPT-2-style byte-level BPE, self-contained.

Loads ``vocab.json`` + ``merges.txt`` from a local checkpoint directory (the
files every Qwen2/Qwen2-VL checkpoint ships).  Special tokens (``<|im_start|>``
etc.) are split out before BPE.  Parity with ``transformers.Qwen2Tokenizer``
is tested in ``tests/test_qwen_tokenizer.py``.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, Iterable, List, Optional

import regex as re

_PRETOKENIZE = re.compile(
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)

# Default special-token ids for Qwen2-VL checkpoints.
SPECIAL_TOKENS = {
    "<|endoftext|>": 151643,
    "<|im_start|>": 151644,
    "<|im_end|>": 151645,
    "<|vision_start|>": 151652,
    "<|vision_end|>": 151653,
    "<|vision_pad|>": 151654,
    "<|image_pad|>": 151655,
    "<|video_pad|>": 151656,
}


@functools.lru_cache()
def _bytes_to_unicode() -> Dict[int, str]:
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class QwenTokenizer:
    def __init__(
        self,
        vocab_file: str,
        merges_file: str,
        special_tokens: Optional[Dict[str, int]] = None,
    ):
        with open(vocab_file, encoding="utf-8") as f:
            self.encoder: Dict[str, int] = json.load(f)
        with open(merges_file, encoding="utf-8") as f:
            lines = f.read().split("\n")
        start = 1 if lines and lines[0].startswith("#") else 0
        merges = [tuple(l.split()) for l in lines[start:] if l.strip()]
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = _bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.special = dict(special_tokens or SPECIAL_TOKENS)
        # Specials may also live in vocab.json (added tokens usually don't).
        for tok, idx in self.special.items():
            self.encoder.setdefault(tok, idx)
        self.decoder = {v: k for k, v in self.encoder.items()}
        self._special_re = re.compile(
            "(" + "|".join(re.escape(t) for t in sorted(self.special, key=len, reverse=True)) + ")"
        )
        self._cache: Dict[str, List[str]] = {}
        self.eos_id = self.special.get("<|im_end|>", self.special["<|endoftext|>"])
        self.pad_id = self.special["<|endoftext|>"]

    @classmethod
    def from_dir(cls, path: str) -> "QwenTokenizer":
        special = None
        cfg_path = os.path.join(path, "tokenizer_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path, encoding="utf-8") as f:
                cfg = json.load(f)
            added = cfg.get("added_tokens_decoder", {})
            if added:
                special = {v["content"]: int(k) for k, v in added.items()}
        return cls(
            os.path.join(path, "vocab.json"),
            os.path.join(path, "merges.txt"),
            special_tokens=special,
        )

    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = list(token)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            a, b = best
            merged: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        self._cache[token] = word
        return word

    def encode(self, text: str) -> List[int]:
        """Text -> ids; special-token strings map to their reserved ids."""
        ids: List[int] = []
        for part in self._special_re.split(text):
            if not part:
                continue
            if part in self.special:
                ids.append(self.special[part])
                continue
            for tok in _PRETOKENIZE.findall(part):
                mapped = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
                ids.extend(self.encoder[p] for p in self._bpe(mapped))
        return ids

    def decode(self, ids: Iterable[int], skip_special: bool = True) -> str:
        parts: List[str] = []
        buf: List[str] = []

        def flush():
            if buf:
                text = "".join(buf)
                parts.append(
                    bytes(self.byte_decoder[ch] for ch in text).decode(
                        "utf-8", errors="replace"
                    )
                )
                buf.clear()

        for i in ids:
            tok = self.decoder.get(int(i), "")
            if int(i) in self.special.values() or tok in self.special:
                flush()
                if not skip_special:
                    parts.append(tok)
                continue
            buf.append(tok)
        flush()
        return "".join(parts)

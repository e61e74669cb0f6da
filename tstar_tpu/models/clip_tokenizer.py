"""First-party CLIP BPE tokenizer for OWL-ViT text prompts.

The reference tokenizes detector prompts with the HF ``OwlViTProcessor``
(reference ``TStar/interface_heuristic.py:220,234``: CLIP BPE, 16-token
context, pad id 0).  This is a self-contained implementation that reads the
standard ``vocab.json`` + ``merges.txt`` files from a local checkpoint
directory — no network, no tokenizers library.  Parity with
``transformers.CLIPTokenizer`` is tested in ``tests/test_tokenizer.py``.

Conventions (CLIP):
  * byte-level BPE with a printable-unicode byte alphabet;
  * word tokens carry a ``</w>`` suffix;
  * text is NFC-normalized, lowercased, whitespace-collapsed;
  * encode() -> [BOS] + bpe ids + [EOS], truncated/padded to ``context``.
"""

from __future__ import annotations

import functools
import html
import json
import os
import unicodedata
import zlib
from typing import Dict, List, Tuple

import numpy as np
import regex as re

_TOKEN_PATTERN = re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
    re.IGNORECASE,
)


@functools.lru_cache()
def _bytes_to_unicode() -> Dict[int, str]:
    """GPT-2/CLIP reversible byte->printable-unicode mapping."""
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


def _clean_text(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = unicodedata.normalize("NFC", text)
    text = re.sub(r"\s+", " ", text.strip())
    return text.lower()


class ClipTokenizer:
    def __init__(self, vocab_file: str, merges_file: str, context: int = 16):
        with open(vocab_file, encoding="utf-8") as f:
            self.encoder: Dict[str, int] = json.load(f)
        self.decoder = {v: k for k, v in self.encoder.items()}
        with open(merges_file, encoding="utf-8") as f:
            lines = f.read().split("\n")
        # skip the version header; drop empty trailing lines
        merges = [tuple(l.split()) for l in lines[1:] if l.strip()]
        self.bpe_ranks: Dict[Tuple[str, str], int] = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = _bytes_to_unicode()
        self.context = context
        self.bos_id = self.encoder["<|startoftext|>"]
        self.eos_id = self.encoder["<|endoftext|>"]
        self.pad_id = 0  # OWL-ViT convention: query_mask = ids[..., 0] > 0
        self._cache: Dict[str, List[str]] = {}

    @classmethod
    def from_dir(cls, path: str, context: int = 16) -> "ClipTokenizer":
        return cls(
            os.path.join(path, "vocab.json"),
            os.path.join(path, "merges.txt"),
            context=context,
        )

    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = list(token[:-1]) + [token[-1] + "</w>"]
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        self._cache[token] = word
        return word

    def tokenize(self, text: str) -> List[int]:
        """Raw BPE ids (no special tokens, no padding)."""
        ids: List[int] = []
        for tok in _TOKEN_PATTERN.findall(_clean_text(text)):
            mapped = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            for piece in self._bpe(mapped):
                ids.append(self.encoder[piece])
        return ids

    def encode(self, text: str) -> List[int]:
        """[BOS] + ids + [EOS], truncated to the context window (no padding)."""
        ids = [self.bos_id] + self.tokenize(text) + [self.eos_id]
        if len(ids) > self.context:
            ids = ids[: self.context - 1] + [self.eos_id]
        return ids

    def encode_batch(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Pad a batch to the context window.

        Returns (input_ids (Q, context) int32, attention_mask (Q, context)).
        """
        out = np.full((len(texts), self.context), self.pad_id, np.int32)
        mask = np.zeros((len(texts), self.context), np.int32)
        for i, t in enumerate(texts):
            ids = self.encode(t)
            out[i, : len(ids)] = ids
            mask[i, : len(ids)] = 1
        return out, mask


class HashTokenizer:
    """Hermetic stand-in for tests: deterministic ids, CLIP conventions.

    Maps each word to a stable id in [1, vocab); BOS/EOS are the two highest
    ids so OWL-ViT's argmax EOT pooling works.
    """

    def __init__(self, vocab_size: int = 100, context: int = 16):
        self.vocab_size = vocab_size
        self.context = context
        self.bos_id = vocab_size - 2
        self.eos_id = vocab_size - 1
        self.pad_id = 0

    def encode_batch(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        out = np.full((len(texts), self.context), self.pad_id, np.int32)
        mask = np.zeros((len(texts), self.context), np.int32)
        for i, t in enumerate(texts):
            words = t.lower().split() or [" "]
            ids = [self.bos_id]
            for w in words[: self.context - 2]:
                ids.append(1 + (zlib.crc32(w.encode()) % (self.vocab_size - 3)))
            ids.append(self.eos_id)
            out[i, : len(ids)] = ids
            mask[i, : len(ids)] = 1
        return out, mask

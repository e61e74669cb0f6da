"""CLIP BPE tokenizer parity vs transformers.CLIPTokenizer on local files."""

import json

import numpy as np
import pytest

from tstar_tpu.models.clip_tokenizer import ClipTokenizer, HashTokenizer

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    """A small hand-built BPE vocab covering a few real-looking words."""
    d = tmp_path_factory.mktemp("clip_vocab")
    chars = list("abcdefghijklmnopqrstuvwxyz0123456789.,!?' -")
    vocab = {}
    for ch in chars:
        vocab.setdefault(ch, len(vocab))
        vocab.setdefault(ch + "</w>", len(vocab))
    merges = [
        ("c", "o"), ("co", "u"), ("cou", "c"), ("couc", "h</w>"),
        ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e</w>"),
        ("w", "o"), ("wo", "m"), ("wom", "a"), ("woma", "n</w>"),
        ("t", "v</w>"),
        ("c", "h"), ("ch", "a"), ("cha", "i"), ("chai", "r</w>"),
        ("r", "e"), ("re", "d</w>"),
    ]
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    vocab.setdefault("<|startoftext|>", len(vocab))
    vocab.setdefault("<|endoftext|>", len(vocab))
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n"
    )
    return d


PROMPTS = [
    "couch",
    "table",
    "a red couch!",
    "woman, tv",
    "TV",          # case folding
    " chair ",     # stray whitespace
    "what?",
    "' -",         # punctuation only
]


class TestParityWithTransformers:
    def test_token_ids_match(self, vocab_dir):
        ours = ClipTokenizer.from_dir(str(vocab_dir))
        theirs = transformers.CLIPTokenizer(
            vocab_file=str(vocab_dir / "vocab.json"),
            merges_file=str(vocab_dir / "merges.txt"),
        )
        for text in PROMPTS:
            got = ours.encode(text)
            want = theirs.encode(text)
            assert got == want, f"{text!r}: {got} != {want}"

    def test_batch_padding_and_mask(self, vocab_dir):
        tok = ClipTokenizer.from_dir(str(vocab_dir))
        ids, mask = tok.encode_batch(["couch", "a red couch!"])
        assert ids.shape == (2, 16)
        assert (ids[:, 0] == tok.bos_id).all()
        assert (ids[mask == 0] == 0).all()
        # EOT is the max id in each row (OWL-ViT pooling requirement)
        assert (ids.max(axis=1) == tok.eos_id).all()


class TestHashTokenizer:
    def test_shapes_and_conventions(self):
        tok = HashTokenizer(vocab_size=100)
        ids, mask = tok.encode_batch(["couch", "red couch", " "])
        assert ids.shape == (3, 16)
        assert (ids[:, 0] == 98).all()
        assert (ids.max(axis=1) == 99).all()      # EOT pools correctly
        assert (ids[mask == 0] == 0).all()
        ids2, _ = tok.encode_batch(["couch", "red couch", " "])
        np.testing.assert_array_equal(ids, ids2)  # deterministic

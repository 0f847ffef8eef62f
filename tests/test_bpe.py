"""Vendored CLIP BPE tokenizer: merge algorithm against hand-computed
sequences, vocab construction, clip.tokenize framing contract, and the
clip_jax.tokenize resolution order (ref t2i_moe_gan.py:49-64)."""

import gzip

import numpy as np
import pytest

from moegan_tpu.models import bpe


@pytest.fixture()
def tiny():
    # Hand-ranked merges: "cat" and "dog" become single tokens.
    merges = [("c", "a"), ("ca", "t</w>"), ("d", "o"), ("do", "g</w>")]
    return bpe.CLIPBPETokenizer(merges=merges)


def test_bytes_to_unicode_reversible():
    enc = bpe.bytes_to_unicode()
    assert len(enc) == 256 and len(set(enc.values())) == 256
    assert enc[ord("a")] == "a"


def test_known_merge_sequences(tiny):
    # 512 base symbols + 4 merges + 2 specials
    assert tiny.vocab_size == 512 + 4 + 2
    assert tiny.bpe("cat") == "cat</w>"
    assert tiny.bpe("dog") == "dog</w>"
    # "cats": (c,a) then (ca? t) -- no (ca,t) merge without </w>; stays split.
    assert tiny.bpe("cats") == "ca t s</w>"
    ids = tiny.encode("cat dog")
    assert ids == [tiny.encoder["cat</w>"], tiny.encoder["dog</w>"]]
    # unknown word falls back to byte symbols with </w> on the last
    assert tiny.encode("ox") == [tiny.encoder["o"], tiny.encoder["x</w>"]]


def test_cleaning_and_casing(tiny):
    assert tiny.encode("  CAT\n\tDOG ") == tiny.encode("cat dog")
    # apostrophe contraction is its own pattern token: "cat's" -> cat + 's
    ids = tiny.encode("cat's")
    assert ids[0] == tiny.encoder["cat</w>"]
    assert tiny.decode(ids) == "cat 's"


def test_tokenize_framing(tiny):
    arr = tiny.tokenize(["cat", "dog cat"], context_length=8)
    assert arr.shape == (2, 8)
    assert arr[0, 0] == tiny.sot and arr[0, 2] == tiny.eot
    assert arr[0, 3:].sum() == 0  # zero padding
    # truncation preserves EOT at the end
    long = tiny.tokenize("cat " * 50, context_length=8)
    assert long[0, -1] == tiny.eot


def test_roundtrip_decode(tiny):
    text = "the dog! cat?"
    assert tiny.decode(tiny.encode(text)).replace(" ", "") == text.replace(" ", "")


def test_full_scale_vocab_and_clip_jax_wiring(tmp_path, monkeypatch):
    """A full-size merges file yields the 49,408 vocab and clip_jax's
    tokenize() routes through it (VERDICT: real BPE ids whenever a merges
    file is on disk, byte-fallback otherwise)."""
    syms = list(bpe.bytes_to_unicode().values())
    lines = ["#version: tiny-test"]
    n = 0
    for a in syms:
        for b in syms:
            if n >= bpe.NUM_MERGES:
                break
            lines.append(f"{a} {b}")
            n += 1
        if n >= bpe.NUM_MERGES:
            break
    path = tmp_path / "bpe_simple_vocab_16e6.txt.gz"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines))

    tok = bpe.CLIPBPETokenizer(str(path))
    assert tok.vocab_size == bpe.VOCAB_SIZE
    assert tok.sot == 49406 and tok.eot == 49407

    monkeypatch.setenv(bpe.BPE_PATH_ENV, str(path))
    bpe.default_tokenizer.cache_clear()
    try:
        from moegan_tpu.models import clip_jax

        ids = clip_jax.tokenize("hello world")
        assert ids.shape == (1, 77)
        assert ids[0, 0] == 49406
        expected = tok.tokenize("hello world")
        np.testing.assert_array_equal(ids, expected)
    finally:
        monkeypatch.delenv(bpe.BPE_PATH_ENV)
        bpe.default_tokenizer.cache_clear()


def test_real_merges_golden():
    """Golden ids against the published CLIP tokenizer — runs only when
    the real merges file is present (zero-egress image ships none)."""
    path = bpe.find_merges_file()
    if path is None:
        pytest.skip("no real CLIP merges file on disk")
    tok = bpe.CLIPBPETokenizer(path)
    ids = tok.tokenize("a photo of a cat")[0]
    expected = [49406, 320, 1125, 539, 320, 2368, 49407]
    np.testing.assert_array_equal(ids[: len(expected)], expected)

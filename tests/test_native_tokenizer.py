"""Bit-exactness of the C++ HashTokenizer scan vs the Python reference path.

The native scanner (`native/verbatim_host.cpp` hash_tokenize) must be
interchangeable with the Python regex+blake2b pipeline per text: same ids,
same offsets, same truncation — otherwise saved indexes built on one host
would silently mismatch queries tokenized on another.
"""

from __future__ import annotations

import hashlib
import random
import re
import string

import numpy as np
import pytest

from verbatim_rag_tpu.engine.native import available, hash_tokenize_native
from verbatim_rag_tpu.models.tokenizer import HashTokenizer

_WORD_RE = re.compile(r"[a-z0-9]+|[^\w\s]")


def _python_reference(text: str, vocab: int, reserved: int, max_tokens=None):
    """The original pure-Python pipeline, inlined as the test oracle."""
    span = vocab - reserved
    ids, offs = [], []
    for m in _WORD_RE.finditer(text.lower()):
        digest = hashlib.blake2b(repr(m.group(0)).encode(), digest_size=8).digest()
        h = int.from_bytes(digest, "little", signed=True)
        ids.append(reserved + h % span)
        offs.append((m.start(), m.end()))
        if max_tokens is not None and len(ids) >= max_tokens:
            break
    return ids, offs


CASES = [
    "",
    "hello world",
    "a_b__c underscore runs are skipped",
    "Don't stop! (really?) [x=1]; \"quoted\" \\ backslash",
    "MiXeD CaSe 123abc mixed",
    "'",
    '"',
    "\\",
    "a" * 300,  # multi-block blake2b input (repr > 128 bytes)
    string.punctuation,
    "ctrl chars \x00\x01\x07\x1b\x7f here",
    "\x1c\x1d\x1e\x1f unicode-mode whitespace",
    "tab\tnewline\nvtab\x0b formfeed\x0c",
]


@pytest.mark.skipif(not available(), reason="native library unavailable")
@pytest.mark.parametrize("max_tokens", [None, 1, 7, 64])
def test_native_matches_python_reference(max_tokens):
    rng = random.Random(0)
    cases = list(CASES) + [
        "".join(rng.choice(string.printable) for _ in range(rng.randint(0, 300)))
        for _ in range(100)
    ]
    for text in cases:
        expect_ids, expect_offs = _python_reference(text, 30522, 3, max_tokens)
        got = hash_tokenize_native(text, 30522, 3, max_tokens or (1 << 62))
        assert got is not None
        ids, offs = got
        assert ids.tolist() == expect_ids, repr(text)
        assert [tuple(o) for o in offs] == expect_offs, repr(text)


@pytest.mark.skipif(not available(), reason="native library unavailable")
def test_native_rejects_non_ascii():
    assert hash_tokenize_native("café ≡ naïve", 30522, 3, 64) is None


def test_tokenizer_facade_consistent_with_reference():
    """HashTokenizer (native or fallback) must agree with the oracle on
    ASCII text, and its memo must return identical results on repeat."""
    tok = HashTokenizer()
    text = "The quick brown fox (no. 42) jumps -- twice!"
    expect_ids, expect_offs = _python_reference(text, tok.vocab_size, 3, 16)
    for _ in range(2):  # second pass exercises the memo
        ids, offs = tok.tokenize_with_offsets(text, max_tokens=16)
        assert ids == expect_ids
        assert offs == expect_offs


def test_encode_batch_shapes_and_truncation():
    tok = HashTokenizer()
    texts = ["one two three", "x " * 500, ""]
    enc = tok.encode_batch(texts, max_length=64, with_offsets=True)
    assert enc.input_ids.shape == enc.attention_mask.shape
    assert enc.input_ids.shape[1] <= 64
    # row 0: [CLS] t t t [SEP] → 5 live tokens
    assert int(enc.attention_mask[0].sum()) == 5
    assert enc.input_ids[0, 0] == tok.cls_id
    assert enc.input_ids[0, 4] == tok.sep_id
    # row 1 saturates the window
    assert int(enc.attention_mask[1].sum()) == enc.input_ids.shape[1]
    # row 2: [CLS] [SEP] only
    assert int(enc.attention_mask[2].sum()) == 2
    # offsets row mirrors the live width and starts with the CLS sentinel
    assert len(enc.offsets[0]) == 5
    assert enc.offsets[0][0] == (0, 0)
    assert enc.offsets[0][1] == (0, 3)


def test_memo_is_thread_safe_under_concurrent_encode():
    """The class-level tokenization memo is hit from API batcher worker
    threads; concurrent encodes of overlapping text sets must neither crash
    nor corrupt results."""
    from concurrent.futures import ThreadPoolExecutor

    tok = HashTokenizer()
    texts = [f"shared text number {i} with words " + "pad " * (i % 7) for i in range(64)]
    expected = tok.encode_batch(texts, max_length=64).input_ids.copy()
    HashTokenizer._text_cache.clear()

    def work(seed):
        rng = random.Random(seed)
        local = texts[:]
        rng.shuffle(local)
        enc = HashTokenizer().encode_batch(local, max_length=64)
        if seed % 3 == 0:
            HashTokenizer._text_cache.clear()  # adversarial eviction mid-flight
        return {t: row for t, row in zip(local, enc.input_ids)}

    with ThreadPoolExecutor(8) as pool:
        for result in pool.map(work, range(24)):
            for i, t in enumerate(texts):
                np.testing.assert_array_equal(result[t], expected[i])


def test_encode_batch_pair_framing():
    tok = HashTokenizer()
    enc = tok.encode_batch(["alpha beta"], max_length=32, pair=["gamma"])
    row = enc.input_ids[0][enc.attention_mask[0].astype(bool)]
    # [CLS] a b [SEP] g [SEP]
    assert row[0] == tok.cls_id
    assert row[3] == tok.sep_id
    assert row[-1] == tok.sep_id
    assert len(row) == 6


def test_native_tokenize_returns_owned_arrays():
    """hash_tokenize_native must copy, not return views of its cap-sized
    buffers — cached results would otherwise pin ~4x the intended memory
    for low-token, long-char texts (advisor r2 finding)."""
    from verbatim_rag_tpu.engine.native import hash_tokenize_native

    out = hash_tokenize_native("a " + " " * 1000 + "b", 30522, 10, 10**6)
    if out is None:  # native lib unavailable on this host
        return
    ids, offsets = out
    assert ids.base is None and offsets.base is None


class TestThreadedHostLoops:
    """The row-parallel native loops must be bit-identical to single-thread
    (disjoint output rows; pure reads elsewhere)."""

    def test_project_rows_thread_invariant(self, monkeypatch):
        import numpy as np

        from verbatim_rag_tpu.engine import native

        if not native.available():
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(7)
        n, m, V, d = 1024, 16, 512, 32
        ids = rng.integers(0, V, size=(n, m)).astype(np.int32)
        w = rng.random((n, m)).astype(np.float32)
        P = rng.normal(size=(V, d)).astype(np.float32)
        # Thread count is latched per-process in C, so we can't flip it here;
        # instead check against the numpy reference, which any threading bug
        # (overlapping chunks, missed rows) would break.
        out = native.project_rows_native(ids, w, P)
        ref = (w[:, :, None] * P[ids]).sum(axis=1)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    def test_exact_rescore_covers_all_queries(self):
        import ctypes

        import numpy as np

        from verbatim_rag_tpu.engine import native

        lib = native._load()
        if lib is None:
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(8)
        B, C, n, m, V = 64, 8, 128, 4, 256
        rows = rng.integers(-1, n, size=(B, C)).astype(np.int64)
        ids = rng.integers(0, V, size=(n, m)).astype(np.int32)
        w = rng.random((n, m)).astype(np.float32)
        q = rng.random((B, V)).astype(np.float32)
        scores = np.full((B, C), 7.0, np.float32)  # sentinel: must be overwritten
        lib.exact_rescore(
            rows.ctypes.data, B, C, ids.ctypes.data, w.ctypes.data, n, m,
            q.ctypes.data, V, scores.ctypes.data,
        )
        ref = np.where(
            rows >= 0,
            (w[np.maximum(rows, 0)] * np.take_along_axis(
                q[:, None, :].repeat(C, 1), ids[np.maximum(rows, 0)].astype(np.int64), axis=2
            )).sum(-1),
            -3.0e38,
        )
        np.testing.assert_allclose(scores, ref.astype(np.float32), rtol=2e-5, atol=2e-5)

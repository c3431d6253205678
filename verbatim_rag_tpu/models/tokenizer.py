"""Host-side tokenization for the JAX encoders.

The reference leans on HF fast tokenizers (Rust) everywhere; SURVEY.md §2.8
allows keeping them as host-side preprocessing. Two backends:

- :class:`HFTokenizer` — wraps a ``tokenizer.json`` via the ``tokenizers``
  library when a real checkpoint's tokenizer is available.
- :class:`HashTokenizer` — deterministic, file-free fallback (word-level
  hashing into the configured vocab with BERT-style special ids) so every
  code path runs offline with random-weight models.

Both emit fixed-shape, bucket-padded batches — variable-length text must
never leak dynamic shapes into jit (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import re
from abc import ABC, abstractmethod
from dataclasses import dataclass

import numpy as np

_WORD_RE = re.compile(r"[a-z0-9]+|[^\w\s]")

#: Pad batches to these sequence lengths to bound recompilation.
DEFAULT_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096, 8192)


@dataclass
class TokenizedBatch:
    input_ids: np.ndarray  # [B, S] int32
    attention_mask: np.ndarray  # [B, S] int32
    #: per text: list of (char_start, char_end) per token (specials = (0, 0))
    offsets: list[list[tuple[int, int]]] | None = None


def bucket_length(n: int, buckets=DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class Tokenizer(ABC):
    pad_id: int = 0
    cls_id: int = 101
    sep_id: int = 102

    @abstractmethod
    def encode_batch(
        self,
        texts: list[str],
        max_length: int = 512,
        pair: list[str] | None = None,
        with_offsets: bool = False,
    ) -> TokenizedBatch: ...


class HashTokenizer(Tokenizer):
    """Deterministic word-hash tokenizer (no vocab files needed)."""

    #: word→id memo cap (natural-language vocab is far smaller; the cap only
    #: guards against adversarial/unbounded token streams).
    _CACHE_MAX = 1 << 20

    def __init__(self, vocab_size: int = 30522, buckets=DEFAULT_BUCKETS):
        from verbatim_rag_tpu.engine.filters import stable_hash64

        self.vocab_size = vocab_size
        self.buckets = buckets
        self._hash = stable_hash64
        self.pad_id, self.cls_id, self.sep_id = 0, 1, 2
        self._reserved = 3
        # blake2b-per-word dominated ingest tokenization (2.8 ms/text);
        # corpora repeat words heavily, so memoize word→id.
        self._word_cache: dict[str, int] = {}

    def _word_id(self, word: str) -> int:
        wid = self._word_cache.get(word)
        if wid is None:
            span = self.vocab_size - self._reserved
            wid = self._reserved + int(self._hash(word.lower())) % span
            if len(self._word_cache) < self._CACHE_MAX:
                self._word_cache[word] = wid
        return wid

    def describe(self) -> dict:
        return {"class": "HashTokenizer", "vocab_size": self.vocab_size}

    def tokenize_with_offsets(
        self, text: str, max_tokens: int | None = None
    ) -> tuple[list[int], list[tuple[int, int]]]:
        """Tokenize; ``max_tokens`` stops the scan early (finditer is lazy),
        so encoding a long chunk at a short max_length costs O(max_length),
        not O(len(text)) — the round-1 ingest profile spent 13.5 s/660 chunks
        re-tokenizing full texts that were then truncated."""
        ids, offsets = [], []
        for m in _WORD_RE.finditer(text.lower()):
            ids.append(self._word_id(m.group(0)))
            offsets.append((m.start(), m.end()))
            if max_tokens is not None and len(ids) >= max_tokens:
                break
        return ids, offsets

    def encode_batch(
        self,
        texts: list[str],
        max_length: int = 512,
        pair: list[str] | None = None,
        with_offsets: bool = False,
    ) -> TokenizedBatch:
        rows, offs = [], []
        for i, text in enumerate(texts):
            ids, offsets = self.tokenize_with_offsets(text, max_tokens=max_length)
            ids = [self.cls_id] + ids + [self.sep_id]
            offsets = [(0, 0)] + offsets + [(0, 0)]
            if pair is not None:
                p_ids, _p_off = self.tokenize_with_offsets(pair[i], max_tokens=max_length)
                ids += p_ids + [self.sep_id]
                offsets += [(0, 0)] * (len(p_ids) + 1)
            ids = ids[:max_length]
            offsets = offsets[:max_length]
            rows.append(ids)
            offs.append(offsets)

        seq = bucket_length(max(len(r) for r in rows), self.buckets)
        seq = min(seq, max_length)
        batch = np.full((len(rows), seq), self.pad_id, np.int32)
        mask = np.zeros((len(rows), seq), np.int32)
        for i, ids in enumerate(rows):
            ids = ids[:seq]
            batch[i, : len(ids)] = ids
            mask[i, : len(ids)] = 1
            offs[i] = offs[i][:seq]
        return TokenizedBatch(batch, mask, offs if with_offsets else None)


class HFTokenizer(Tokenizer):
    """Wraps a HuggingFace fast tokenizer file (tokenizer.json)."""

    def __init__(self, path: str, buckets=DEFAULT_BUCKETS):
        from tokenizers import Tokenizer as RustTokenizer

        self._tok = (
            RustTokenizer.from_file(path)
            if path.endswith(".json")
            else RustTokenizer.from_pretrained(path)
        )
        self.path = path
        self.buckets = buckets
        self.pad_id = self._tok.token_to_id("[PAD]") or 0
        self.cls_id = self._tok.token_to_id("[CLS]") or 101
        self.sep_id = self._tok.token_to_id("[SEP]") or 102
        self._tok.no_padding()
        self._tok.no_truncation()

    def describe(self) -> dict:
        return {"class": "HFTokenizer", "path": self.path}

    def encode_batch(
        self,
        texts: list[str],
        max_length: int = 512,
        pair: list[str] | None = None,
        with_offsets: bool = False,
    ) -> TokenizedBatch:
        inputs = list(zip(texts, pair)) if pair is not None else list(texts)
        encodings = self._tok.encode_batch(inputs)
        rows = [e.ids[:max_length] for e in encodings]
        offs = [list(e.offsets[:max_length]) for e in encodings]

        seq = min(bucket_length(max(len(r) for r in rows), self.buckets), max_length)
        batch = np.full((len(rows), seq), self.pad_id, np.int32)
        mask = np.zeros((len(rows), seq), np.int32)
        for i, ids in enumerate(rows):
            ids = ids[:seq]
            batch[i, : len(ids)] = ids
            mask[i, : len(ids)] = 1
            offs[i] = offs[i][:seq]
        return TokenizedBatch(batch, mask, offs if with_offsets else None)

    @property
    def vocab_size(self) -> int:
        return self._tok.get_vocab_size()

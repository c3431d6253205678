"""Sentence-level neural extractor (legacy qa_model-v1 path).

Parity: reference `extractors.py:230-279` — regex sentence splitting, pack
``[CLS] question [SEP] s1 [SEP] s2 …``, classify each sentence, return
sentences whose relevance probability exceeds the threshold as verbatim
spans. Consumes checkpoints produced by `verbatim_rag_tpu.training.Trainer`.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np

from verbatim_rag_tpu.core.extractors import SpanExtractor

from .config import EncoderConfig, demo_highlighter_config
from .tokenizer import HashTokenizer, Tokenizer

_SENT_RE = re.compile(r"[^.!?\n]+[.!?]?")


def split_sentences(text: str) -> list[tuple[int, int]]:
    """Regex sentence spans (start, end) over the original text."""
    spans = []
    for m in _SENT_RE.finditer(text):
        s, e = m.start(), m.end()
        while s < e and text[s].isspace():
            s += 1
        if e > s:
            spans.append((s, e))
    return spans


class SentenceModelExtractor(SpanExtractor):
    """Classify whole sentences for relevance to the question."""

    def __init__(
        self,
        params: dict[str, Any] | None = None,
        config: EncoderConfig | None = None,
        tokenizer: Tokenizer | None = None,
        checkpoint_dir: str | None = None,
        threshold: float = 0.5,
        max_length: int = 4096,
        max_sentences: int = 64,
        seed: int = 0,
    ):
        from verbatim_rag_tpu.training.model import init_qa_model_params

        self.config = config or demo_highlighter_config()
        self.tokenizer = tokenizer or HashTokenizer(vocab_size=self.config.vocab_size)
        self.threshold = threshold
        self.max_length = max_length
        self.max_sentences = max_sentences
        if params is not None:
            self.params = params
        else:
            self.params = init_qa_model_params(jax.random.PRNGKey(seed), self.config)
            if checkpoint_dir:
                from verbatim_rag_tpu.training.trainer import Trainer

                self.params = Trainer.load_checkpoint(checkpoint_dir, self.params)

    def extract_spans(self, question: str, search_results: list[Any]) -> dict[str, list[str]]:
        from verbatim_rag_tpu.training.dataset import QADatasetEncoder, QADocument, Sentence
        from verbatim_rag_tpu.training.model import predict_sentence_relevance

        import jax.numpy as jnp

        texts = [getattr(r, "text", "") for r in search_results]
        out: dict[str, list[str]] = {t: [] for t in texts}
        # Keep only sentences that tokenize to ≥1 token — QADatasetEncoder
        # silently skips empty-token sentences, which would shift every
        # later boundary/probability off by one against `sentence_spans`
        # (a '---' separator line would absorb the next sentence's score).
        sentence_spans = [
            [
                (s, e)
                for s, e in split_sentences(t)
                if self.tokenizer.tokenize_with_offsets(t[s:e])[0]
            ]
            for t in texts
        ]
        pairs = []
        for text, spans in zip(texts, sentence_spans):
            doc = QADocument(sentences=[Sentence(text=text[s:e]) for s, e in spans])
            pairs.append((question, doc))
        if not pairs:
            return out

        encoder = QADatasetEncoder(
            self.tokenizer, max_length=self.max_length, max_sentences=self.max_sentences
        )
        batch = encoder.encode_pairs(pairs)
        probs = np.asarray(
            predict_sentence_relevance(
                self.params,
                self.config,
                jnp.asarray(batch.input_ids),
                jnp.asarray(batch.attention_mask),
                jnp.asarray(batch.boundaries),
                jnp.asarray(batch.sentence_mask),
            )
        )
        for i, (text, spans) in enumerate(zip(texts, sentence_spans)):
            kept = []
            for j, (s, e) in enumerate(spans[: self.max_sentences]):
                if batch.sentence_mask[i, j] and probs[i, j] >= self.threshold:
                    kept.append(text[s:e])
            out[text] = kept
        return out

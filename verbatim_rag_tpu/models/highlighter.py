"""Neural span extraction: query-conditioned token classification on TPU.

TPU-native rebuild of the reference's `ModelSpanExtractor` highlighter-v2
path (`verbatim_core/extractors.py:57-279`): a token-classification head on
an encoder scores every context token for relevance to the question; char
spans are cut where token probability crosses a threshold, merged across
small gaps, and length-filtered. Defaults reproduce the reference's headline
config: ``threshold=0.2, min_span_chars=30, merge_gap_chars=20,
max_length=8192, doc_stride=256`` (`extractors.py:85-104`).

Long inputs use sliding windows with stride overlap (parity with
`model.process`'s 8192/256 windowing); overlapping token probabilities are
max-aggregated. Windows are batched into ONE device call per document batch
— the window loop is data layout, not Python-per-window forwards.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from verbatim_rag_tpu.core.extractors import SpanExtractor

from .config import EncoderConfig, demo_highlighter_config
from .encoder import _dense, _layer_norm, encoder_forward, init_encoder_params
from .tokenizer import HashTokenizer, Tokenizer

logger = logging.getLogger(__name__)

Params = dict[str, Any]


def init_highlighter_params(key: jax.Array, config: EncoderConfig) -> Params:
    k_enc, k_head = jax.random.split(key)
    params = init_encoder_params(k_enc, config)
    params["classifier"] = {
        "kernel": jax.random.normal(k_head, (config.hidden_size, 2), jnp.float32) * 0.02,
        "bias": jnp.zeros((2,), jnp.float32),
    }
    return params


def _classifier_logits(params: Params, config: EncoderConfig, hidden, dtype):
    """Token-classification head: optional ModernBERT prediction head
    (dense → GELU → LayerNorm, `ModernBertPredictionHead` in HF
    transformers — present in `ModernBertForTokenClassification`
    checkpoints) followed by the 2-label classifier."""
    head = params.get("cls_head")
    if head is not None:
        hidden = _dense(head["dense"], hidden, dtype)
        hidden = jax.nn.gelu(hidden.astype(jnp.float32), approximate=False)
        hidden = _layer_norm(head["norm"], hidden, config.layer_norm_eps)
    return _dense(params["classifier"], hidden, dtype)  # [B, S, 2]


@partial(jax.jit, static_argnames=("config",))
def token_relevance_probs(
    params: Params,
    config: EncoderConfig,
    input_ids: jax.Array,  # [B, S]
    attention_mask: jax.Array,  # [B, S]
) -> jax.Array:
    """P(token is part of an answer span) per token — [B, S] float32."""
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    hidden = encoder_forward(params, config, input_ids, attention_mask)
    logits = _classifier_logits(params, config, hidden, dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., 1]
    return probs * attention_mask.astype(jnp.float32)


@partial(jax.jit, static_argnames=("config", "mesh", "axis"))
def token_relevance_probs_sp(
    params: Params,
    config: EncoderConfig,
    input_ids: jax.Array,  # [B, S] — S sharded over the mesh axis
    attention_mask: jax.Array,
    mesh,
    axis: str = "tp",
) -> jax.Array:
    """Sequence-parallel token scoring: the single-pass long-context path
    (no sliding windows) — ring attention for global layers, halo exchange
    for local layers (`models/encoder.py::encoder_forward_sp`)."""
    from .encoder import encoder_forward_sp

    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    hidden = encoder_forward_sp(params, config, input_ids, attention_mask, mesh, axis=axis)
    logits = _classifier_logits(params, config, hidden, dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., 1]
    return probs * attention_mask.astype(jnp.float32)


def select_spans_from_token_probs(
    probs: np.ndarray,  # [T] per-context-token probabilities
    offsets: list[tuple[int, int]],  # [T] char offsets into the document
    threshold: float = 0.2,
    min_span_chars: int = 30,
    merge_gap_chars: int = 20,
) -> list[tuple[int, int]]:
    """Token probabilities → merged, filtered char spans.

    Post-processing parity with the reference extractor defaults
    (`extractors.py:85-104`): contiguous above-threshold tokens become a
    region; regions whose char gap ≤ ``merge_gap_chars`` merge; regions
    shorter than ``min_span_chars`` are dropped.
    """
    regions: list[list[int]] = []  # [start_char, end_char]
    current: list[int] | None = None
    for p, (start, end) in zip(probs, offsets):
        if end <= start:  # special / empty token
            continue
        if p >= threshold:
            if current is None:
                current = [start, end]
            elif start - current[1] > merge_gap_chars:
                # Char gap between consecutive selected tokens too large.
                regions.append(current)
                current = [start, end]
            else:
                current[1] = max(current[1], end)
        else:
            if current is not None:
                regions.append(current)
                current = None
    if current is not None:
        regions.append(current)

    merged: list[list[int]] = []
    for region in regions:
        if merged and region[0] - merged[-1][1] <= merge_gap_chars:
            merged[-1][1] = max(merged[-1][1], region[1])
        else:
            merged.append(region)

    return [(s, e) for s, e in merged if e - s >= min_span_chars]


class ModelSpanExtractor(SpanExtractor):
    """Drop-in neural extractor backed by the JAX token classifier."""

    def __init__(
        self,
        params: Params | None = None,
        config: EncoderConfig | None = None,
        tokenizer: Tokenizer | None = None,
        model_path: str | None = None,
        threshold: float = 0.2,
        min_span_chars: int = 30,
        merge_gap_chars: int = 20,
        max_length: int = 8192,
        doc_stride: int = 256,
        seed: int = 0,
        sp_mesh=None,
        sp_axis: str = "tp",
    ):
        self.threshold = threshold
        self.min_span_chars = min_span_chars
        self.merge_gap_chars = merge_gap_chars
        self.max_length = max_length
        self.doc_stride = doc_stride
        #: When set, contexts are scored in ONE sequence-sharded pass over
        #: this mesh (no sliding windows) — the SP long-context path.
        self.sp_mesh = sp_mesh
        self.sp_axis = sp_axis

        if model_path is not None:
            from .hf_convert import load_highlighter_checkpoint

            self.params, self.config, self.tokenizer = load_highlighter_checkpoint(model_path)
        else:
            self.config = config or demo_highlighter_config()
            self.params = params or init_highlighter_params(
                jax.random.PRNGKey(seed), self.config
            )
            self.tokenizer = tokenizer or HashTokenizer(vocab_size=self.config.vocab_size)

    # -- SpanExtractor interface ------------------------------------------------

    def extract_spans(self, question: str, search_results: list[Any]) -> dict[str, list[str]]:
        """ALL documents' windows run in ONE device forward — the window loop
        is data layout, never a per-document dispatch."""
        texts = [getattr(r, "text", "") for r in search_results]
        span_lists = self.process_batch(question, texts)
        return {
            text: [text[s:e] for s, e in spans]
            for text, spans in zip(texts, span_lists)
        }

    # -- core ---------------------------------------------------------------------

    def process(self, question: str, context: str) -> list[tuple[int, int]]:
        """Score a (question, context) pair → char spans in ``context``."""
        return self.process_batch(question, [context])[0]

    def extract_spans_multi(
        self, pairs: list[tuple[str, list[Any]]]
    ) -> list[dict[str, list[str]]]:
        """Many (question, results) jobs in ONE device forward.

        The cross-question batching path used by `VerbatimRAG.query_batch` —
        every window of every document of every question lands in the same
        padded batch.
        """
        flat_pairs: list[tuple[str, str]] = []
        shapes: list[list[str]] = []
        for question, results in pairs:
            texts = [getattr(r, "text", "") for r in results]
            shapes.append(texts)
            flat_pairs.extend((question, t) for t in texts)
        span_lists = self._process_pairs(flat_pairs)
        out: list[dict[str, list[str]]] = []
        cursor = 0
        for texts in shapes:
            spans_for_q: dict[str, list[str]] = {}
            for text in texts:
                spans = span_lists[cursor]
                cursor += 1
                spans_for_q[text] = [text[s:e] for s, e in spans]
            out.append(spans_for_q)
        return out

    def process_batch(
        self, question: str, contexts: list[str]
    ) -> list[list[tuple[int, int]]]:
        """Batched scoring: one padded forward over every context's windows."""
        return self._process_pairs([(question, c) for c in contexts])

    def _process_pairs(
        self, pairs: list[tuple[str, str]]
    ) -> list[list[tuple[int, int]]]:
        plans = [self._plan(q, c) for q, c in pairs]
        rows: list[list[int]] = []
        for plan in plans:
            if plan is not None:
                rows.extend(plan["rows"])
        if not rows:
            return [[] for _ in pairs]

        from .tokenizer import bucket_length

        longest = bucket_length(max(len(r) for r in rows))
        seq = longest if self.sp_mesh is not None else min(longest, self.max_length)
        # Bucket the WINDOW-COUNT dimension too: server micro-batches arrive
        # at arbitrary sizes, and an unbucketed row count meant a fresh XLA
        # compile per distinct total (measured: large mixed batches spent
        # more time compiling than scoring). Pad rows are all-pad tokens and
        # are sliced off after the forward.
        n_real = len(rows)
        n_padded = n_real
        for b in (1, 2, 4, 8, 16, 32, 64, 128, 256, 512):
            if b >= n_real:
                n_padded = b
                break
        else:
            n_padded = -(-n_real // 512) * 512
        ids = np.full((n_padded, seq), self.tokenizer.pad_id, np.int32)
        mask = np.zeros((n_padded, seq), np.int32)
        for i, row in enumerate(rows):
            row = row[:seq]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1

        if n_padded > 512:
            # Bound the per-call activation footprint under burst load: a
            # 512-deep request queue draining into one micro-batch must not
            # compile an unboundedly tall forward. n_padded is a multiple of
            # 512 here, so every slice reuses the one [512, seq] executable.
            probs = np.concatenate(
                [
                    self._forward_probs(ids[i : i + 512], mask[i : i + 512])
                    for i in range(0, n_padded, 512)
                ],
                axis=0,
            )
        else:
            probs = self._forward_probs(ids, mask)

        out: list[list[tuple[int, int]]] = []
        cursor = 0
        for plan in plans:
            if plan is None:
                out.append([])
                continue
            n_windows = len(plan["rows"])
            doc_probs = probs[cursor : cursor + n_windows]
            cursor += n_windows
            # Max-aggregate across overlapping windows.
            agg = np.zeros(plan["n_tokens"], np.float32)
            for w, (ctx_start, ctx_len, tok_offset) in enumerate(plan["layout"]):
                window = doc_probs[w, tok_offset : tok_offset + ctx_len]
                agg[ctx_start : ctx_start + ctx_len] = np.maximum(
                    agg[ctx_start : ctx_start + ctx_len], window
                )
            spans = select_spans_from_token_probs(
                agg,
                plan["offsets"],
                threshold=self.threshold,
                min_span_chars=self.min_span_chars,
                merge_gap_chars=self.merge_gap_chars,
            )
            # Hook point for subclasses (sentence snapping): applied HERE so
            # every entry path — process / process_batch / extract_spans /
            # extract_spans_multi — gets the same decode, not just process().
            out.append(self._postprocess_spans(pairs[len(out)][1], spans))
        return out

    def _postprocess_spans(
        self, context: str, spans: list[tuple[int, int]]
    ) -> list[tuple[int, int]]:
        """Subclass decode hook; the base extractor returns spans unchanged."""
        return spans

    def _forward_probs(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """[B, S] padded token ids/mask → [B, S] relevance probabilities.

        The single model-backend seam: everything around it (window planning,
        padded batching, max-aggregation, span decode) is backend-agnostic, so
        an alternate model (e.g. the torch parity run in
        ``benchmarks/quality_torch_parity.py``) only overrides this method.
        """
        if self.sp_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(self.sp_mesh, P(None, self.sp_axis))
            return np.asarray(
                token_relevance_probs_sp(
                    self.params,
                    self.config,
                    jax.device_put(jnp.asarray(ids), shard),
                    jax.device_put(jnp.asarray(mask), shard),
                    self.sp_mesh,
                    axis=self.sp_axis,
                )
            )
        return np.asarray(
            token_relevance_probs(
                self.params, self.config, jnp.asarray(ids), jnp.asarray(mask)
            )
        )

    def _plan(self, question: str, context: str) -> dict | None:
        """Tokenize one document and lay out its windows (host-only work)."""
        if not context.strip():
            return None
        enc = self.tokenizer.encode_batch([context], max_length=10**9, with_offsets=True)
        ctx_ids = [t for t, m in zip(enc.input_ids[0], enc.attention_mask[0]) if m]
        ctx_offsets = enc.offsets[0][: len(ctx_ids)]
        # Strip specials added by encode_batch (offset (0,0) + cls/sep ids at ends).
        ctx = [(int(t), off) for t, off in zip(ctx_ids, ctx_offsets) if off[1] > off[0]]
        if not ctx:
            return None
        ctx_token_ids = [t for t, _ in ctx]
        ctx_token_offsets = [off for _, off in ctx]

        q_enc = self.tokenizer.encode_batch([question], max_length=512)
        q_tokens = [int(t) for t, m in zip(q_enc.input_ids[0], q_enc.attention_mask[0]) if m]
        # Question tokens keep their cls/sep framing; context appended after.
        if self.sp_mesh is not None:
            budget = max(len(ctx_token_ids), 16)  # single window: SP pass
        else:
            budget = max(self.max_length - len(q_tokens) - 1, 16)  # -1: trailing sep

        windows = self._make_windows(len(ctx_token_ids), budget, self.doc_stride)
        sep = self.tokenizer.sep_id
        rows, layout = [], []
        for start, length in windows:
            rows.append(list(q_tokens) + ctx_token_ids[start : start + length] + [sep])
            layout.append((start, length, len(q_tokens)))
        return {
            "rows": rows,
            "layout": layout,
            "n_tokens": len(ctx_token_ids),
            "offsets": ctx_token_offsets,
        }

    @staticmethod
    def _make_windows(n_tokens: int, budget: int, stride: int) -> list[tuple[int, int]]:
        """(start, length) context windows with `stride` overlap."""
        if n_tokens <= budget:
            return [(0, n_tokens)]
        windows = []
        # A budget ≤ stride (tiny max_length vs a long question) cannot honor
        # the requested overlap; clamp the step to keep the loop advancing
        # instead of walking backwards forever.
        step = max(budget - stride, 1)
        start = 0
        while start < n_tokens:
            length = min(budget, n_tokens - start)
            windows.append((start, length))
            if start + length >= n_tokens:
                break
            start += step
        return windows

class SemanticHighlightExtractor(ModelSpanExtractor):
    """Sentence/span-mode adapter (parity surface with the reference's
    Zilliz `SemanticHighlightExtractor`, `extractors.py:282-469`).

    mode="spans" is the native token path; mode="sentences" snaps spans to
    regex sentence boundaries.
    """

    _SENT_RE = None

    def __init__(self, *args, mode: str = "spans", **kwargs):
        if mode not in ("spans", "sentences"):
            raise ValueError(f"mode must be 'spans' or 'sentences', got {mode!r}")
        super().__init__(*args, **kwargs)
        self.mode = mode

    def _postprocess_spans(
        self, context: str, spans: list[tuple[int, int]]
    ) -> list[tuple[int, int]]:
        """Snap spans to sentence boundaries (mode='sentences'). Runs inside
        `_process_pairs`, so every pipeline entry point — extract_spans,
        extract_spans_multi, process_batch, process — applies the mode."""
        if self.mode == "spans" or not spans:
            return spans
        import re

        boundaries = [0]
        for m in re.finditer(r"[.!?]\s+|\n+", context):
            boundaries.append(m.end())
        boundaries.append(len(context))

        snapped = []
        for s, e in spans:
            lo = max(b for b in boundaries if b <= s)
            hi = min(b for b in boundaries if b >= e)
            snapped.append((lo, hi))
        # Merge overlapping sentences.
        merged: list[list[int]] = []
        for s, e in sorted(snapped):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        return [(s, e) for s, e in merged]

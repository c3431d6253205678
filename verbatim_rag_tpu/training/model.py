"""Sentence-relevance classifier (the trainable extractor model).

Parity: reference `extractor_models/model.py` — encoder + per-sentence
mean-pooled representations + linear 2-class head, where the forward takes
token-index sentence boundaries (L59-117).

TPU-first: the reference mean-pools each sentence in a Python loop
(`model.py:79-117`, the survey's flagged HOT loop). Here pooling is a
cumulative-sum gather: ``mean(h[s:e]) = (cumsum[e] - cumsum[s]) / (e - s)``,
one vectorized op for all sentences of all docs — no loops, fixed shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from verbatim_rag_tpu.models.config import EncoderConfig
from verbatim_rag_tpu.models.encoder import _dense, encoder_forward, init_encoder_params

Params = dict[str, Any]


def init_qa_model_params(key: jax.Array, config: EncoderConfig) -> Params:
    k_enc, k_head = jax.random.split(key)
    params = init_encoder_params(k_enc, config)
    params["sentence_classifier"] = {
        "kernel": jax.random.normal(k_head, (config.hidden_size, 2), jnp.float32) * 0.02,
        "bias": jnp.zeros((2,), jnp.float32),
    }
    return params


def sentence_logits(
    params: Params,
    config: EncoderConfig,
    input_ids: jax.Array,  # [B, S]
    attention_mask: jax.Array,  # [B, S]
    boundaries: jax.Array,  # [B, M, 2] token (start, end); end exclusive
    sentence_mask: jax.Array,  # [B, M]
) -> jax.Array:
    """Per-sentence 2-class logits — [B, M, 2]."""
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    hidden = encoder_forward(params, config, input_ids, attention_mask)  # [B, S, H]

    # Sentence mean-pool via prefix sums: one gather per boundary.
    csum = jnp.cumsum(hidden, axis=1)  # [B, S, H]
    csum = jnp.pad(csum, ((0, 0), (1, 0), (0, 0)))  # prefix[0] = 0
    starts = boundaries[..., 0]  # [B, M]
    ends = boundaries[..., 1]
    sums = jnp.take_along_axis(csum, ends[..., None], axis=1) - jnp.take_along_axis(
        csum, starts[..., None], axis=1
    )  # [B, M, H]
    lengths = jnp.maximum((ends - starts)[..., None], 1).astype(jnp.float32)
    means = sums / lengths

    logits = _dense(params["sentence_classifier"], means, dtype)  # [B, M, 2]
    return jnp.where(sentence_mask[..., None] > 0, logits, 0.0)


def sentence_loss(
    params: Params,
    config: EncoderConfig,
    batch: dict[str, jax.Array],
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Masked mean cross-entropy over real sentences + metrics aux."""
    logits = sentence_logits(
        params,
        config,
        batch["input_ids"],
        batch["attention_mask"],
        batch["boundaries"],
        batch["sentence_mask"],
    )
    labels = batch["labels"]
    mask = batch["sentence_mask"].astype(jnp.float32)

    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]  # [B, M]
    denom = jnp.maximum(mask.sum(), 1.0)
    loss = (nll * mask).sum() / denom

    preds = jnp.argmax(logits, axis=-1)
    correct = ((preds == labels) * mask).sum()
    tp = ((preds == 1) & (labels == 1)).astype(jnp.float32) * mask
    fp = ((preds == 1) & (labels == 0)).astype(jnp.float32) * mask
    fn = ((preds == 0) & (labels == 1)).astype(jnp.float32) * mask
    aux = {
        "n_sentences": mask.sum(),
        "n_correct": correct,
        "tp": tp.sum(),
        "fp": fp.sum(),
        "fn": fn.sum(),
    }
    return loss, aux


def token_loss(
    params: Params,
    config: EncoderConfig,
    batch: dict[str, jax.Array],
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Token-classification loss for the v2 highlighter.

    batch: input_ids/attention_mask [B, S], labels [B, S], label_mask [B, S]
    (1 only on context tokens). Uses the same ``classifier`` head layout as
    `models/highlighter.py`, so trained params drop into `ModelSpanExtractor`.
    """
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    hidden = encoder_forward(
        params, config, batch["input_ids"], batch["attention_mask"]
    )
    logits = _dense(params["classifier"], hidden, dtype)  # [B, S, 2]
    labels = batch["labels"]
    mask = batch["label_mask"].astype(jnp.float32)

    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(mask.sum(), 1.0)
    loss = (nll * mask).sum() / denom

    preds = jnp.argmax(logits, axis=-1)
    tp = ((preds == 1) & (labels == 1)).astype(jnp.float32) * mask
    fp = ((preds == 1) & (labels == 0)).astype(jnp.float32) * mask
    fn = ((preds == 0) & (labels == 1)).astype(jnp.float32) * mask
    aux = {
        "n_sentences": mask.sum(),
        "n_correct": ((preds == labels) * mask).sum(),
        "tp": tp.sum(),
        "fp": fp.sum(),
        "fn": fn.sum(),
    }
    return loss, aux


@partial(jax.jit, static_argnames=("config",))
def predict_sentence_relevance(
    params: Params,
    config: EncoderConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    boundaries: jax.Array,
    sentence_mask: jax.Array,
) -> jax.Array:
    """P(sentence relevant) — [B, M] float32 (inference path used by the
    legacy sentence-mode extractor, `extractors.py:230-279`)."""
    logits = sentence_logits(params, config, input_ids, attention_mask, boundaries, sentence_mask)
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., 1]

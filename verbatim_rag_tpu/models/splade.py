"""SPLADE sparse encoder in JAX.

TPU-native replacement for the torch `SpladeProvider`
(`embedding_providers.py:117-169`): encoder → MLM head → per-token vocab
logits → ``log(1 + relu(logit))`` → max over sequence positions → a sparse
vocab-sized vector per text. The reference densifies on the host and
extracts nonzeros; here the whole forward including pooling is one jitted
call, and only the top-``max_nnz`` terms cross back to the host.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from .config import EncoderConfig
from .encoder import _dense, _layer_norm, encoder_forward, init_encoder_params

Params = dict[str, Any]


def init_splade_params(key: jax.Array, config: EncoderConfig) -> Params:
    """Encoder + MLM transform head (dense → gelu → LN → vocab projection).

    The vocab projection is tied to the word-embedding matrix (standard for
    BERT MLM heads) plus an output bias.
    """
    k_enc, k_head = jax.random.split(key)
    params = init_encoder_params(k_enc, config)
    h = config.hidden_size
    params["mlm_head"] = {
        "transform": {
            "kernel": jax.random.normal(k_head, (h, h), jnp.float32) * 0.02,
            "bias": jnp.zeros((h,), jnp.float32),
        },
        "ln": {"scale": jnp.ones((h,), jnp.float32), "bias": jnp.zeros((h,), jnp.float32)},
        "output_bias": jnp.zeros((config.vocab_size,), jnp.float32),
    }
    return params


_SEQ_CHUNK = 32  # vocab-logit chunk along the sequence axis


@partial(jax.jit, static_argnames=("config",))
def splade_forward(
    params: Params,
    config: EncoderConfig,
    input_ids: jax.Array,  # [B, S]
    attention_mask: jax.Array,  # [B, S]
) -> jax.Array:
    """Return sparse activations [B, vocab] (float32, ≥ 0).

    The [B, S, V] MLM logit tensor is never materialized: log1p∘relu and max
    are monotone, so ``max_s log1p(relu(x_s)) = log1p(relu(max_s x_s))`` and
    the vocab projection runs as a running-max scan over sequence chunks —
    peak memory drops from O(S·V) to O(chunk·V) per example.
    """
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    hidden = encoder_forward(params, config, input_ids, attention_mask)
    head = params["mlm_head"]
    x = _dense(head["transform"], hidden, dtype)
    x = jax.nn.gelu(x, approximate=False)
    x = _layer_norm(head["ln"], x, config.layer_norm_eps)  # [B, S, H] f32

    batch, seq, h = x.shape
    chunk = min(_SEQ_CHUNK, seq)
    pad = (-seq) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        attention_mask = jnp.pad(attention_mask, ((0, 0), (0, pad)))
    n_chunks = (seq + pad) // chunk

    w_vocab = params["embeddings"]["word"].T.astype(dtype)  # [H, V]
    bias = head["output_bias"]
    x_chunks = x.reshape(batch, n_chunks, chunk, h).transpose(1, 0, 2, 3)
    m_chunks = attention_mask.reshape(batch, n_chunks, chunk).transpose(1, 0, 2)

    def step(running_max, inputs):
        x_c, m_c = inputs  # [B, chunk, H], [B, chunk]
        logits = (
            jnp.dot(x_c.astype(dtype), w_vocab, preferred_element_type=jnp.float32)
            + bias
        )  # [B, chunk, V]
        logits = jnp.where(m_c[..., None] > 0, logits, -jnp.inf)
        return jnp.maximum(running_max, jnp.max(logits, axis=1)), None

    init = jnp.full((batch, w_vocab.shape[1]), -jnp.inf, jnp.float32)
    vmax, _ = jax.lax.scan(step, init, (x_chunks, m_chunks))
    return jnp.log1p(jax.nn.relu(vmax))


@partial(jax.jit, static_argnames=("config", "max_nnz"))
def splade_topk_terms(
    params: Params,
    config: EncoderConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    max_nnz: int = 128,
) -> tuple[jax.Array, jax.Array]:
    """Sparse encode and keep only the heaviest ``max_nnz`` terms on device.

    :return: (term ids [B, max_nnz], weights [B, max_nnz]); zero-weight slots
        are padding.
    """
    acts = splade_forward(params, config, input_ids, attention_mask)
    weights, ids = jax.lax.top_k(acts, max_nnz)
    ids = jnp.where(weights > 0, ids, 0)
    return ids.astype(jnp.int32), weights

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


@partial(jax.jit, static_argnames=("config",))
def splade_forward(
    params: Params,
    config: EncoderConfig,
    input_ids: jax.Array,  # [B, S]
    attention_mask: jax.Array,  # [B, S]
) -> jax.Array:
    """Return sparse activations [B, vocab] (float32, ≥ 0)."""
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    hidden = encoder_forward(params, config, input_ids, attention_mask)
    head = params["mlm_head"]
    x = _dense(head["transform"], hidden, dtype)
    x = jax.nn.gelu(x, approximate=False)
    x = _layer_norm(head["ln"], x, config.layer_norm_eps)
    logits = (
        jnp.dot(
            x.astype(dtype),
            params["embeddings"]["word"].T.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        + head["output_bias"]
    )  # [B, S, V]
    acts = jnp.log1p(jax.nn.relu(logits))
    acts = acts * attention_mask.astype(jnp.float32)[..., None]
    return jnp.max(acts, axis=1)  # [B, V]


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

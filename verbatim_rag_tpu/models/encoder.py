"""Functional JAX transformer encoder (BERT + ModernBERT families).

TPU-native replacement for the torch encoder forwards behind the reference's
providers/extractors/rerankers (SURVEY.md §2.8). Parameters are a plain
pytree (dict of arrays) — no module framework — so pjit sharding rules,
weight conversion from HF checkpoints, and optax training all operate on the
same structure. Layers are stacked on a leading axis and executed with
`lax.scan` (one compiled layer body regardless of depth — fast compiles,
XLA-friendly).

Numerics: parameters live in float32; matmul inputs are cast to
``config.compute_dtype`` (bfloat16 on TPU) with float32 accumulation;
layernorms and softmax always run in float32.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from .config import EncoderConfig

Params = dict[str, Any]

NEG_INF = -1e30


# -- init ------------------------------------------------------------------------


def _dense_init(key, d_in, d_out, use_bias, scale=0.02):
    kernel = jax.random.normal(key, (d_in, d_out), jnp.float32) * scale
    p = {"kernel": kernel}
    if use_bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _ln_init(dim, use_bias=True):
    p = {"scale": jnp.ones((dim,), jnp.float32)}
    if use_bias:
        p["bias"] = jnp.zeros((dim,), jnp.float32)
    return p


def init_encoder_params(key: jax.Array, config: EncoderConfig) -> Params:
    """Random-init the full encoder parameter tree (HF-convertible layout)."""
    keys = jax.random.split(key, 8)
    h = config.hidden_size
    inter = config.intermediate_size
    wi_out = 2 * inter if config.activation == "geglu" else inter

    embeddings: Params = {
        "word": jax.random.normal(keys[0], (config.vocab_size, h), jnp.float32) * 0.02,
    }
    if config.position_embedding_type == "absolute":
        embeddings["position"] = (
            jax.random.normal(keys[1], (config.max_position_embeddings, h), jnp.float32) * 0.02
        )
    if config.type_vocab_size:
        embeddings["token_type"] = (
            jax.random.normal(keys[2], (config.type_vocab_size, h), jnp.float32) * 0.02
        )
    if config.embedding_norm:
        embeddings["ln"] = _ln_init(h, config.use_bias or config.norm_location == "post")

    def layer_params(k):
        ks = jax.random.split(k, 6)
        return {
            "attn": {
                "q": _dense_init(ks[0], h, h, config.use_bias),
                "k": _dense_init(ks[1], h, h, config.use_bias),
                "v": _dense_init(ks[2], h, h, config.use_bias),
                "o": _dense_init(ks[3], h, h, config.use_bias),
            },
            "attn_ln": _ln_init(h, config.use_bias or config.norm_location == "post"),
            "mlp": {
                "wi": _dense_init(ks[4], h, wi_out, config.use_bias),
                "wo": _dense_init(ks[5], inter, h, config.use_bias),
            },
            "mlp_ln": _ln_init(h, config.use_bias or config.norm_location == "post"),
        }

    layer_keys = jax.random.split(keys[3], config.num_layers)
    per_layer = [layer_params(k) for k in layer_keys]
    # Stack to a leading layer axis for scan.
    layers = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)

    params: Params = {"embeddings": embeddings, "layers": layers}
    if config.final_norm:
        params["final_ln"] = _ln_init(h, config.use_bias)
    return params


# -- primitives -------------------------------------------------------------------


def _dense(p: Params, x: jax.Array, dtype) -> jax.Array:
    y = jnp.dot(x.astype(dtype), p["kernel"].astype(dtype), preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"]
    return y


def _layer_norm(p: Params, x: jax.Array, eps: float) -> jax.Array:
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _rope(x: jax.Array, theta: jax.Array, positions: jax.Array) -> jax.Array:
    """Rotary embedding over head_dim (half-split convention, HF-compatible)."""
    head_dim = x.shape[-1]
    half = head_dim // 2
    freq = positions[:, None].astype(jnp.float32) / (
        theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / head_dim)
    )  # [S, half]
    # Angles in f32, rotation in x's dtype: under bf16 compute the rotated
    # q/k are what autodiff saves, and keeping them (and the multiplies) in
    # bf16 avoids f32 residual stacks in the train step's layer scan.
    cos = jnp.cos(freq).astype(x.dtype)[None, :, None, :]  # [1, S, 1, half]
    sin = jnp.sin(freq).astype(x.dtype)[None, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def _attention(
    q: jax.Array,  # [B, S, H, D]
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,  # [B, 1, S, S] additive
) -> jax.Array:
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    logits = logits + bias
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )


def _mlp(p: Params, x: jax.Array, activation: str, dtype) -> jax.Array:
    up = _dense(p["wi"], x, dtype)
    # The activation runs in compute dtype: autodiff saves the gelu/product
    # operands as residuals, and in f32 the two [B, S, intermediate] stacks
    # are the largest per-layer activation traffic in the train step (~3 ms
    # of the 150M step's dynamic-update-slice time, round-5 trace).
    if activation == "geglu":
        gate, val = jnp.split(up, 2, axis=-1)
        hidden = jax.nn.gelu(gate.astype(dtype), approximate=False) * val.astype(dtype)
    else:
        hidden = jax.nn.gelu(up.astype(dtype), approximate=False)
    return _dense(p["wo"], hidden, dtype)


# -- forward -----------------------------------------------------------------------


def _embed(params: Params, config: EncoderConfig, input_ids, token_type_ids):
    emb = jnp.take(params["embeddings"]["word"], input_ids, axis=0)
    if config.position_embedding_type == "absolute":
        positions = jnp.arange(input_ids.shape[1])
        emb = emb + jnp.take(params["embeddings"]["position"], positions, axis=0)[None]
    if config.type_vocab_size and "token_type" in params["embeddings"]:
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        emb = emb + jnp.take(params["embeddings"]["token_type"], token_type_ids, axis=0)
    if "ln" in params["embeddings"]:
        emb = _layer_norm(params["embeddings"]["ln"], emb, config.layer_norm_eps)
    return emb


def _build_bias(attention_mask, seq_len, is_global, window):
    """Additive attention bias from padding mask + (optionally) local window."""
    pad = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * NEG_INF  # [B,1,1,S]
    idx = jnp.arange(seq_len)
    dist = jnp.abs(idx[:, None] - idx[None, :])  # [S, S]
    local = jnp.where(dist <= window // 2, 0.0, NEG_INF)[None, None, :, :]
    return pad + jnp.where(is_global, 0.0, 1.0) * local


def encoder_forward(
    params: Params,
    config: EncoderConfig,
    input_ids: jax.Array,  # [B, S] int32
    attention_mask: jax.Array,  # [B, S] {0,1}
    token_type_ids: jax.Array | None = None,
) -> jax.Array:
    """Return final hidden states [B, S, hidden] (float32)."""
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    batch, seq_len = input_ids.shape
    heads, head_dim = config.num_heads, config.head_dim

    x = _embed(params, config, input_ids, token_type_ids)

    # Per-layer static metadata as scanned arrays.
    layer_ids = jnp.arange(config.num_layers)
    is_global = (
        jnp.ones((config.num_layers,), bool)
        if config.position_embedding_type != "rope"
        else (layer_ids % config.global_attn_every_n_layers) == 0
    )
    thetas = jnp.where(is_global, config.global_rope_theta, config.local_rope_theta)
    positions = jnp.arange(seq_len)

    pre_ln = config.norm_location == "pre"
    eps = config.layer_norm_eps
    use_rope = config.position_embedding_type == "rope"

    skip_attn_norm = (
        (layer_ids == 0) & config.first_layer_no_attn_norm
        if pre_ln
        else jnp.zeros((config.num_layers,), bool)
    )

    def layer_step(carry, inputs):
        h_in = carry
        layer, g_flag, theta, skip_norm = inputs
        bias = (
            None
            if config.use_flash_attention
            else _build_bias(attention_mask, seq_len, g_flag, config.local_attention_window)
        )

        # Attention block.
        if pre_ln:
            normed = _layer_norm(layer["attn_ln"], h_in, eps)
            a_in = jnp.where(skip_norm, h_in, normed)
        else:
            a_in = h_in
        q = _dense(layer["attn"]["q"], a_in, dtype).reshape(batch, seq_len, heads, head_dim)
        k = _dense(layer["attn"]["k"], a_in, dtype).reshape(batch, seq_len, heads, head_dim)
        v = _dense(layer["attn"]["v"], a_in, dtype).reshape(batch, seq_len, heads, head_dim)
        if use_rope:
            q = _rope(q.astype(dtype), theta, positions)
            k = _rope(k.astype(dtype), theta, positions)
        if config.use_flash_attention:
            from verbatim_rag_tpu.ops.flash_attention import flash_attention

            lengths = jnp.sum(attention_mask, axis=1).astype(jnp.int32)
            qkv = (q.astype(dtype), k.astype(dtype), v.astype(dtype))
            if config.position_embedding_type == "rope":
                ctx = jax.lax.cond(
                    g_flag,
                    lambda ops: flash_attention(*ops, lengths, window=None),
                    lambda ops: flash_attention(
                        *ops, lengths, window=config.local_attention_window
                    ),
                    qkv,
                )
            else:
                ctx = flash_attention(*qkv, lengths, window=None)
        else:
            ctx = _attention(q.astype(dtype), k.astype(dtype), v.astype(dtype), bias)
        attn_out = _dense(layer["attn"]["o"], ctx.reshape(batch, seq_len, -1), dtype)
        h = h_in + attn_out
        if not pre_ln:
            h = _layer_norm(layer["attn_ln"], h, eps)

        # MLP block.
        m_in = _layer_norm(layer["mlp_ln"], h, eps) if pre_ln else h
        mlp_out = _mlp(layer["mlp"], m_in, config.activation, dtype)
        h = h + mlp_out
        if not pre_ln:
            h = _layer_norm(layer["mlp_ln"], h, eps)
        return h, None

    x, _ = jax.lax.scan(layer_step, x, (params["layers"], is_global, thetas, skip_attn_norm))

    if config.final_norm and "final_ln" in params:
        x = _layer_norm(params["final_ln"], x, eps)
    return x.astype(jnp.float32)


def encoder_forward_sp(
    params: Params,
    config: EncoderConfig,
    input_ids: jax.Array,  # [B, S] — S sharded over mesh axis
    attention_mask: jax.Array,
    mesh,
    axis: str = "tp",
) -> jax.Array:
    """Sequence-parallel encoder forward (global-attention models).

    The sequence dimension stays sharded over ``axis`` end to end; attention
    runs as exact ring attention (`ops/ring_attention.py`) so no device ever
    holds the full sequence — the single-pass long-context path that replaces
    the reference's host-side sliding windows (SURVEY.md §5).

    Global layers run as ring attention (full-sequence, exact); ModernBERT's
    local layers exchange only ``window//2`` halo tokens with neighbors
    (`ops/ring_attention.py::halo_attention`). RoPE uses global positions, so
    results match the single-device forward bit-for-role.
    """
    from verbatim_rag_tpu.ops.ring_attention import halo_attention, ring_attention

    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    batch, seq_len = input_ids.shape
    heads, head_dim = config.num_heads, config.head_dim
    lengths = jnp.sum(attention_mask, axis=1).astype(jnp.int32)

    x = _embed(params, config, input_ids, None)
    pre_ln = config.norm_location == "pre"
    eps = config.layer_norm_eps
    use_rope = config.position_embedding_type == "rope"
    positions = jnp.arange(seq_len)

    layer_ids = jnp.arange(config.num_layers)
    is_global = (
        jnp.ones((config.num_layers,), bool)
        if not use_rope
        else (layer_ids % config.global_attn_every_n_layers) == 0
    )
    thetas = jnp.where(is_global, config.global_rope_theta, config.local_rope_theta)
    skip_attn_norm = (
        (layer_ids == 0) & config.first_layer_no_attn_norm
        if pre_ln
        else jnp.zeros((config.num_layers,), bool)
    )
    all_global = not use_rope or config.global_attn_every_n_layers == 1

    def layer_step(carry, inputs):
        h_in = carry
        layer, g_flag, theta, skip_norm = inputs
        if pre_ln:
            normed = _layer_norm(layer["attn_ln"], h_in, eps)
            a_in = jnp.where(skip_norm, h_in, normed)
        else:
            a_in = h_in
        q = _dense(layer["attn"]["q"], a_in, dtype).reshape(batch, seq_len, heads, head_dim)
        k = _dense(layer["attn"]["k"], a_in, dtype).reshape(batch, seq_len, heads, head_dim)
        v = _dense(layer["attn"]["v"], a_in, dtype).reshape(batch, seq_len, heads, head_dim)
        if use_rope:
            q = _rope(q.astype(dtype), theta, positions)
            k = _rope(k.astype(dtype), theta, positions)
        if all_global:
            ctx = ring_attention(q, k, v, lengths, mesh, axis=axis)
        else:
            ctx = jax.lax.cond(
                g_flag,
                lambda ops: ring_attention(*ops, lengths, mesh, axis=axis),
                lambda ops: halo_attention(
                    *ops, lengths, config.local_attention_window, mesh, axis=axis
                ),
                (q, k, v),
            )
        attn_out = _dense(layer["attn"]["o"], ctx.reshape(batch, seq_len, -1), dtype)
        h = h_in + attn_out
        if not pre_ln:
            h = _layer_norm(layer["attn_ln"], h, eps)
        m_in = _layer_norm(layer["mlp_ln"], h, eps) if pre_ln else h
        h = h + _mlp(layer["mlp"], m_in, config.activation, dtype)
        if not pre_ln:
            h = _layer_norm(layer["mlp_ln"], h, eps)
        return h, None

    x, _ = jax.lax.scan(
        layer_step, x, (params["layers"], is_global, thetas, skip_attn_norm)
    )
    if config.final_norm and "final_ln" in params:
        x = _layer_norm(params["final_ln"], x, eps)
    return x.astype(jnp.float32)


# -- pooling heads ------------------------------------------------------------------


def mean_pool(hidden: jax.Array, attention_mask: jax.Array) -> jax.Array:
    """Masked mean over the sequence (sentence-transformers pooling)."""
    mask = attention_mask.astype(jnp.float32)[..., None]
    summed = jnp.sum(hidden * mask, axis=1)
    counts = jnp.maximum(jnp.sum(mask, axis=1), 1e-9)
    return summed / counts


def cls_pool(hidden: jax.Array) -> jax.Array:
    return hidden[:, 0, :]


@partial(jax.jit, static_argnames=("config", "normalize"))
def embed_texts(
    params: Params,
    config: EncoderConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    normalize: bool = True,
) -> jax.Array:
    """Jitted dense-embedding forward: encoder → masked mean → L2 norm."""
    hidden = encoder_forward(params, config, input_ids, attention_mask)
    pooled = mean_pool(hidden, attention_mask)
    if normalize:
        pooled = pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)
    return pooled

"""Pallas flash attention for the encoder stack.

Blockwise attention with online softmax: K/V stream through VMEM in blocks,
softmax statistics (running max + normalizer) live in registers/VMEM, and
the [S, S] score matrix never materializes in HBM — the standard
memory-bound → compute-bound transformation for long-context encoders (the
TPU replacement for the reference's host-side 8192/256 sliding windows,
`extractors.py:103-104`).

Supports the two masks the encoders need:
- padding via per-row valid ``lengths`` (scalar-prefetched);
- ModernBERT local attention: ``window`` (full width) restricts attention to
  ``|i−j| ≤ window//2``; K blocks fully outside the band are skipped, making
  local layers O(S·window).

`flash_attention` dispatches to the kernel on TPU backends and to a jnp
reference elsewhere (CPU tests run the kernel in interpret mode and compare
against the reference).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

DEFAULT_Q_BLOCK = 256
DEFAULT_K_BLOCK = 512


def attention_reference(q, k, v, lengths, window=None):
    """jnp reference: [B, S, H, D] in → [B, S, H, D] out (float32)."""
    seq = q.shape[1]
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    kidx = jnp.arange(seq)
    pad = (kidx[None, :] < lengths[:, None]).astype(jnp.float32)  # [B, S]
    bias = (1.0 - pad)[:, None, None, :] * NEG_INF
    if window is not None:
        dist = jnp.abs(kidx[:, None] - kidx[None, :])
        bias = bias + jnp.where(dist <= window // 2, 0.0, NEG_INF)[None, None, :, :]
    probs = jax.nn.softmax(logits + bias, axis=-1)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(jnp.float32)


def _flash_kernel(
    lengths_ref,  # scalar prefetch: [B*H] int32 (length of this row's batch)
    q_ref,  # [1, q_block, D]
    k_ref,  # [1, S, D]
    v_ref,  # [1, S, D]
    o_ref,  # [1, q_block, D]
    *,
    seq_len: int,
    q_block: int,
    k_block: int,
    window: int | None,
    scale: float,
):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    length = lengths_ref[bh]
    q_start = qi * q_block

    q = q_ref[0].astype(jnp.float32) * scale  # [q_block, D]
    n_k_blocks = pl.cdiv(seq_len, k_block)

    def body(ki, carry):
        acc, m_prev, l_prev = carry
        k_start = ki * k_block
        k_blk = k_ref[0, pl.ds(k_start, k_block), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(k_start, k_block), :].astype(jnp.float32)

        scores = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [q_block, k_block]

        kidx = k_start + jax.lax.broadcasted_iota(jnp.int32, (q_block, k_block), 1)
        mask = kidx < length
        if window is not None:
            qidx = q_start + jax.lax.broadcasted_iota(jnp.int32, (q_block, k_block), 0)
            mask = mask & (jnp.abs(qidx - kidx) <= window // 2)
        scores = jnp.where(mask, scores, NEG_INF)

        m_cur = jnp.maximum(m_prev, jnp.max(scores, axis=1))
        correction = jnp.exp(m_prev - m_cur)
        p = jnp.where(mask, jnp.exp(scores - m_cur[:, None]), 0.0)
        l_cur = l_prev * correction + jnp.sum(p, axis=1)
        acc = acc * correction[:, None] + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_cur, l_cur

    def run_block(ki, carry):
        if window is None:
            return body(ki, carry)
        k_start = ki * k_block
        in_band = jnp.logical_and(
            k_start <= q_start + q_block - 1 + window // 2,
            k_start + k_block - 1 >= q_start - window // 2,
        )
        return jax.lax.cond(in_band, lambda c: body(ki, c), lambda c: c, carry)

    init = (
        jnp.zeros((q_block, q_ref.shape[-1]), jnp.float32),
        jnp.full((q_block,), NEG_INF, jnp.float32),
        jnp.zeros((q_block,), jnp.float32),
    )
    acc, _m, l = jax.lax.fori_loop(0, n_k_blocks, run_block, init)
    o_ref[0] = (acc / jnp.maximum(l, 1e-20)[:, None]).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("window", "q_block", "k_block", "interpret"))
def flash_attention_tpu(
    q: jax.Array,  # [B, S, H, D]
    k: jax.Array,
    v: jax.Array,
    lengths: jax.Array,  # [B] int32 valid lengths
    window: int | None = None,
    q_block: int = DEFAULT_Q_BLOCK,
    k_block: int = DEFAULT_K_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    batch, orig_seq, heads, head_dim = q.shape
    q_block = min(q_block, orig_seq)
    k_block = min(k_block, orig_seq)
    scale = 1.0 / (head_dim**0.5)

    # Pad the sequence to a common block multiple: the in-kernel `pl.ds`
    # K-slices must never run off the array (OOB dynamic slices clamp and
    # would silently misalign the mask). lcm, not max: with q_block=512,
    # k_block=384, max would pad to 512 and the second K-slice would clamp.
    unit = math.lcm(q_block, k_block)
    seq = ((orig_seq + unit - 1) // unit) * unit
    if seq != orig_seq:
        pad = ((0, 0), (0, seq - orig_seq), (0, 0), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    # Fold heads into the grid; each program handles one (b, h) row.
    qbh = jnp.moveaxis(q, 2, 1).reshape(batch * heads, seq, head_dim)
    kbh = jnp.moveaxis(k, 2, 1).reshape(batch * heads, seq, head_dim)
    vbh = jnp.moveaxis(v, 2, 1).reshape(batch * heads, seq, head_dim)
    lengths_bh = jnp.repeat(lengths.astype(jnp.int32), heads)

    kernel = partial(
        _flash_kernel,
        seq_len=seq,
        q_block=q_block,
        k_block=k_block,
        window=window,
        scale=scale,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch * heads, pl.cdiv(seq, q_block)),
            in_specs=[
                pl.BlockSpec((1, q_block, head_dim), lambda bh, qi, *_: (bh, qi, 0)),
                pl.BlockSpec((1, seq, head_dim), lambda bh, qi, *_: (bh, 0, 0)),
                pl.BlockSpec((1, seq, head_dim), lambda bh, qi, *_: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, q_block, head_dim), lambda bh, qi, *_: (bh, qi, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(qbh.shape, q.dtype),
        interpret=interpret,
    )(lengths_bh, qbh, kbh, vbh)

    result = jnp.moveaxis(out.reshape(batch, heads, seq, head_dim), 1, 2)
    return result[:, :orig_seq]


def _flash_dispatch(q, k, v, lengths, window):
    """Backend dispatch: Pallas kernel on TPU, jnp reference elsewhere."""
    platform = jax.devices()[0].platform
    if platform in ("tpu", "axon") and q.shape[1] % 128 == 0:
        return flash_attention_tpu(q, k, v, lengths, window=window)
    return attention_reference(q, k, v, lengths, window)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    lengths: jax.Array,
    window: int | None = None,
) -> jax.Array:
    """Flash attention with a training path.

    Forward runs the Pallas kernel (TPU) or the jnp reference (elsewhere);
    `pallas_call` has no JVP rule, so the backward is defined explicitly: it
    recomputes attention with the jnp reference and lets JAX derive the
    gradient — the standard recompute-in-backward trade (forward activations
    stay VMEM-resident; the backward materializes block scores only while
    differentiating, i.e. during training).
    """
    return _flash_dispatch(q, k, v, lengths, window)


def _flash_fwd(q, k, v, lengths, window):
    return _flash_dispatch(q, k, v, lengths, window), (q, k, v, lengths)


def _flash_bwd(window, residuals, g):
    import numpy as np

    q, k, v, lengths = residuals
    _, vjp = jax.vjp(
        lambda q_, k_, v_: attention_reference(q_, k_, v_, lengths, window), q, k, v
    )
    dq, dk, dv = vjp(g.astype(jnp.float32))
    # lengths is integral — its cotangent is float0 by convention.
    return dq, dk, dv, np.zeros(lengths.shape, dtype=jax.dtypes.float0)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# -- partial (unnormalized) kernel for ring attention --------------------------------


def _flash_partial_kernel(
    lengths_ref,  # scalar prefetch: [B*H] int32
    koff_ref,  # scalar prefetch: [1] int32 — global position of KV block start
    q_ref,  # [1, q_block, D]
    k_ref,  # [1, Sk, D]
    v_ref,  # [1, Sk, D]
    o_ref,  # [1, q_block, D] f32 — UNnormalized numerator
    m_ref,  # [1, q_block, 128] f32 — running max (lane-broadcast tile)
    l_ref,  # [1, q_block, 128] f32 — denominator (lane-broadcast tile)
    *,
    kv_len: int,
    kv_valid: int,
    q_block: int,
    k_block: int,
    scale: float,
):
    bh = pl.program_id(0)
    length = lengths_ref[bh]
    k_offset = koff_ref[0]

    q = q_ref[0].astype(jnp.float32) * scale
    n_k_blocks = pl.cdiv(kv_len, k_block)

    def body(ki, carry):
        acc, m_prev, l_prev = carry
        k_start = ki * k_block
        k_blk = k_ref[0, pl.ds(k_start, k_block), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(k_start, k_block), :].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        local_idx = k_start + jax.lax.broadcasted_iota(jnp.int32, (q_block, k_block), 1)
        mask = (local_idx < kv_valid) & (k_offset + local_idx < length)
        scores = jnp.where(mask, scores, NEG_INF)

        m_cur = jnp.maximum(m_prev, jnp.max(scores, axis=1))
        correction = jnp.exp(m_prev - m_cur)
        p = jnp.where(mask, jnp.exp(scores - m_cur[:, None]), 0.0)
        l_cur = l_prev * correction + jnp.sum(p, axis=1)
        acc = acc * correction[:, None] + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_cur, l_cur

    init = (
        jnp.zeros((q_block, q_ref.shape[-1]), jnp.float32),
        jnp.full((q_block,), NEG_INF, jnp.float32),
        jnp.zeros((q_block,), jnp.float32),
    )
    acc, m, l = jax.lax.fori_loop(0, n_k_blocks, body, init)
    o_ref[0] = acc
    # m/l are per-query scalars; stored lane-broadcast so the output tile
    # satisfies the TPU (8, 128) tiling rules (cost: 128 KB/tile of writes).
    m_ref[0] = jnp.broadcast_to(m[:, None], (m.shape[0], 128))
    l_ref[0] = jnp.broadcast_to(l[:, None], (l.shape[0], 128))


def _partial_reference(q, k, v, lengths, k_offset):
    """jnp math of one KV block's unnormalized contribution — the VJP
    target for `flash_attention_partial` (matches the kernel's outputs)."""
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    logits = (
        jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    )
    k_idx = k_offset + jnp.arange(k.shape[1])
    valid = k_idx[None, :] < lengths[:, None]
    logits = jnp.where(valid[:, None, None, :], logits, NEG_INF)
    m = jnp.max(logits, axis=-1)  # [B, H, Sq]
    p = jnp.where(valid[:, None, None, :], jnp.exp(logits - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    numer = jnp.einsum(
        "bhqk,bkhd->bqhd", p, v.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    return numer, m, l


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_attention_partial(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    lengths: jax.Array,
    k_offset: jax.Array,
    q_block: int = DEFAULT_Q_BLOCK,
    k_block: int = DEFAULT_K_BLOCK,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Differentiable wrapper: Pallas forward, reference-derived backward —
    the long-context SP/ring path is trainable (pallas_call has no JVP)."""
    return _flash_partial_impl(q, k, v, lengths, k_offset, q_block, k_block, interpret)


def _flash_partial_fwd(q, k, v, lengths, k_offset, q_block, k_block, interpret):
    out = _flash_partial_impl(q, k, v, lengths, k_offset, q_block, k_block, interpret)
    return out, (q, k, v, lengths, k_offset)


def _flash_partial_bwd(q_block, k_block, interpret, residuals, cotangents):
    import numpy as np

    q, k, v, lengths, k_offset = residuals
    g_numer, g_m, g_l = cotangents
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _partial_reference(q_, k_, v_, lengths, k_offset), q, k, v
    )
    dq, dk, dv = vjp(
        (
            g_numer.astype(jnp.float32),
            g_m.astype(jnp.float32),
            g_l.astype(jnp.float32),
        )
    )
    f0 = lambda a: np.zeros(np.shape(a), dtype=jax.dtypes.float0)  # noqa: E731
    return dq, dk, dv, f0(lengths), f0(k_offset)


flash_attention_partial.defvjp(_flash_partial_fwd, _flash_partial_bwd)


@partial(jax.jit, static_argnames=("q_block", "k_block", "interpret"))
def _flash_partial_impl(
    q: jax.Array,  # [B, Sq, H, D]
    k: jax.Array,  # [B, Sk, H, D] — ONE KV block of a longer sequence
    v: jax.Array,
    lengths: jax.Array,  # [B] int32 — GLOBAL valid lengths
    k_offset: jax.Array,  # scalar int32 — global position of k[:, 0]
    q_block: int = DEFAULT_Q_BLOCK,
    k_block: int = DEFAULT_K_BLOCK,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One KV block's flash contribution WITHOUT final normalization.

    Returns (numerator [B, Sq, H, D] f32, max [B, H, Sq] f32, denom
    [B, H, Sq] f32) — the online-softmax partial state `ring_attention`
    merges across ring steps, so the [Sq, Sk] score matrix of each step
    stays in VMEM (VERDICT.md round-1 #6: the ring path previously
    materialized [B, H, Sq, Sk] logits per block in HBM).
    """
    batch, sq, heads, head_dim = q.shape
    sk = k.shape[1]
    scale = 1.0 / (head_dim**0.5)
    q_block = min(q_block, sq)
    k_block = min(k_block, sk)

    sq_pad = ((sq + q_block - 1) // q_block) * q_block
    sk_pad = ((sk + k_block - 1) // k_block) * k_block
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0), (0, 0)))
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_pad - sk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_pad - sk), (0, 0), (0, 0)))

    qbh = jnp.moveaxis(q, 2, 1).reshape(batch * heads, sq_pad, head_dim)
    kbh = jnp.moveaxis(k, 2, 1).reshape(batch * heads, sk_pad, head_dim)
    vbh = jnp.moveaxis(v, 2, 1).reshape(batch * heads, sk_pad, head_dim)
    lengths_bh = jnp.repeat(lengths.astype(jnp.int32), heads)
    koff = jnp.asarray(k_offset, jnp.int32).reshape(1)

    kernel = partial(
        _flash_partial_kernel,
        kv_len=sk_pad,
        kv_valid=sk,
        q_block=q_block,
        k_block=k_block,
        scale=scale,
    )
    numer, m, l = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(batch * heads, pl.cdiv(sq_pad, q_block)),
            in_specs=[
                pl.BlockSpec((1, q_block, head_dim), lambda bh, qi, *_: (bh, qi, 0)),
                pl.BlockSpec((1, sk_pad, head_dim), lambda bh, qi, *_: (bh, 0, 0)),
                pl.BlockSpec((1, sk_pad, head_dim), lambda bh, qi, *_: (bh, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, q_block, head_dim), lambda bh, qi, *_: (bh, qi, 0)),
                pl.BlockSpec((1, q_block, 128), lambda bh, qi, *_: (bh, qi, 0)),
                pl.BlockSpec((1, q_block, 128), lambda bh, qi, *_: (bh, qi, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((batch * heads, sq_pad, head_dim), jnp.float32),
            jax.ShapeDtypeStruct((batch * heads, sq_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((batch * heads, sq_pad, 128), jnp.float32),
        ],
        # The lane-broadcast m/l tiles push the working set slightly past the
        # conservative 16 MB scoped-VMEM default; v5e has 128 MB physical.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(lengths_bh, koff, qbh, kbh, vbh)

    numer = jnp.moveaxis(numer.reshape(batch, heads, sq_pad, head_dim), 1, 2)[:, :sq]
    m = m[..., 0].reshape(batch, heads, sq_pad)[:, :, :sq]
    l = l[..., 0].reshape(batch, heads, sq_pad)[:, :, :sq]
    return numer, m, l

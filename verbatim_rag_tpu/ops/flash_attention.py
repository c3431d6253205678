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
    lse_ref=None,  # [1, q_block, 128] f32 — logsumexp, lane-broadcast (training)
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
    acc, m, l = jax.lax.fori_loop(0, n_k_blocks, run_block, init)
    o_ref[0] = (acc / jnp.maximum(l, 1e-20)[:, None]).astype(o_ref.dtype)
    if lse_ref is not None:
        # Fully-masked rows (length 0, or every key outside the band) have
        # l == 0 and m == NEG_INF; any finite stand-in works — the backward
        # masks those entries before use, the guard just keeps exp() finite.
        lse = jnp.where(l > 0, m + jnp.log(jnp.maximum(l, 1e-38)), 0.0)
        lse_ref[0] = jnp.broadcast_to(lse[:, None], (q_block, 128))


def _pad_fold(q, k, v, q_block, k_block):
    """Pad S to the block lcm and fold heads into the leading grid axis."""
    batch, orig_seq, heads, head_dim = q.shape
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
    fold = lambda x: jnp.moveaxis(x, 2, 1).reshape(batch * heads, seq, head_dim)  # noqa: E731
    return fold(q), fold(k), fold(v), seq


def _flash_forward(q, k, v, lengths, window, q_block, k_block, interpret, with_lse):
    batch, orig_seq, heads, head_dim = q.shape
    q_block = min(q_block, orig_seq)
    k_block = min(k_block, orig_seq)
    scale = 1.0 / (head_dim**0.5)

    qbh, kbh, vbh, seq = _pad_fold(q, k, v, q_block, k_block)
    lengths_bh = jnp.repeat(lengths.astype(jnp.int32), heads)

    kernel = partial(
        _flash_kernel,
        seq_len=seq,
        q_block=q_block,
        k_block=k_block,
        window=window,
        scale=scale,
    )

    out_specs = pl.BlockSpec((1, q_block, head_dim), lambda bh, qi, *_: (bh, qi, 0))
    out_shape = jax.ShapeDtypeStruct(qbh.shape, q.dtype)
    if with_lse:
        out_specs = [
            out_specs,
            pl.BlockSpec((1, q_block, 128), lambda bh, qi, *_: (bh, qi, 0)),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((batch * heads, seq, 128), jnp.float32),
        ]

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
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(lengths_bh, qbh, kbh, vbh)

    if with_lse:
        out, lse = out
        lse = lse[..., 0].reshape(batch, heads, seq)[:, :, :orig_seq]  # [B, H, S]
    result = jnp.moveaxis(out.reshape(batch, heads, seq, head_dim), 1, 2)[:, :orig_seq]
    return (result, lse) if with_lse else result


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
    return _flash_forward(
        q, k, v, lengths, window, q_block, k_block, interpret, with_lse=False
    )


@partial(jax.jit, static_argnames=("window", "q_block", "k_block", "interpret"))
def flash_attention_tpu_lse(
    q: jax.Array,  # [B, S, H, D]
    k: jax.Array,
    v: jax.Array,
    lengths: jax.Array,
    window: int | None = None,
    q_block: int = DEFAULT_Q_BLOCK,
    k_block: int = DEFAULT_K_BLOCK,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Forward + per-row logsumexp ([B, H, S] f32) — the training residual
    the Pallas backward needs (FlashAttention-2 recomputes p from q·kᵀ and
    lse instead of saving the [S, S] probability matrix)."""
    return _flash_forward(
        q, k, v, lengths, window, q_block, k_block, interpret, with_lse=True
    )


# -- backward kernels (FlashAttention-2 style) ---------------------------------------
#
# The backward recomputes attention probabilities blockwise from q·kᵀ and the
# saved logsumexp, so the [S, S] probability/score matrices never touch HBM —
# the round-5 train-step trace attributed ~8 ms/step (150M, B=8, S=512) to the
# previous reference-recompute backward materializing f32 [B, H, S, S] tensors
# (benchmarks/analyze_train_trace.py). delta = rowsum(dO ∘ O) is computed in
# XLA outside (one cheap fused reduce); lse/delta enter lane-broadcast
# ([BH, S, 128]) to satisfy the (8, 128) tiling rules, same trick as the ring
# partial kernel above.


def _flash_bwd_dq_kernel(
    lengths_ref,  # scalar prefetch: [B*H] int32
    q_ref,  # [1, q_block, D]
    do_ref,  # [1, q_block, D]
    lse_ref,  # [1, q_block, 128] f32 lane-broadcast
    delta_ref,  # [1, q_block, 128] f32 lane-broadcast
    k_ref,  # [1, S, D]
    v_ref,  # [1, S, D]
    dq_ref,  # [1, q_block, D] f32
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

    q = q_ref[0].astype(jnp.float32)  # [q_block, D]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]  # [q_block, 1]
    delta = delta_ref[0][:, :1]
    n_k_blocks = pl.cdiv(seq_len, k_block)

    def body(ki, acc):
        k_start = ki * k_block
        k_blk = k_ref[0, pl.ds(k_start, k_block), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(k_start, k_block), :].astype(jnp.float32)
        s = (
            jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )  # [q_block, k_block]
        kidx = k_start + jax.lax.broadcasted_iota(jnp.int32, (q_block, k_block), 1)
        mask = kidx < length
        if window is not None:
            qidx = q_start + jax.lax.broadcasted_iota(jnp.int32, (q_block, k_block), 0)
            mask = mask & (jnp.abs(qidx - kidx) <= window // 2)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale
        return acc + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    def run_block(ki, acc):
        if window is None:
            return body(ki, acc)
        k_start = ki * k_block
        in_band = jnp.logical_and(
            k_start <= q_start + q_block - 1 + window // 2,
            k_start + k_block - 1 >= q_start - window // 2,
        )
        return jax.lax.cond(in_band, lambda a: body(ki, a), lambda a: a, acc)

    acc = jax.lax.fori_loop(
        0, n_k_blocks, run_block, jnp.zeros((q_block, q_ref.shape[-1]), jnp.float32)
    )
    dq_ref[0] = acc


def _flash_bwd_dkv_kernel(
    lengths_ref,  # scalar prefetch: [B*H] int32
    q_ref,  # [1, q_block, D]
    do_ref,  # [1, q_block, D]
    lse_ref,  # [1, q_block, 128] f32 lane-broadcast
    delta_ref,  # [1, q_block, 128] f32 lane-broadcast
    k_ref,  # [1, k_block, D]
    v_ref,  # [1, k_block, D]
    dk_ref,  # [1, k_block, D] f32 — accumulated across the qi grid dim
    dv_ref,  # [1, k_block, D] f32
    *,
    q_block: int,
    k_block: int,
    window: int | None,
    scale: float,
):
    # Grid: (BH, ki, qi) with qi the REDUCTION dim — dk/dv blocks are indexed
    # by (bh, ki) only, so Mosaic keeps them VMEM-resident across qi steps and
    # per-step VMEM stays block-sized regardless of S (the full-seq-refs
    # variant scope-OOM'd at S=8192: lane-broadcast lse/delta alone were 8 MB).
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    length = lengths_ref[bh]
    k_start = ki * k_block
    q_start = qi * q_block

    @pl.when(qi == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    in_band = (
        jnp.bool_(True)
        if window is None
        else jnp.logical_and(
            q_start <= k_start + k_block - 1 + window // 2,
            q_start + q_block - 1 >= k_start - window // 2,
        )
    )

    @pl.when(in_band)
    def _compute():
        k_blk = k_ref[0].astype(jnp.float32)  # [k_block, D]
        v_blk = v_ref[0].astype(jnp.float32)
        q_blk = q_ref[0].astype(jnp.float32)  # [q_block, D]
        do_blk = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0][:, :1]  # [q_block, 1]
        delta = delta_ref[0][:, :1]
        s = (
            jax.lax.dot_general(
                q_blk, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )  # [q_block, k_block]
        kidx = k_start + jax.lax.broadcasted_iota(jnp.int32, (q_block, k_block), 1)
        mask = kidx < length
        if window is not None:
            qidx = q_start + jax.lax.broadcasted_iota(jnp.int32, (q_block, k_block), 0)
            mask = mask & (jnp.abs(qidx - kidx) <= window // 2)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do_blk, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale
        # pᵀ·dO and dsᵀ·q via contracting dim 0 — no explicit transposes.
        dv_ref[0] += jax.lax.dot_general(
            p, do_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk_ref[0] += jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )


@partial(jax.jit, static_argnames=("window", "q_block", "k_block", "interpret"))
def flash_attention_bwd_tpu(
    q: jax.Array,  # [B, S, H, D]
    k: jax.Array,
    v: jax.Array,
    lengths: jax.Array,  # [B] int32
    out: jax.Array,  # [B, S, H, D] — forward output (for delta)
    lse: jax.Array,  # [B, H, S] f32 — forward logsumexp
    g: jax.Array,  # [B, S, H, D] — output cotangent
    window: int | None = None,
    q_block: int = DEFAULT_Q_BLOCK,
    k_block: int = DEFAULT_K_BLOCK,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Pallas flash backward: (dq, dk, dv) without materializing [S, S]."""
    batch, orig_seq, heads, head_dim = q.shape
    q_block = min(q_block, orig_seq)
    k_block = min(k_block, orig_seq)
    scale = 1.0 / (head_dim**0.5)

    # delta[b, h, s] = Σ_d dO ∘ O — one fused XLA reduce, [B, S, H] → [B, H, S].
    delta = jnp.moveaxis(
        jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1), 2, 1
    )

    qbh, kbh, vbh, seq = _pad_fold(q, k, v, q_block, k_block)
    dobh = _pad_fold(g, g, g, q_block, k_block)[0]
    lengths_bh = jnp.repeat(lengths.astype(jnp.int32), heads)

    def fold_rows(x):  # [B, H, S_orig] f32 → lane-broadcast [BH, S_pad, 128]
        x = x.reshape(batch * heads, orig_seq)
        if seq != orig_seq:
            x = jnp.pad(x, ((0, 0), (0, seq - orig_seq)))
        return jnp.broadcast_to(x[:, :, None], (batch * heads, seq, 128))

    lse_b = fold_rows(lse.astype(jnp.float32))
    delta_b = fold_rows(delta)

    row_spec = lambda blk: pl.BlockSpec(  # noqa: E731
        (1, blk, head_dim), lambda bh, i, *_: (bh, i, 0)
    )
    full_spec = pl.BlockSpec((1, seq, head_dim), lambda bh, i, *_: (bh, 0, 0))
    stat_blk_spec = lambda blk: pl.BlockSpec(  # noqa: E731
        (1, blk, 128), lambda bh, i, *_: (bh, i, 0)
    )

    dq = pl.pallas_call(
        partial(
            _flash_bwd_dq_kernel,
            seq_len=seq,
            q_block=q_block,
            k_block=k_block,
            window=window,
            scale=scale,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch * heads, pl.cdiv(seq, q_block)),
            in_specs=[
                row_spec(q_block),
                row_spec(q_block),
                stat_blk_spec(q_block),
                stat_blk_spec(q_block),
                full_spec,
                full_spec,
            ],
            out_specs=row_spec(q_block),
        ),
        out_shape=jax.ShapeDtypeStruct(qbh.shape, jnp.float32),
        interpret=interpret,
    )(lengths_bh, qbh, dobh, lse_b, delta_b, kbh, vbh)

    # dkv: 3D grid, qi innermost as a reduction dim (dk/dv block index is
    # constant over qi → accumulated in VMEM). q/do/lse/delta stream in
    # q_block-sized tiles, so the kernel scales to long sequences.
    qi_spec = lambda blk: pl.BlockSpec(  # noqa: E731
        (1, blk, head_dim), lambda bh, ki, qi, *_: (bh, qi, 0)
    )
    stat_qi_spec = pl.BlockSpec((1, q_block, 128), lambda bh, ki, qi, *_: (bh, qi, 0))
    ki_spec = pl.BlockSpec((1, k_block, head_dim), lambda bh, ki, qi, *_: (bh, ki, 0))
    dk, dv = pl.pallas_call(
        partial(
            _flash_bwd_dkv_kernel,
            q_block=q_block,
            k_block=k_block,
            window=window,
            scale=scale,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch * heads, pl.cdiv(seq, k_block), pl.cdiv(seq, q_block)),
            in_specs=[
                qi_spec(q_block),
                qi_spec(q_block),
                stat_qi_spec,
                stat_qi_spec,
                ki_spec,
                ki_spec,
            ],
            out_specs=[
                pl.BlockSpec((1, k_block, head_dim), lambda bh, ki, qi, *_: (bh, ki, 0)),
                pl.BlockSpec((1, k_block, head_dim), lambda bh, ki, qi, *_: (bh, ki, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(kbh.shape, jnp.float32),
            jax.ShapeDtypeStruct(kbh.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(lengths_bh, qbh, dobh, lse_b, delta_b, kbh, vbh)

    def unfold(x, dtype):
        x = jnp.moveaxis(x.reshape(batch, heads, seq, head_dim), 1, 2)[:, :orig_seq]
        return x.astype(dtype)

    return unfold(dq, q.dtype), unfold(dk, k.dtype), unfold(dv, v.dtype)


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
    `pallas_call` has no JVP rule, so the backward is defined explicitly:

    - seq < FLASH_BWD_MIN_SEQ: the jnp reference's derived VJP. At S=512
      XLA's batched-matmul softmax backward runs AT roofline and overlaps
      with the rest of the step — the Pallas backward measured 14 ms SLOWER
      per 150M train step (69.9 vs 55.9 ms module wall, round 5), the same
      opaque-custom-call tax the serving section kernel pays.
    - seq ≥ FLASH_BWD_MIN_SEQ: the Pallas FlashAttention-2 backward
      (blockwise recompute from q·kᵀ + saved logsumexp — the [S, S]
      matrices never touch HBM). The reference VJP materializes
      [B, H, S, S] f32, which is 25 GB at S=8192: long-context training
      is only possible on this path.
    """
    return _flash_dispatch(q, k, v, lengths, window)


#: Sequence length at which the training backward switches from the XLA
#: reference VJP (faster at short seq, measured round 5) to the Pallas
#: flash backward (the only path whose memory doesn't scale with S²).
FLASH_BWD_MIN_SEQ = 1024


def _flash_fwd(q, k, v, lengths, window):
    platform = jax.devices()[0].platform
    if (
        platform in ("tpu", "axon")
        and q.shape[1] % 128 == 0
        and q.shape[1] >= FLASH_BWD_MIN_SEQ
    ):
        out, lse = flash_attention_tpu_lse(q, k, v, lengths, window=window)
        return out, (q, k, v, lengths, out, lse)
    return _flash_dispatch(q, k, v, lengths, window), (q, k, v, lengths, None, None)


def _flash_bwd(window, residuals, g):
    import numpy as np

    q, k, v, lengths, out, lse = residuals
    if lse is not None:
        dq, dk, dv = flash_attention_bwd_tpu(q, k, v, lengths, out, lse, g, window)
    else:
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

"""Dense brute-force retrieval: tiled matmul + top-k.

TPU-native replacement for the reference's Milvus `IVF_FLAT` / COSINE index
(`vector_stores/milvus_local.py:111-117`). On TPU, exact brute-force over an
HBM-resident `[N, d]` matrix is a single MXU-bound matmul — at 1M×384 the
scan is HBM-bandwidth-bound (~1ms/batch on v5e) and *exact*, so recall@k
equals ground truth by construction (beats IVF_FLAT's approximate recall at
equal memory).

Design rules: corpus stored row-normalized in bfloat16 (cosine ≡ dot),
queries normalized at encode time, accumulation in float32
(`preferred_element_type`), static `k`, invalid rows masked to -inf before
`lax.top_k`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Plain float, NOT a jnp scalar: a module-level jnp constant would
# initialize JAX backends at import time, which breaks
# `jax.distributed.initialize` (it must run before backend init).
NEG_INF = -1e30


def normalize_rows(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along the last axis (float32 math)."""
    x = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


def quantize_rows_int8(x) -> tuple:
    """Symmetric per-row int8 quantization: ``x ≈ q * scale``.

    The capacity mode for the dense index: int8 rows halve HBM vs bf16
    (2x corpus per chip) and score ~1.3x faster — the [B,d]x[d,N] matmul
    runs on the MXU's int8 path at [512, 1M] on v5e (4.2 vs 5.4 ms/batch).
    Works on np or jnp inputs; returns (int8 [N, d], f32 scales [N, 1]).
    """
    import numpy as np

    xp = np if isinstance(x, np.ndarray) else jnp
    x = x.astype(xp.float32)
    scale = xp.clip(xp.max(xp.abs(x), axis=-1, keepdims=True) / 127.0, 1e-12, None)
    q = xp.clip(xp.round(x / scale), -127, 127).astype(xp.int8)
    return q, scale.astype(xp.float32)


class Int4Rows(NamedTuple):
    """Row matrix quantized to 4 bits, two codes per int8 byte.

    The deepest capacity mode: 4× fewer resident HBM bytes than bf16 (2×
    below int8). Byte ``j`` of a row packs column ``j`` in its low
    nibble and column ``j + d/2`` in its high nibble (a HALF-SPLIT
    layout: unpacking is two shifts and a lane-concat — no interleave
    relayout, in XLA or inside a Pallas kernel). Codes are symmetric in
    [-7, 7] with a per-row f32 scale. A NamedTuple so it flows through
    jit as a pytree and scoring code can isinstance-dispatch on it.
    """

    packed: jax.Array  # [N, d//2] int8
    scale: jax.Array  # [N, 1] f32

    @property
    def shape(self) -> tuple[int, int]:
        return (self.packed.shape[0], self.packed.shape[1] * 2)


def quantize_rows_int4(x) -> Int4Rows:
    """Symmetric per-row int4 quantization, packed two codes per byte.

    Works on np or jnp inputs; the packed array is int8 (`x ≈ unpack(q) *
    scale`). The column count must be even (encoder dims are).
    """
    import numpy as np

    xp = np if isinstance(x, np.ndarray) else jnp
    x = x.astype(xp.float32)
    if x.shape[-1] % 2:
        raise ValueError(f"int4 packing needs an even column count, got {x.shape}")
    half = x.shape[-1] // 2
    scale = xp.clip(xp.max(xp.abs(x), axis=-1, keepdims=True) / 7.0, 1e-12, None)
    codes = xp.clip(xp.round(x / scale), -7, 7).astype(xp.int8)
    lo = codes[..., :half] & 0xF
    hi = codes[..., half:] & 0xF
    packed = (lo | (hi << 4)).astype(xp.int8)
    return Int4Rows(packed, scale.astype(xp.float32))


def unpack_int4(packed: jax.Array) -> jax.Array:
    """[N, d//2] packed bytes → [N, d] int8 codes in [-7, 7].

    Arithmetic shifts sign-extend the nibbles ((b << 4) >> 4 for the low
    one); the half-split layout restores column order with a concat.
    """
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    return jnp.concatenate([lo, hi], axis=-1)


def dense_scores(
    corpus,  # [N, d] row-normalized bf16/f32, int8 (quantized), or Int4Rows
    queries: jax.Array,  # [B, d] row-normalized f32
    corpus_scale: jax.Array | None = None,  # [N, 1] f32 — required for int8
) -> jax.Array:
    """[B, N] cosine scores. For an int8/int4 corpus the queries are
    quantized per-row on the fly so the matmul takes the MXU int8 path,
    then scores are rescaled to approximate cosine
    (`score = (qi . ci) * sq * sc`)."""
    if isinstance(corpus, Int4Rows):
        qi, q_scale = quantize_rows_int8(queries)
        codes = unpack_int4(corpus.packed)
        raw = jnp.dot(qi, codes.T, preferred_element_type=jnp.int32)
        return raw.astype(jnp.float32) * (q_scale * corpus.scale.T)
    if corpus.dtype == jnp.int8:
        if corpus_scale is None:
            raise ValueError("int8 corpus requires corpus_scale")
        qi, q_scale = quantize_rows_int8(queries)
        raw = jnp.dot(qi, corpus.T, preferred_element_type=jnp.int32)
        return raw.astype(jnp.float32) * (q_scale * corpus_scale.T)
    return jnp.dot(
        queries.astype(corpus.dtype), corpus.T, preferred_element_type=jnp.float32
    )


#: Column-block size for the two-stage k-selection.
TOPK_BLOCK = 4096


def two_stage_topk(scores: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over a huge axis via blockwise selection.

    ``lax.top_k`` over N≈1M columns sorts the whole row; selecting the top-k
    of each 4096-column block first and then re-selecting over the block
    winners is exact (every global top-k element is a top-k element of its
    block) and far cheaper — the expensive sort runs on short rows in
    parallel.
    """
    batch, n = scores.shape
    if n <= 2 * TOPK_BLOCK or k >= TOPK_BLOCK:
        return jax.lax.top_k(scores, k)
    n_blocks = n // TOPK_BLOCK
    main = scores[:, : n_blocks * TOPK_BLOCK].reshape(batch, n_blocks, TOPK_BLOCK)
    blk_scores, blk_idx = jax.lax.top_k(main, k)  # [B, nb, k]
    base = (jnp.arange(n_blocks) * TOPK_BLOCK)[None, :, None]
    cand_scores = blk_scores.reshape(batch, -1)
    cand_idx = (blk_idx + base).reshape(batch, -1)
    tail = scores[:, n_blocks * TOPK_BLOCK :]
    if tail.shape[1]:
        cand_scores = jnp.concatenate([cand_scores, tail], axis=1)
        cand_idx = jnp.concatenate(
            [
                cand_idx,
                jnp.broadcast_to(
                    jnp.arange(n_blocks * TOPK_BLOCK, n)[None, :], tail.shape
                ),
            ],
            axis=1,
        )
    top_scores, pos = jax.lax.top_k(cand_scores, k)
    return top_scores, jnp.take_along_axis(cand_idx, pos, axis=1)


def candidate_select(exact_topk: bool):
    """k-selection strategy: XLA `top_k` (exact) or the TPU-native
    `approx_max_k` (the hardware MIPS top-k; measured 3–10× faster at
    [512, 1M] on v5e). recall_target 0.95: measured at the 1M serving point
    the hybrid top-10 is IDENTICAL to the exact pipeline (overlap 1.0)."""
    if exact_topk:
        return jax.lax.top_k
    return partial(jax.lax.approx_max_k, recall_target=0.95)


def bucket_kernel_supported(
    corpus: jax.Array, scale, interpret: bool, k: int | None = None
) -> bool:
    """Whether the fused bucket-max kernel can serve this request: the
    kernel block geometry, a TPU backend (or explicit interpret mode),
    and a bucket table wide enough to supply `k` candidates. int8
    corpora need their per-row scale (the kernel rescales in-block).

    int4 corpora never ride the bucket kernel: the in-kernel half-split
    unpack failed Mosaic hardware compilation on v5e (remote-compile
    helper exit 1 at every shape tried — scripts/tpu_shape_smoke.py) and
    native jnp.int4 operands crash this toolchain's client, so the arm
    was REMOVED in 0.5.2 (VERDICT r4 #9) — the int4 tier always serves
    through the XLA candidate path."""
    from .fused_topk import bucket_table_width

    if isinstance(corpus, Int4Rows):
        return False
    if not isinstance(corpus, Int4Rows) and corpus.dtype == jnp.int8 and scale is None:
        return False
    width = bucket_table_width(corpus.shape[0])
    if width is None or (k is not None and k > width):
        return False
    if interpret:
        return True
    return jax.devices()[0].platform in ("tpu", "axon")


def candidate_topk(
    corpus: jax.Array,  # [N, d]
    queries: jax.Array,  # [B, d]
    k: int,
    mask: jax.Array | None,
    scale: jax.Array | None = None,
    exact_topk: bool = False,
    impl: str = "xla",
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Candidate selection strategy dispatch for the fused programs.

    impl="xla": [B,d]x[d,N] matmul then `candidate_select` (the serving
    default). impl="bucket": the Pallas fused matmul+bucket-max kernel
    (ops/fused_topk.py v2) — scores never materialize in HBM; falls back
    to the XLA path when the kernel can't serve the shape/dtype/backend
    or supply `k` candidates from its bucket table. The kernel is an
    approximate selection family (one winner per bucket feeding exact
    rescore / RRF), so an explicit ``exact_topk=True`` request always
    takes the exact XLA path — impl moves candidate recall, never an
    exactness guarantee.
    """
    if impl not in ("xla", "bucket"):
        raise ValueError(f"unknown candidate impl {impl!r}")
    if (
        impl == "bucket"
        and not exact_topk
        and bucket_kernel_supported(corpus, scale, interpret, k)
    ):
        from .fused_topk import fused_candidate_topk_v2

        if mask is None:
            mask = jnp.ones(corpus.shape[0], bool)
        quantized = isinstance(corpus, Int4Rows) or corpus.dtype == jnp.int8
        q = queries if quantized else queries.astype(corpus.dtype)
        return fused_candidate_topk_v2(
            corpus, q, k, mask, interpret=interpret, scale=scale
        )
    scores = dense_scores(corpus, queries, scale)
    if mask is not None:
        scores = jnp.where(mask[None, :], scores, NEG_INF)
    return candidate_select(exact_topk)(scores, k=k)


@partial(jax.jit, static_argnames=("k", "exact_topk"))
def dense_topk(
    corpus: jax.Array,  # [N, d] row-normalized bf16/f32, or int8
    queries: jax.Array,  # [B, d] row-normalized
    k: int,
    mask: jax.Array | None = None,  # [N] bool — False rows never retrieved
    exact_topk: bool = True,
    corpus_scale: jax.Array | None = None,  # [N, 1] — int8 corpus only
) -> tuple[jax.Array, jax.Array]:
    """Cosine top-k: returns (scores [B, k], row indices [B, k]).

    One `[B, d] @ [d, N]` MXU matmul; masked rows score -inf. ``k`` is static
    so repeated queries hit the same executable. ``exact_topk=False`` selects
    with the hardware `approx_max_k` (the serving default the store passes).
    """
    scores = dense_scores(corpus, queries, corpus_scale)  # [B, N]
    if mask is not None:
        scores = jnp.where(mask[None, :], scores, NEG_INF)
    return candidate_select(exact_topk)(scores, k=k)


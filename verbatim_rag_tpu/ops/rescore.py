"""Exact sparse rescore kernels (candidate term-match scoring).

The serving hybrid program rescoreses the top-`depth` sketch candidates
exactly against the forward index (`ops/hybrid.py::exact_rescore_device`,
contract from ref `milvus_base.py:261-294`'s exact sparse scores). The
`lax.scan` formulation there re-reads the gathered candidate id/weight
arrays from HBM on every query-term step — at the serving point
([512, 256] candidates x m=128 slots, ~64 query terms) that is ~8.6 GB of
HBM traffic per batch, measured 12.6 ms device-side (benchmarks RESULTS.md
stage decomposition). Both variants here read the candidate arrays ONCE:

  exact_rescore_oneshot  XLA: one fused broadcast-compare reduction over
                         the [B, C, m, qm] iteration space. Whether XLA
                         fuses it without materializing the 4-D tensor is
                         generation-specific - measure, don't assume.
  rescore_pallas         Pallas: candidate blocks stay VMEM-resident
                         while a static unroll over the qm query terms
                         accumulates matched weights in registers.

Both return bit-identical scores to the scan (pure f32 adds in the same
per-term order for the Pallas kernel; the oneshot sums slots-major, which
is associativity-equal on these magnitudes - differential-tested).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

#: Query rows per grid step: [qb, C·m] f32 id+w+acc blocks at the serving
#: shape (C=256, m=128) are 3 x 8 MB — comfortably inside VMEM.
Q_ROWS = 64


def _rescore_kernel(qid_ref, qw_ref, cid_ref, cw_ref, out_ref, *, qm: int, m: int):
    """One query tile: accumulate matched candidate weights over qm terms.

    cid/cw arrive flattened [qb, C·m] so every elementwise pass runs on
    full 128-lane tiles; the per-candidate slot sum folds once at the end.
    """
    cid = cid_ref[...]  # [qb, L] i32, L = C·m
    cw = cw_ref[...]  # [qb, L] f32
    qid = qid_ref[...]  # [qb, qm] i32
    qw = qw_ref[...]  # [qb, qm] f32
    acc = jnp.zeros_like(cw)
    for j in range(qm):  # static unroll — qm is a small bucketed constant
        tid = qid[:, j : j + 1]  # [qb, 1]
        tw = qw[:, j : j + 1]
        acc = acc + jnp.where(cid == tid, cw, 0.0) * tw
    qb, length = acc.shape
    out_ref[...] = jnp.sum(acc.reshape(qb, length // m, m), axis=-1)


@partial(jax.jit, static_argnames=("interpret",))
def rescore_pallas(
    cand_ids: jax.Array,  # [B, C, m] gathered forward-index term ids
    cand_w: jax.Array,  # [B, C, m] term weights
    q_ids: jax.Array,  # [B, qm] padded query term ids (0 = pad)
    q_w: jax.Array,  # [B, qm] query weights (0 in pad slots)
    interpret: bool = False,
) -> jax.Array:
    """Exact sparse scores [B, C] f32 with candidate arrays read once."""
    b, c, m = cand_ids.shape
    qm = q_ids.shape[1]
    qb = min(Q_ROWS, b) if b % Q_ROWS else Q_ROWS
    cid = cand_ids.reshape(b, c * m)
    cw = cand_w.astype(jnp.float32).reshape(b, c * m)
    qid = q_ids.astype(jnp.int32)
    qw = q_w.astype(jnp.float32)
    if b % qb:
        pad = qb - b % qb
        cid = jnp.pad(cid, ((0, pad), (0, 0)))
        cw = jnp.pad(cw, ((0, pad), (0, 0)))
        qid = jnp.pad(qid, ((0, pad), (0, 0)))
        qw = jnp.pad(qw, ((0, pad), (0, 0)))
    b_padded = cid.shape[0]

    out = pl.pallas_call(
        partial(_rescore_kernel, qm=qm, m=m),
        grid=(b_padded // qb,),
        in_specs=[
            pl.BlockSpec((qb, qm), lambda i: (i, 0)),
            pl.BlockSpec((qb, qm), lambda i: (i, 0)),
            pl.BlockSpec((qb, c * m), lambda i: (i, 0)),
            pl.BlockSpec((qb, c * m), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((qb, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b_padded, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qid, qw, cid, cw)
    return out[:b]


def exact_rescore_oneshot(
    cand_rows: jax.Array,  # [B, C] candidate row indices (−1 = missing)
    sp_ids: jax.Array,  # [N, m] forward index term ids (0 = pad)
    sp_w: jax.Array,  # [N, m] term weights (0 in pad slots)
    q_ids: jax.Array,  # [B, qm]
    q_w: jax.Array,  # [B, qm]
) -> jax.Array:
    """`exact_rescore_device` semantics via one broadcast reduction.

    Single fused compare-select-reduce over [B, C, m, qm]; XLA reads the
    gathered candidate arrays once instead of once per scan step.
    """
    safe = jnp.maximum(cand_rows, 0)
    flat = safe.reshape(-1)
    m = sp_ids.shape[1]
    cand_ids = (
        jnp.take(sp_ids, flat, axis=0).reshape(*cand_rows.shape, m).astype(jnp.int32)
    )
    cand_w = jnp.take(sp_w, flat, axis=0).reshape(*cand_rows.shape, m)
    match = cand_ids[..., None] == q_ids[:, None, None, :].astype(jnp.int32)
    contrib = jnp.where(
        match,
        cand_w[..., None].astype(jnp.float32) * q_w[:, None, None, :].astype(jnp.float32),
        0.0,
    )
    scores = jnp.sum(contrib, axis=(-1, -2))
    return jnp.where(cand_rows >= 0, scores, NEG_INF)


@partial(jax.jit, static_argnames=("interpret",))
def exact_rescore_device_pallas(
    cand_rows: jax.Array,  # [B, C] candidate row indices (−1 = missing)
    sp_ids: jax.Array,  # [N, m]
    sp_w: jax.Array,  # [N, m]
    q_ids: jax.Array,  # [B, qm]
    q_w: jax.Array,  # [B, qm]
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for `ops.hybrid.exact_rescore_device`: XLA row gather (a
    contiguous-row gather the memory system streams), Pallas accumulate."""
    safe = jnp.maximum(cand_rows, 0)
    flat = safe.reshape(-1)
    m = sp_ids.shape[1]
    cand_ids = (
        jnp.take(sp_ids, flat, axis=0).reshape(*cand_rows.shape, m).astype(jnp.int32)
    )
    cand_w = jnp.take(sp_w, flat, axis=0).reshape(*cand_rows.shape, m)
    scores = rescore_pallas(cand_ids, cand_w, q_ids, q_w, interpret=interpret)
    return jnp.where(cand_rows >= 0, scores, NEG_INF)


def exact_rescore_dispatch(cand_rows, sp_ids, sp_w, q_ids, q_w) -> jax.Array:
    """Backend dispatch for the "pallas" rescore impl: the kernel on TPU,
    the one-shot XLA reduction elsewhere (interpret mode is debug-only).

    The kernel's per-candidate fold reshapes [qb, C·m] → [qb, C, m]
    in-register, which Mosaic only lowers when the slot count ``m`` keeps
    the minor dim lane-aligned — a sub-128 ``m`` (tiny `sparse_max_nnz`
    stores) fails hardware compilation with "unsupported shape cast"
    (observed at m=4 on v5e). Such shapes take the one-shot path; the
    serving operating point (m=128) takes the kernel.
    """
    platform = jax.devices()[0].platform
    m = sp_ids.shape[1]
    if platform in ("tpu", "axon") and m and m % 128 == 0:
        return exact_rescore_device_pallas(cand_rows, sp_ids, sp_w, q_ids, q_w)
    return exact_rescore_oneshot(cand_rows, sp_ids, sp_w, q_ids, q_w)

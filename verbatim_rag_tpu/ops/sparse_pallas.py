"""Pallas kernel for the sparse forward-index scan.

The sparse score ``score[n, b] = Σ_j w[n, j] · q[b, ids[n, j]]`` is an
embedding-bag over a VMEM-resident query table — the hot op of sparse
retrieval (SURVEY.md §2.8 "Sparse inverted index + DAAT top-k"). XLA's
generic gather lowering serializes this; the kernel keeps the transposed
query table ``qT [V, B]`` in VMEM and performs the row-gathers on-chip,
streaming forward-index blocks from HBM exactly once per batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sparse_scan_kernel(qT_ref, ids_ref, w_ref, out_ref, *, block: int, nnz: int):
    """One grid step scores `block` documents against all B queries.

    qT_ref: [V, B] VMEM (resident across grid steps)
    ids_ref/w_ref: [block, nnz]
    out_ref: [B, block]
    """
    qT = qT_ref[:]  # [V, B]

    def body(j, acc):
        cols = ids_ref[:, j]  # [block] int32
        gathered = jnp.take(qT, cols, axis=0)  # [block, B] — on-chip row gather
        return acc + gathered * w_ref[:, j][:, None]

    acc = jax.lax.fori_loop(
        0, nnz, body, jnp.zeros((block, out_ref.shape[0]), jnp.float32)
    )
    out_ref[:] = acc.T


@partial(jax.jit, static_argnames=("k", "block"))
def sparse_topk_pallas(
    token_ids: jax.Array,  # [N, m] int32
    weights: jax.Array,  # [N, m] f32
    q_dense: jax.Array,  # [B, V] f32
    k: int,
    mask: jax.Array | None = None,
    block: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    """Exact sparse top-k via the Pallas scan kernel."""
    n_rows, nnz = token_ids.shape
    batch = q_dense.shape[0]
    qT = q_dense.T.astype(jnp.float32)  # [V, B]

    scores = pl.pallas_call(
        partial(_sparse_scan_kernel, block=block, nnz=nnz),
        grid=(n_rows // block,),
        in_specs=[
            pl.BlockSpec(qT.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, nnz), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, nnz), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, n_rows), jnp.float32),
    )(qT, token_ids, weights)

    if mask is not None:
        scores = jnp.where(mask[None, :], scores, -1e30)
    return jax.lax.top_k(scores, k)

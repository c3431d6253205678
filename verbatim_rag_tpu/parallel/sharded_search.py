"""Distributed retrieval: row-sharded index, per-shard top-k, ICI merge.

TPU-native replacement for Milvus's distributed search (SURVEY.md §2.9
"Distributed comm backend"): the corpus lives as mesh-sharded device arrays;
each device scores only its row shard and selects a local top-k; the k-way
merge is an `all_gather` of (score, global-row) pairs over ICI followed by a
final top-k — O(devices·k) traffic instead of shipping score vectors.

Implemented with `shard_map` so the same code runs on a real TPU pod slice
or the virtual CPU mesh used in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from verbatim_rag_tpu.ops.dense import NEG_INF


def shard_rows(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a [N, ...] array row-sharded over the whole mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(("dp", "tp"))))


def replicate(x: jax.Array, mesh: Mesh) -> jax.Array:
    return jax.device_put(x, NamedSharding(mesh, P()))


@partial(jax.jit, static_argnames=("k", "mesh"))
def sharded_dense_topk(
    corpus: jax.Array,  # [N, d] row-sharded over ('dp','tp')
    queries: jax.Array,  # [B, d] replicated
    k: int,
    mask: jax.Array,  # [N] row-sharded
    mesh: Mesh,
) -> tuple[jax.Array, jax.Array]:
    """Exact distributed top-k: (scores [B, k], global row indices [B, k])."""
    axis = ("dp", "tp")
    n_total = corpus.shape[0]

    def local_search(corpus_shard, queries_rep, mask_shard):
        # corpus_shard: [N/devs, d] — local scores on the MXU.
        scores = jnp.dot(
            queries_rep.astype(corpus_shard.dtype),
            corpus_shard.T,
            preferred_element_type=jnp.float32,
        )
        scores = jnp.where(mask_shard[None, :], scores, NEG_INF)
        local_k = min(k, corpus_shard.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores, local_k)  # [B, k]

        # Globalize indices: shard offset = shard_index * rows_per_shard.
        shard_index = jax.lax.axis_index(axis)
        top_idx = top_idx + shard_index * corpus_shard.shape[0]

        # ICI merge: gather every shard's candidates, re-select top-k.
        all_scores = jax.lax.all_gather(top_scores, axis, axis=1)  # [B, devs, k]
        all_idx = jax.lax.all_gather(top_idx, axis, axis=1)
        flat_scores = all_scores.reshape(all_scores.shape[0], -1)
        flat_idx = all_idx.reshape(all_idx.shape[0], -1)
        final_scores, pos = jax.lax.top_k(flat_scores, k)
        final_idx = jnp.take_along_axis(flat_idx, pos, axis=1)
        return final_scores, final_idx

    from jax import shard_map

    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(axis), P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    del n_total
    return fn(corpus, queries, mask)


@partial(jax.jit, static_argnames=("k", "mesh", "block"))
def sharded_sparse_topk(
    token_ids: jax.Array,  # [N, m] row-sharded
    weights: jax.Array,  # [N, m] row-sharded
    q_dense: jax.Array,  # [B, V] replicated
    k: int,
    mask: jax.Array,  # [N] row-sharded
    mesh: Mesh,
    block: int = 8192,
) -> tuple[jax.Array, jax.Array]:
    """Distributed sparse forward-index top-k with ICI merge."""
    axis = ("dp", "tp")

    def local_search(ids_shard, w_shard, q_rep, mask_shard):
        n_rows, m = ids_shard.shape
        blk = min(block, n_rows)
        n_blocks = max(n_rows // blk, 1)
        q_table = q_rep.T.astype(jnp.float32)

        ids_b = ids_shard[: n_blocks * blk].reshape(n_blocks, blk, m)
        w_b = w_shard[: n_blocks * blk].reshape(n_blocks, blk, m).astype(jnp.float32)

        def score_block(args):
            ids_x, w_x = args
            gathered = jnp.take(q_table, ids_x.reshape(-1), axis=0).reshape(blk, m, -1)
            return jnp.einsum("nmb,nm->bn", gathered, w_x)

        scores = jax.lax.map(score_block, (ids_b, w_b))
        scores = jnp.moveaxis(scores, 0, 1).reshape(q_rep.shape[0], n_blocks * blk)
        scores = jnp.where(mask_shard[None, : n_blocks * blk], scores, NEG_INF)
        local_k = min(k, scores.shape[1])
        top_scores, top_idx = jax.lax.top_k(scores, local_k)

        shard_index = jax.lax.axis_index(axis)
        top_idx = top_idx + shard_index * n_rows

        all_scores = jax.lax.all_gather(top_scores, axis, axis=1)
        all_idx = jax.lax.all_gather(top_idx, axis, axis=1)
        flat_scores = all_scores.reshape(all_scores.shape[0], -1)
        flat_idx = all_idx.reshape(all_idx.shape[0], -1)
        final_scores, pos = jax.lax.top_k(flat_scores, k)
        return final_scores, jnp.take_along_axis(flat_idx, pos, axis=1)

    from jax import shard_map

    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(token_ids, weights, q_dense, mask)

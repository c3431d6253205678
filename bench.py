"""Headline benchmark: hybrid (dense+sparse, RRF) query throughput at 1M chunks.

Target (BASELINE.md): ≥10k hybrid QPS at 1M chunks on v5e-8 → per-chip share
1250 QPS. The bench reproduces the production `DeviceVectorStore` hybrid
pipeline at 1M synthetic chunks on ONE chip:

  dense:  [1M, 384] bf16 exact MXU matmul top-2k
  sparse: [1M, 768] bf16 sketch matmul top-depth candidates (MXU)
          + exact forward-index rescore on host (scores are true sparse dots)
  fusion: weighted RRF over both candidate lists

Timing is host-synchronous end to end (candidate readback + rescore + fusion
are on the measured path — no async-dispatch inflation; `block_until_ready`
is not trusted on tunneled backends).

Prints exactly one JSON line:
  {"metric": "hybrid_qps_1m_per_chip", "value": ..., "unit": "qps",
   "vs_baseline": value / 1250}
"""

from __future__ import annotations

import json
import time

import numpy as np

N_CHUNKS = 1_000_000
DIM = 384
MAX_NNZ = 128
VOCAB = 30522
PROJ_DIM = 768
RESCORE_DEPTH = 256
QUERY_BATCH = 64
QUERY_NNZ = 32
TOP_K = 10
RRF_K = 60
BASELINE_PER_CHIP_QPS = 10_000 / 8  # BASELINE.md target split across v5e-8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from verbatim_rag_tpu.ops.dense import dense_topk
    from verbatim_rag_tpu.ops.fusion import rrf_fuse_np
    from verbatim_rag_tpu.ops.sparse_projected import exact_rescore

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    k_dense, k_proj = jax.random.split(key)

    # Dense corpus + sparse sketches generated on device (no 1M-row transfer).
    dense = jax.random.normal(k_dense, (N_CHUNKS, DIM), jnp.bfloat16)
    dense = dense / jnp.linalg.norm(
        dense.astype(jnp.float32), axis=1, keepdims=True
    ).astype(jnp.bfloat16)
    sp_proj = jax.random.normal(k_proj, (N_CHUNKS, PROJ_DIM), jnp.bfloat16)
    mask = jnp.ones((N_CHUNKS,), bool)

    # Host forward index (the exact-rescore source of truth).
    sp_ids_host = rng.integers(1, VOCAB, size=(N_CHUNKS, MAX_NNZ)).astype(np.int32)
    sp_w_host = rng.random((N_CHUNKS, MAX_NNZ)).astype(np.float32)

    fetch_k = 2 * TOP_K

    def make_queries(seed: int):
        q_rng = np.random.default_rng(seed)
        dq = q_rng.normal(size=(QUERY_BATCH, DIM)).astype(np.float32)
        dq /= np.linalg.norm(dq, axis=1, keepdims=True)
        q_terms = q_rng.integers(1, VOCAB, size=(QUERY_BATCH, QUERY_NNZ))
        q_weights = q_rng.random((QUERY_BATCH, QUERY_NNZ)).astype(np.float32)
        q_dense = np.zeros((QUERY_BATCH, VOCAB), np.float32)
        np.put_along_axis(q_dense, q_terms, q_weights, axis=1)
        q_proj = q_rng.normal(size=(QUERY_BATCH, PROJ_DIM)).astype(np.float32)
        return jnp.asarray(dq), jnp.asarray(q_proj), q_dense

    def run(dq, q_proj, q_dense):
        # Device phase: both candidate generations (async dispatch overlaps).
        d_scores, d_rows = dense_topk(dense, dq, fetch_k, mask)
        s_scores, s_rows = dense_topk(sp_proj, q_proj, RESCORE_DEPTH, mask)
        d_rows_np = np.asarray(d_rows)  # host sync
        cand_rows = np.asarray(s_rows)
        # Host phase: exact sparse rescore + RRF fusion (production path).
        exact = exact_rescore(cand_rows, sp_ids_host, sp_w_host, q_dense)
        order = np.argsort(-exact, axis=1)[:, :fetch_k]
        sparse_rows_np = np.take_along_axis(cand_rows, order, axis=1)
        fused_scores, fused_rows = rrf_fuse_np(
            np.stack([d_rows_np, sparse_rows_np]),
            np.asarray([0.5, 0.5], np.float32),
            k=TOP_K,
            rrf_k=RRF_K,
        )
        return fused_rows

    # Warmup / compile.
    run(*make_queries(1))

    iters = 20
    queries = [make_queries(i + 2) for i in range(iters)]
    start = time.perf_counter()
    for q in queries:
        run(*q)
    elapsed = time.perf_counter() - start

    qps = QUERY_BATCH * iters / elapsed
    print(
        json.dumps(
            {
                "metric": "hybrid_qps_1m_per_chip",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / BASELINE_PER_CHIP_QPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

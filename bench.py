"""Headline benchmark: hybrid (dense+sparse, RRF) query throughput at 1M chunks.

Target (BASELINE.md): ≥10k hybrid QPS at 1M chunks on v5e-8 → per-chip share
1250 QPS. This bench builds a synthetic 1M-chunk device-resident index
(384-d bf16 dense + 128-nnz sparse forward index, the production layout of
`DeviceVectorStore`) on ONE chip and measures the fused hybrid pipeline
(`ops.hybrid.hybrid_topk`: dense matmul top-k + sparse gather-scan top-k +
on-device weighted RRF) over batched queries.

Prints exactly one JSON line:
  {"metric": "hybrid_qps_1m_per_chip", "value": ..., "unit": "qps",
   "vs_baseline": value / 1250}
"""

from __future__ import annotations

import json
import time

N_CHUNKS = 1_000_000
DIM = 384
MAX_NNZ = 128
VOCAB = 30522
QUERY_BATCH = 64
QUERY_NNZ = 32
BLOCK = 8192
TOP_K = 10
BASELINE_PER_CHIP_QPS = 10_000 / 8  # BASELINE.md target split across v5e-8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from verbatim_rag_tpu.ops.hybrid import hybrid_topk

    n = (N_CHUNKS // BLOCK) * BLOCK
    key = jax.random.PRNGKey(0)
    k_dense, k_ids, k_w, k_q, k_qs = jax.random.split(key, 5)

    # Synthetic corpus, generated on device (no host transfer of the index).
    dense = jax.random.normal(k_dense, (n, DIM), jnp.bfloat16)
    dense = dense / jnp.linalg.norm(dense.astype(jnp.float32), axis=1, keepdims=True).astype(
        jnp.bfloat16
    )
    sp_ids = jax.random.randint(k_ids, (n, MAX_NNZ), 1, VOCAB, jnp.int32)
    sp_w = jax.random.uniform(k_w, (n, MAX_NNZ), jnp.float32)
    mask = jnp.ones((n,), bool)

    def make_queries(seed: int):
        kq, kqs, kqw = jax.random.split(jax.random.PRNGKey(seed), 3)
        dq = jax.random.normal(kq, (QUERY_BATCH, DIM), jnp.float32)
        dq = dq / jnp.linalg.norm(dq, axis=1, keepdims=True)
        q_ids = jax.random.randint(kqs, (QUERY_BATCH, QUERY_NNZ), 1, VOCAB, jnp.int32)
        q_w = jax.random.uniform(kqw, (QUERY_BATCH, QUERY_NNZ), jnp.float32)
        rows = jnp.broadcast_to(jnp.arange(QUERY_BATCH)[:, None], q_ids.shape)
        sq = jnp.zeros((QUERY_BATCH, VOCAB), jnp.float32).at[rows, q_ids].add(q_w)
        return dq, sq

    dq, sq = make_queries(1)

    def run(dq, sq):
        return hybrid_topk(
            dense, sp_ids, sp_w, dq, sq, k=TOP_K, mask=mask, block=BLOCK
        )

    # Warmup / compile.
    scores, rows = run(dq, sq)
    scores.block_until_ready()

    iters = 20
    queries = [make_queries(i + 2) for i in range(iters)]
    for dq_i, sq_i in queries:  # materialize inputs before timing
        dq_i.block_until_ready()

    start = time.perf_counter()
    outs = []
    for dq_i, sq_i in queries:
        outs.append(run(dq_i, sq_i))
    outs[-1][0].block_until_ready()
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

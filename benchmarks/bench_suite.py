"""Extended benchmark suite (one JSON line per metric).

`bench.py` (repo root) prints the single headline line the driver records;
this suite covers the full perf surface on real hardware, through the SAME
code paths the serving store uses (round 2: everything on device —
`hybrid_fused_topk` / `projected_sparse_topk`):

  dense_qps_1m        exact dense retrieval throughput @1M chunks
  sparse_qps_1m       projected + on-device rescore sparse throughput @1M
  hybrid_qps_1m       fused hybrid (the headline, same path as bench.py)
  encode_dense_tps    MiniLM-shaped dense encoder, texts/sec (seq 256)
  extract_tokens_tps  highlighter token-classification throughput (seq 512)
  train_tokens_tps    150M token-classifier TRAINING throughput (B=8, S=512)
  e2e_p50_ms          single-query hybrid latency, median over 30 queries

Timing is host-synchronous (forced readback) — `block_until_ready` is not
trusted on tunneled backends.

Run: python benchmarks/bench_suite.py [--n 999424]
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
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--iters", type=int, default=10)
    # Kernel-impl knobs, same values as DeviceVectorStore (defaults = the
    # store's serving defaults, so the recorded surface measures what ships).
    parser.add_argument("--rescore-impl", default="pallas")
    parser.add_argument("--candidate-impl", default="xla")
    args = parser.parse_args()
    if args.candidate_impl == "bucket":
        from verbatim_rag_tpu.ops.fused_topk import BLOCK_ROWS

        if args.n % BLOCK_ROWS:
            # Round down to the kernel block multiple so the bucket kernel
            # actually runs instead of silently falling back to XLA.
            args.n -= args.n % BLOCK_ROWS
            print(f"# bucket impl: n rounded to block multiple {args.n}", flush=True)

    from verbatim_rag_tpu.utils.jax_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    import jax
    import jax.numpy as jnp

    from verbatim_rag_tpu.ops.dense import dense_topk
    from verbatim_rag_tpu.ops.hybrid import hybrid_fused_topk, projected_sparse_topk

    n, batch, iters = args.n, args.batch, args.iters
    dim, proj_dim, max_nnz, vocab = 384, 768, 128, 30522
    depth, fetch_k, qnnz = 256, 20, 32

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dense = jax.random.normal(k1, (n, dim), jnp.bfloat16)
    sp_proj = jax.random.normal(k2, (n, proj_dim), jnp.bfloat16)
    sp_ids = jax.random.randint(k3, (n, max_nnz), 1, vocab, jnp.int32)
    sp_w = jax.random.uniform(k4, (n, max_nnz), jnp.float32)
    mask = jnp.ones((n,), bool)

    def queries(seed, b=batch):
        q_rng = np.random.default_rng(seed)
        dq = q_rng.normal(size=(b, dim)).astype(np.float32)
        dq /= np.linalg.norm(dq, axis=1, keepdims=True)
        qp = jnp.asarray(q_rng.normal(size=(b, proj_dim)).astype(np.float32))
        q_ids = jnp.asarray(q_rng.integers(1, vocab, size=(b, qnnz)).astype(np.int32))
        q_w = jnp.asarray(q_rng.random((b, qnnz)).astype(np.float32))
        return jnp.asarray(dq), qp, q_ids, q_w

    # -- dense ------------------------------------------------------------------
    def dense_query(seed):
        # Only the dense payload: building the sparse/sketch arrays here
        # would put ~1.6 MB of unconsumed transfers inside the timed
        # window, understating dense QPS on an RTT-dominated tunnel.
        q_rng = np.random.default_rng(10_000 + seed)
        dq = q_rng.normal(size=(batch, dim)).astype(np.float32)
        return jnp.asarray(dq / np.linalg.norm(dq, axis=1, keepdims=True))

    dq = dense_query(0)
    np.asarray(dense_topk(dense, dq, 10, mask)[0])
    start = time.perf_counter()
    for i in range(iters):
        dq = dense_query(i + 1)
        np.asarray(dense_topk(dense, dq, 10, mask)[1])
    emit("dense_qps_1m", batch * iters / (time.perf_counter() - start), "qps")

    # -- sparse (projected + on-device rescore) ------------------------------------
    def sparse_once(seed):
        _, qp, q_ids, q_w = queries(seed)
        _, rows = projected_sparse_topk(
            sp_proj, sp_ids, sp_w, qp, q_ids, q_w, 10, depth, mask, exact_topk=False,
            rescore_impl=args.rescore_impl, candidate_impl=args.candidate_impl,
        )
        return np.asarray(rows)

    sparse_once(0)
    start = time.perf_counter()
    for i in range(iters):
        sparse_once(i + 1)
    emit("sparse_qps_1m", batch * iters / (time.perf_counter() - start), "qps")

    # -- hybrid (pipelined, headline path) ----------------------------------------
    def dispatch(seed, b=batch):
        dq, qp, q_ids, q_w = queries(seed, b)
        return hybrid_fused_topk(
            dense, sp_proj, sp_ids, sp_w, dq, qp, q_ids, q_w,
            k=10, fetch_k=fetch_k, depth=depth, mask=mask, exact_topk=False,
            rescore_impl=args.rescore_impl, candidate_impl=args.candidate_impl,
        )

    np.asarray(dispatch(0)[1])
    start = time.perf_counter()
    pipeline = []
    for i in range(iters):
        pipeline.append(dispatch(i + 1))
        if len(pipeline) >= 4:
            np.asarray(pipeline.pop(0)[1])
    while pipeline:
        np.asarray(pipeline.pop(0)[1])
    emit("hybrid_qps_1m", batch * iters / (time.perf_counter() - start), "qps")

    # -- e2e single-query latency p50 ----------------------------------------------
    np.asarray(dispatch(99, b=1)[1])  # compile the b=1 shape
    latencies = []
    for i in range(30):
        start = time.perf_counter()
        np.asarray(dispatch(100 + i, b=1)[1])
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

    # Pipelined at the serving batch shape: the micro-batcher feeds the
    # highlighter ~32-window batches and overlaps readbacks, so per-call
    # host syncs (a ~31 ms tunnel RTT each here) are not the serving
    # reality. Dispatch all calls, sync once.
    ids32 = jnp.asarray(rng.integers(3, hl_cfg.vocab_size, (32, 512)), jnp.int32)
    att32 = jnp.ones((32, 512), jnp.int32)
    np.asarray(token_relevance_probs(hl_params, hl_cfg, ids32, att32))
    start = time.perf_counter()
    outs = [token_relevance_probs(hl_params, hl_cfg, ids32, att32) for _ in range(10)]
    np.asarray(jnp.stack([o.sum() for o in outs]))
    emit(
        "extract_tokens_tps_pipelined_b32",
        32 * 512 * 10 / (time.perf_counter() - start),
        "tokens/s",
    )

    # -- training throughput (full 150M config) -----------------------------------
    from verbatim_rag_tpu.models.config import TrainingConfig
    from verbatim_rag_tpu.training.model import token_loss
    from verbatim_rag_tpu.training.trainer import make_optimizer, train_step

    tc = TrainingConfig(learning_rate=2e-5, batch_size=8, max_seq_length=512)
    optimizer = make_optimizer(tc)
    params = hl_params
    opt_state = optimizer.init(params)
    tb = {
        "input_ids": ids,
        "attention_mask": att,
        "labels": jnp.asarray(rng.integers(0, 2, (8, 512)), jnp.int32),
        "label_mask": jnp.ones((8, 512), jnp.int32),
    }
    params, opt_state, loss, _ = train_step(params, opt_state, tb, hl_cfg, optimizer, token_loss)
    float(loss)
    start = time.perf_counter()
    for _ in range(10):
        params, opt_state, loss, _ = train_step(
            params, opt_state, tb, hl_cfg, optimizer, token_loss
        )
    float(loss)
    emit("train_tokens_tps", 8 * 512 * 10 / (time.perf_counter() - start), "tokens/s")


if __name__ == "__main__":
    main()

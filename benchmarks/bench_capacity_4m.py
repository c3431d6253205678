"""Capacity-at-scale proof: serve FOUR MILLION chunks from ONE v5e chip.

The scaling guide claims "~4M chunks/chip" from HBM arithmetic (int8 dense
0.375 B/dim + int8 sketches + the f32 forward index); this benchmark
substantiates it with a live serving measurement instead of arithmetic:
the full hybrid query program (int8 dense matmul + int8 sketch matmul +
exact forward-index rescore + RRF — `ops/hybrid.py::hybrid_fused_topk`,
the same program the 1M headline runs) over a 4M-row corpus resident in
HBM.

Device arrays at N=4M (rounded to 8192): int8 dense [N,384] 1.4 GB +
int8 sketches [N,768] 2.9 GB + forward index ids/weights [N,128]
int32+f32 3.8 GB ≈ 8.1 GiB corpus. The headline batch of 512 still fits:
a [512, 4M] f32 score matrix is 8 GB, but XLA's fusion with approx_max_k
tiles it — measured batch sweep on v5e: b=128 → 1991 best QPS, b=256 →
3356, b=512 → 5567 (4.45× the 1250/chip target share at 4× the corpus).

Run: python benchmarks/bench_capacity_4m.py [--batch 512 --n 3997696]
Prints one JSON line: best + p50 QPS over pipelined windows.

--int4 swaps both quantized matrices to the packed 4-bit tier
(ops/dense.Int4Rows): dense 0.7 GB + sketches 1.4 GB at 4M. The
forward index (ids+f32 weights, 8 B/slot) then dominates the corpus —
at N≈8M the total is ~10.7 GiB, the experiment the flag exists for.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

DIM, PROJ_DIM, MAX_NNZ, VOCAB = 384, 768, 128, 30522
QUERY_NNZ, TOP_K, RESCORE_DEPTH, RRF_K = 32, 10, 256, 60
TARGET_PER_CHIP_QPS = 10_000 / 8  # BASELINE.md target split across v5e-8


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=3_997_696)  # 4M, 8192-aligned
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--windows", type=int, default=8)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--int4", action="store_true", help="packed 4-bit tier")
    parser.add_argument(
        "--slim-index", action="store_true",
        help="int16 ids + f16 weights in the forward index (4 B/slot)",
    )
    parser.add_argument(
        "--skip-overlap", action="store_true",
        help="skip the approx-vs-exact top-10 overlap companion (saves one "
        "exact-selection compile at huge N)",
    )
    args = parser.parse_args()

    import os

    import jax

    from verbatim_rag_tpu.utils.jax_cache import (
        enable_persistent_compilation_cache,
        pin_platform_from_env,
    )

    pin_platform_from_env()
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    enable_persistent_compilation_cache()
    import jax.numpy as jnp

    from verbatim_rag_tpu.ops.dense import (
        Int4Rows,
        quantize_rows_int4,
        quantize_rows_int8,
    )
    from verbatim_rag_tpu.ops.hybrid import hybrid_fused_topk

    def mark(msg):
        print(f"# {msg} t={time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    n, b = args.n, args.batch
    key = jax.random.PRNGKey(0)
    k_dense, k_proj, k_ids, k_w = jax.random.split(key, 4)

    # Corpus generated on device, quantized in slabs: normalize+quantize of
    # a whole [4M, 768] f32 intermediate would transiently need ~12 GB next
    # to the growing corpus. 8 slabs keep the transient under 2 GB.
    quantize = jax.jit(quantize_rows_int4 if args.int4 else quantize_rows_int8)
    tier = "int4" if args.int4 else "int8"

    def build_quantized(k, dim, slabs=8):
        rows = n // slabs
        codes, scales = [], []
        for i in range(slabs):
            ki = jax.random.fold_in(k, i)
            x = jax.random.normal(ki, (rows, dim), jnp.float32)
            x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
            c, s = quantize(x)
            c.block_until_ready()
            codes.append(c)
            scales.append(s)
        return jnp.concatenate(codes, axis=0), jnp.concatenate(scales, axis=0)

    dense, dense_scale = build_quantized(k_dense, DIM)
    mark(f"{tier} dense [{n}, {DIM}] resident")
    sketch, sketch_scale = build_quantized(k_proj, PROJ_DIM)
    mark(f"{tier} sketches [{n}, {PROJ_DIM}] resident")
    if args.int4:
        # The fused programs take Int4Rows carriers with scale=None.
        dense, dense_scale = Int4Rows(dense, dense_scale), None
        sketch, sketch_scale = Int4Rows(sketch, sketch_scale), None
    ids_dtype = jnp.int16 if args.slim_index else jnp.int32
    w_dtype = jnp.float16 if args.slim_index else jnp.float32
    sp_ids = jax.random.randint(k_ids, (n, MAX_NNZ), 1, VOCAB, jnp.int32).astype(ids_dtype)
    sp_w = jax.random.uniform(k_w, (n, MAX_NNZ), jnp.float32).astype(w_dtype)
    mask = jnp.ones((n,), bool)
    jnp.asarray(sp_w[:1]).block_until_ready()
    quant_bytes = (n * DIM + n * PROJ_DIM) // (2 if args.int4 else 1)
    slot_bytes = 4 if args.slim_index else 8
    corpus_gb = (quant_bytes + n * MAX_NNZ * slot_bytes + n * 8) / 2**30
    mark(f"forward index resident; corpus ≈ {corpus_gb:.2f} GiB on one chip")

    fetch_k = 2 * TOP_K

    def make_queries(seed: int):
        q_rng = np.random.default_rng(seed)
        dq = q_rng.normal(size=(b, DIM)).astype(np.float32)
        dq /= np.linalg.norm(dq, axis=1, keepdims=True)
        q_ids = q_rng.integers(1, VOCAB, size=(b, QUERY_NNZ)).astype(np.int32)
        q_w = q_rng.random((b, QUERY_NNZ)).astype(np.float32)
        q_proj = q_rng.normal(size=(b, PROJ_DIM)).astype(np.float32)
        return jnp.asarray(dq), jnp.asarray(q_proj), jnp.asarray(q_ids), jnp.asarray(q_w)

    def dispatch(queries):
        dq, q_proj, q_ids, q_w = queries
        return hybrid_fused_topk(
            dense, sketch, sp_ids, sp_w, dq, q_proj, q_ids, q_w,
            k=TOP_K, fetch_k=fetch_k, depth=RESCORE_DEPTH, mask=mask,
            rrf_k=RRF_K, exact_topk=False,
            dense_scale=dense_scale, sketch_scale=sketch_scale,
        )

    def host_phase(inflight):
        scores, rows = inflight
        return np.asarray(rows), np.asarray(scores)

    mark("compiling the 4M serving program")
    host_phase(dispatch(make_queries(0)))
    host_phase(dispatch(make_queries(1)))
    mark("warm")

    elapsed_windows = []
    for w in range(args.windows):
        queries = [make_queries(w * args.iters + i + 2) for i in range(args.iters)]
        start = time.perf_counter()
        pipeline = []
        for q in queries:
            pipeline.append(dispatch(q))
            if len(pipeline) >= 4:
                host_phase(pipeline.pop(0))
        while pipeline:
            host_phase(pipeline.pop(0))
        elapsed_windows.append(time.perf_counter() - start)

    qps_windows = sorted(b * args.iters / e for e in elapsed_windows)
    best = qps_windows[-1]
    p50 = qps_windows[len(qps_windows) // 2]

    print(
        json.dumps(
            {
                "metric": "hybrid_qps_4m_per_chip",
                "value": round(best, 1),
                "unit": "qps",
                "p50": round(p50, 1),
                "rows": n,
                "batch": b,
                "tier": tier,
                "slim_index": bool(args.slim_index),
                "corpus_gib": round(corpus_gb, 2),
                "vs_target_share": round(best / TARGET_PER_CHIP_QPS, 3),
            }
        )
    )

    # Device-honest companion (round 5): profiler module wall per batch —
    # excludes the ~7-9 ms/dispatch tunnel RPC the pipelined windows carry.
    trace_ms = None
    try:
        import shutil

        from verbatim_rag_tpu.utils.profiling import trace_module_wall_ms

        logdir = "/tmp/cap_trace"
        shutil.rmtree(logdir, ignore_errors=True)
        reps_q = [make_queries(90_000 + i) for i in range(4)]
        jax.profiler.start_trace(logdir)
        out = None
        for q in reps_q:
            out = dispatch(q)
        host_phase(out)
        jax.profiler.stop_trace()
        trace_ms = round(trace_module_wall_ms(logdir) / len(reps_q), 2)
        shutil.rmtree(logdir, ignore_errors=True)
        mark(f"trace module wall {trace_ms} ms/batch")
    except Exception as exc:  # best-effort companion
        mark(f"trace companion unavailable: {str(exc)[:80]}")

    # Quality-at-capacity companion: hybrid top-10 overlap of the serving
    # (approx_max_k) program vs the exact-selection program on the SAME
    # tier arrays — the in-place analog of recall_1m.py's pipeline overlap
    # (a bf16 reference cannot co-reside at this capacity).
    overlap = None
    overlap_note = None
    try:
        if args.skip_overlap:
            raise RuntimeError("skipped by flag")
        q = make_queries(77_000)
        dq, q_proj, q_ids, q_w = q
        mark("compiling the exact-selection comparison program")
        _, rows_exact = hybrid_fused_topk(
            dense, sketch, sp_ids, sp_w, dq, q_proj, q_ids, q_w,
            k=TOP_K, fetch_k=fetch_k, depth=RESCORE_DEPTH, mask=mask,
            rrf_k=RRF_K, exact_topk=True,
            dense_scale=dense_scale, sketch_scale=sketch_scale,
        )
        rows_exact = np.asarray(rows_exact)
        rows_approx = np.asarray(dispatch(q)[1])
        inter = [
            len(set(a[a >= 0]) & set(e[e >= 0])) / max((e >= 0).sum(), 1)
            for a, e in zip(rows_approx, rows_exact)
        ]
        overlap = round(float(np.mean(inter)), 4)
        mark(f"approx-vs-exact hybrid top-{TOP_K} overlap {overlap}")
    except Exception as exc:
        # At ~8M rows the exact-selection program needs a [B, N] f32
        # score matrix (16.6 GB at 8.1M) that cannot co-reside with the
        # corpus: exact top-k is impossible at this capacity, which is
        # the reason the approx family exists. Record, don't die.
        overlap_note = str(exc).splitlines()[0][:160]
        mark(f"overlap companion unavailable: {overlap_note}")

    print(
        json.dumps(
            {
                "metric": "hybrid_4m_companions",
                "rows": n,
                "tier": tier,
                "trace_device_ms": trace_ms,
                "trace_device_qps": (
                    None if not trace_ms else round(b / trace_ms * 1000.0, 1)
                ),
                "approx_vs_exact_top10_overlap": overlap,
                "overlap_note": overlap_note,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

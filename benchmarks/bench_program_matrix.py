"""Serving-program matrix: hybrid_fused_topk across kernel choices.

One harness, one session, all the round-3 kernel candidates — the numbers
that decide serving defaults:

  candidate_impl  "xla" (matmul + approx_max_k)  vs  "bucket" (Pallas
                  fused matmul+bucket-max v2; scores never hit HBM)
  rescore_impl    "scan" (reference)  vs  "pallas" (VMEM-resident)
                  ["oneshot" available via --rescore-impls]

For every config: device-honest timing of the FULL fused program at the
serving shape, device-side QPS, and hybrid top-10 overlap vs the baseline
config (the quality gate — candidate impls are selection families, so
overlap at the serving point is what matters).

Run: python benchmarks/bench_program_matrix.py [--n 999424 --batch 512]
Prints one JSON line per config.
"""

from __future__ import annotations

import argparse
import itertools
import json
from functools import partial

import numpy as np

from profile_stages import _retry_compile, timeit


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=999_424)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--dim", type=int, default=384)
    parser.add_argument("--proj", type=int, default=768)
    parser.add_argument("--nnz", type=int, default=128)
    parser.add_argument("--qnnz", type=int, default=32)
    parser.add_argument("--depth", type=int, default=256)
    parser.add_argument("--fetch-k", type=int, default=20)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--candidate-impls", nargs="+", default=["xla", "bucket"])
    parser.add_argument("--rescore-impls", nargs="+", default=["scan", "pallas"])
    parser.add_argument("--int8", action="store_true", help="alias for --tier int8")
    parser.add_argument(
        "--tier", default=None, choices=["bf16", "int8", "int4"],
        help="quantization tier for dense + sketches (default bf16)",
    )
    args = parser.parse_args()
    tier = args.tier or ("int8" if args.int8 else "bf16")

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from verbatim_rag_tpu.ops.dense import (
        normalize_rows,
        quantize_rows_int4,
        quantize_rows_int8,
    )
    from verbatim_rag_tpu.ops.hybrid import hybrid_fused_topk

    if jax.devices()[0].platform not in ("tpu", "axon"):
        print('# CPU run: "bucket"/"pallas" rows measure their fallbacks', flush=True)

    rng = np.random.default_rng(9)
    n, b = args.n, args.batch
    key = jax.random.PRNGKey(9)
    k_dense, k_sketch, k_ids, k_w = jax.random.split(key, 4)
    dense = jax.jit(normalize_rows)(jax.random.normal(k_dense, (n, args.dim), jnp.float32))
    sketch = jax.jit(normalize_rows)(jax.random.normal(k_sketch, (n, args.proj), jnp.float32))
    dense_scale = sketch_scale = None
    if tier == "int8":
        dense, dense_scale = jax.jit(quantize_rows_int8)(dense)
        sketch, sketch_scale = jax.jit(quantize_rows_int8)(sketch)
    elif tier == "int4":
        dense = jax.jit(quantize_rows_int4)(dense)  # Int4Rows carrier
        sketch = jax.jit(quantize_rows_int4)(sketch)
    else:
        dense = dense.astype(jnp.bfloat16)
        sketch = sketch.astype(jnp.bfloat16)
    sp_ids = jax.random.randint(k_ids, (n, args.nnz), 1, 30522, jnp.int32)
    sp_w = jax.random.uniform(k_w, (n, args.nnz), dtype=jnp.float32)
    dq = normalize_rows(jnp.asarray(rng.normal(size=(b, args.dim)), jnp.float32))
    sq = normalize_rows(jnp.asarray(rng.normal(size=(b, args.proj)), jnp.float32))
    q_ids = jnp.asarray(rng.integers(1, 30522, size=(b, args.qnnz)), jnp.int32)
    q_w = jnp.asarray(rng.random(size=(b, args.qnnz)), jnp.float32)
    np.asarray(sp_w)
    print("# corpus on device", flush=True)

    config = {
        "n": n, "batch": b, "depth": args.depth,
        "fetch_k": args.fetch_k, "tier": tier,
    }
    base_rows = None
    for cand_impl, resc_impl in itertools.product(
        args.candidate_impls, args.rescore_impls
    ):
        fused = partial(
            hybrid_fused_topk,
            k=args.k, fetch_k=args.fetch_k, depth=args.depth, exact_topk=False,
            rescore_impl=resc_impl, candidate_impl=cand_impl,
            dense_scale=dense_scale, sketch_scale=sketch_scale,
        )

        def run(d, s, i, w, a, c, ci, cw):
            return fused(d, s, i, w, a, c, ci, cw)

        rows = np.asarray(
            _retry_compile(run, dense, sketch, sp_ids, sp_w, dq, sq, q_ids, q_w)[1]
        )
        if base_rows is None:
            base_rows = rows
            overlap = 1.0
        else:
            overlap = np.mean([
                len(set(rows[i][rows[i] >= 0]) & set(base_rows[i][base_rows[i] >= 0]))
                / max(1, (base_rows[i] >= 0).sum())
                for i in range(min(128, b))
            ])
        sync_ms, dev_ms = timeit(
            run, dense, sketch, sp_ids, sp_w, dq, sq, q_ids, q_w
        )
        print(json.dumps({
            "metric": "hybrid_program_ms",
            "candidate_impl": cand_impl, "rescore_impl": resc_impl,
            "sync_ms": round(sync_ms, 3), "device_ms": round(dev_ms, 3),
            "qps_device": round(b / (dev_ms / 1000.0), 1) if dev_ms else None,
            "top10_overlap_vs_baseline": round(float(overlap), 4),
            "config": config,
        }), flush=True)


if __name__ == "__main__":
    main()

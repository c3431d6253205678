"""A/B the fused matmul+bucket-max Pallas kernel against XLA's pipeline.

ROADMAP #2: the serving device program sits ~20% above the
score-materialization roofline; going below it needs a kernel that never
writes the [B, N] f32 score matrix to HBM. `ops/fused_topk.py` is that
kernel (one winner per 128-row bucket, same selection family as
approx_max_k); the round-2 A/B tied XLA at d=768 — this harness re-measures
both serving shapes in one session with device-honest timing so a healthy-
chip run settles whether the kernel earns its way into the hybrid program.

Compares, at [B, N] for d in {384 (dense), 768 (sketch)}:
  xla                dense_topk: matmul → approx_max_k (serving default)
  pallas_bucket_max  v1: consecutive buckets, lane-reduce + iota argmax
  pallas_v2_onedot   v2: strided buckets, mantissa-packed argmax, one dot
  pallas_v2_chunked  v2: same, but scores never materialize past
                     [qb, chunk_pos·128] (running max over MXU chunks)

Also checks candidate agreement (both are one-winner-per-bucket families;
top-k overlap at the serving fetch depth is the quality gate).

Run: python benchmarks/bench_fused_bucket.py [--n 999424 --batch 512]
Prints one JSON line per (dim, impl).
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from profile_stages import timeit  # same device-honest timing discipline


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=999_424)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--k", type=int, default=256)
    parser.add_argument("--dims", type=int, nargs="+", default=[384, 768])
    parser.add_argument("--chunk-pos", type=int, default=16)
    parser.add_argument("--q-block", type=int, default=128)
    parser.add_argument(
        "--impls", nargs="+", default=None,
        help="subset of pallas impls to run (default: all three)",
    )
    args = parser.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # Pallas on CPU only runs in (slow) interpret mode — fine for smoke
    # tests of the harness itself; real numbers need the TPU.
    interpret = jax.devices()[0].platform not in ("tpu", "axon")

    from verbatim_rag_tpu.ops.dense import dense_topk
    from verbatim_rag_tpu.ops.fused_topk import (
        fused_candidate_topk,
        fused_candidate_topk_v2,
    )

    key = jax.random.PRNGKey(0)
    mask_np = np.ones(args.n, bool)

    impls = {
        "pallas_bucket_max": lambda c, qq, m: fused_candidate_topk(
            c, qq.astype(c.dtype), args.k, m, interpret=interpret
        ),
        "pallas_v2_onedot": lambda c, qq, m: fused_candidate_topk_v2(
            c, qq.astype(c.dtype), args.k, m, variant="onedot",
            interpret=interpret, q_block=args.q_block
        ),
        "pallas_v2_chunked": lambda c, qq, m: fused_candidate_topk_v2(
            c, qq.astype(c.dtype), args.k, m, variant="chunked",
            chunk_pos=args.chunk_pos, interpret=interpret, q_block=args.q_block
        ),
    }
    if args.impls:
        impls = {name: impls[name] for name in args.impls}

    for dim in args.dims:
        k1, k2, key = jax.random.split(key, 3)
        corpus = jax.random.normal(k1, (args.n, dim), jnp.bfloat16)
        q = jax.random.normal(k2, (args.batch, dim), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        mask = jnp.asarray(mask_np)

        sync_x, dev_x = timeit(
            lambda c, qq, m: dense_topk(c, qq, args.k, m, exact_topk=False),
            corpus, q, mask,
        )
        print(json.dumps({
            "metric": f"candidate_topk_d{dim}", "impl": "xla_approx_max_k",
            "sync_ms": round(sync_x, 2), "device_ms": round(dev_x, 2),
            "batch": args.batch, "n": args.n, "k": args.k,
        }), flush=True)
        _, rows_x = dense_topk(corpus, q, args.k, mask, exact_topk=False)
        rx = np.asarray(rows_x)

        for name, fn in impls.items():
            sync_b, dev_b = timeit(fn, corpus, q, mask)
            print(json.dumps({
                "metric": f"candidate_topk_d{dim}", "impl": name,
                "sync_ms": round(sync_b, 2), "device_ms": round(dev_b, 2),
                "speedup_vs_xla_device": round(dev_x / dev_b, 3) if dev_b else None,
            }), flush=True)

            # Quality gate: overlap of the top-k candidate sets (all feed
            # the exact rescore downstream, so set overlap is what matters).
            _, rows_b = fn(corpus, q, mask)
            rb = np.asarray(rows_b)
            overlap = np.mean([
                len(set(rx[i][rx[i] >= 0]) & set(rb[i][rb[i] >= 0]))
                / max(1, (rx[i] >= 0).sum())
                for i in range(min(64, args.batch))
            ])
            print(json.dumps({
                "metric": f"candidate_overlap_d{dim}", "impl": name,
                "value": round(float(overlap), 4),
            }), flush=True)


if __name__ == "__main__":
    main()

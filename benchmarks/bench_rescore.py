"""A/B the exact-rescore implementations at serving shapes on hardware.

The stage profile (RESULTS.md round 3) put the scan rescore at 12.6 ms
device-side at [512, 256] candidates — within striking distance of the
whole fused program (18.8 ms). The scan re-reads the gathered candidate
id/weight arrays per query term (~8.6 GB HBM per batch at m=128, qm=32+);
`ops/rescore.py` adds two once-through alternatives. This harness times:

  scan      exact_rescore_device     (serving default)
  oneshot   exact_rescore_oneshot    (single XLA broadcast reduction)
  pallas    exact_rescore_device_pallas (VMEM-resident kernel)

standalone AND inside the full `hybrid_fused_topk` program (the number
that matters — XLA overlaps stages differently in context), plus a
bit-level agreement check.

Run: python benchmarks/bench_rescore.py [--n 999424 --batch 512]
Prints one JSON line per timing.
"""

from __future__ import annotations

import argparse
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
    parser.add_argument("--impls", nargs="+", default=["scan", "oneshot", "pallas"])
    parser.add_argument("--skip-fused", action="store_true")
    args = parser.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from verbatim_rag_tpu.ops.dense import candidate_select, dense_scores, normalize_rows
    from verbatim_rag_tpu.ops.hybrid import hybrid_fused_topk, rescore_fn

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if not on_tpu:
        # The pallas impl dispatches to the oneshot off-TPU; numbers on CPU
        # only smoke-test the harness.
        print('# CPU run: "pallas" rows measure the oneshot fallback', flush=True)

    rng = np.random.default_rng(7)
    n, b = args.n, args.batch
    key = jax.random.PRNGKey(7)
    k_dense, k_sketch, k_ids, k_w = jax.random.split(key, 4)
    dense = jax.jit(normalize_rows)(
        jax.random.normal(k_dense, (n, args.dim), jnp.float32)
    ).astype(jnp.bfloat16)
    sketch = jax.jit(normalize_rows)(
        jax.random.normal(k_sketch, (n, args.proj), jnp.float32)
    ).astype(jnp.bfloat16)
    sp_ids = jax.random.randint(k_ids, (n, args.nnz), 1, 30522, jnp.int32)
    sp_w = jax.random.uniform(k_w, (n, args.nnz), dtype=jnp.float32)
    dq = normalize_rows(jnp.asarray(rng.normal(size=(b, args.dim)), jnp.float32))
    sq = normalize_rows(jnp.asarray(rng.normal(size=(b, args.proj)), jnp.float32))
    q_ids = jnp.asarray(rng.integers(1, 30522, size=(b, args.qnnz)), jnp.int32)
    q_w = jnp.asarray(rng.random(size=(b, args.qnnz)), jnp.float32)
    np.asarray(sp_w)  # sync: corpus resident before timing
    print("# corpus on device", flush=True)

    # Candidates from the sketch stage (jit args, never closures).
    @jax.jit
    def stage_sketch(sketch, sq):
        return candidate_select(False)(dense_scores(sketch, sq, None), k=args.depth)

    cand = jnp.asarray(np.asarray(_retry_compile(stage_sketch, sketch, sq)[1]))
    print("# candidates ready", flush=True)

    config = {"n": n, "batch": b, "nnz": args.nnz, "qnnz": args.qnnz, "depth": args.depth}
    outs = {}
    for impl in args.impls:
        fn = jax.jit(rescore_fn(impl))
        sync_ms, dev_ms = timeit(fn, cand, sp_ids, sp_w, q_ids, q_w)
        print(json.dumps({
            "metric": "rescore_standalone_ms", "impl": impl,
            "value": round(sync_ms, 3), "device_ms": round(dev_ms, 3),
            "config": config,
        }), flush=True)
        outs[impl] = np.asarray(fn(cand, sp_ids, sp_w, q_ids, q_w))

    base = args.impls[0]
    for impl in args.impls[1:]:
        agree = bool(np.allclose(outs[base], outs[impl], rtol=1e-5, atol=1e-5))
        print(json.dumps({
            "metric": "rescore_agreement", "impl": impl, "vs": base,
            "value": agree,
            "max_abs_diff": float(np.max(np.abs(outs[base] - outs[impl]))),
        }), flush=True)

    if args.skip_fused:
        return
    for impl in args.impls:
        fused = partial(
            hybrid_fused_topk,
            k=10, fetch_k=args.fetch_k, depth=args.depth,
            exact_topk=False, rescore_impl=impl,
        )
        sync_ms, dev_ms = timeit(
            lambda d, s, i, w, a, bq, ci, cw: fused(d, s, i, w, a, bq, ci, cw),
            dense, sketch, sp_ids, sp_w, dq, sq, q_ids, q_w,
        )
        print(json.dumps({
            "metric": "hybrid_fused_full_ms", "impl": impl,
            "value": round(sync_ms, 3), "device_ms": round(dev_ms, 3),
            "qps_device": round(b / (dev_ms / 1000.0), 1) if dev_ms else None,
            "config": config,
        }), flush=True)


if __name__ == "__main__":
    main()

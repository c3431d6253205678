"""Hardware shape-smoke: drive tiny live stores across config corners.

The CPU test suite cannot reach TPU kernel lowering (`exact_rescore_dispatch`
and `bucket_kernel_supported` route off-TPU backends to XLA fallbacks), so a
config can pass 600+ tests and still fail Mosaic compilation on hardware —
exactly what happened when the 0.4.6 `rescore_impl="pallas"` default met a
`sparse_max_nnz=4` store (unsupported shape cast) and when the bucket kernel
met a single-query batch (sub-sublane tile). This script sweeps the corners
that matter on a REAL chip with sub-minute compiles per config:

  tier (bf16 / int8 / int4) x sparse_max_nnz (4 / 128 / 256) x batch
  (1 / 12) x candidate_impl (xla / bucket), all under the serving default
  rescore_impl="pallas", each asserting row parity against the same
  store config running scan/xla. nnz=256 covers the >128 lane-aligned
  arm of the rescore dispatch gate; batch=12 covers a non-multiple-of-8
  query tile (Mosaic sublane alignment).

Run (TPU required): python scripts/tpu_shape_smoke.py
Prints one JSON line per config; exits non-zero on any FAIL.
"""

from __future__ import annotations

import itertools
import json
import sys

import numpy as np

DIM, VOCAB, N = 16, 1024, 128


def build(rng, *, tier, nnz, rescore_impl, candidate_impl):
    from verbatim_rag_tpu.engine.store import DeviceVectorStore

    kwargs = {}
    if tier != "bf16":
        kwargs = {"dense_dtype": tier, "sketch_dtype": tier}
    store = DeviceVectorStore(
        dense_dim=DIM,
        sparse_vocab=VOCAB,
        sparse_max_nnz=nnz,
        block=128,
        rescore_impl=rescore_impl,
        candidate_impl=candidate_impl,
        **kwargs,
    )
    store.add_vectors(
        [
            {
                "id": f"r{i}",
                "text": f"t{i}",
                "metadata": {},
                "dense": rng.normal(size=DIM).astype(np.float32),
                "sparse": {
                    int(t): float(rng.random() + 0.05)
                    for t in rng.choice(np.arange(1, VOCAB), nnz, replace=False)
                },
            }
            for i in range(N)
        ]
    )
    store.flush()
    return store


def main() -> None:
    import jax

    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon"):
        print(json.dumps({"error": f"needs a TPU backend, got {platform}"}))
        sys.exit(1)

    failures = 0
    for tier, nnz, batch, cand in itertools.product(
        ("bfloat16", "int8", "int4"), (4, 128, 256), (1, 12), ("xla", "bucket")
    ):
        tag = {"tier": tier, "nnz": nnz, "batch": batch, "candidate_impl": cand}
        try:
            rng = np.random.default_rng(7)
            store = build(
                rng, tier="bf16" if tier == "bfloat16" else tier, nnz=nnz,
                rescore_impl="pallas", candidate_impl=cand,
            )
            rng_ref = np.random.default_rng(7)
            ref = build(
                rng_ref, tier="bf16" if tier == "bfloat16" else tier, nnz=nnz,
                rescore_impl="scan", candidate_impl="xla",
            )
            qrng = np.random.default_rng(13)
            qd = [qrng.normal(size=DIM).astype(np.float32) for _ in range(batch)]
            qs = [
                {int(t): float(qrng.random() + 0.1) for t in range(1, VOCAB, 5)}
                for _ in range(batch)
            ]
            got = store.query_batch(dense_queries=qd, sparse_queries=qs, top_k=5)
            want = ref.query_batch(dense_queries=qd, sparse_queries=qs, top_k=5)
            ids_got = [[h.id for h in row] for row in got]
            ids_want = [[h.id for h in row] for row in want]
            # The bucket kernel is an approximate selection family; at
            # N=128 the block is one 128-row bucket table with exactly
            # one row per bucket (block_rows=128, p=1), so the table is
            # exhaustive BY CONSTRUCTION and parity is exact here.
            status = "PASS" if ids_got == ids_want else "MISMATCH"
        except Exception as exc:  # noqa: BLE001 — each config must report
            status = f"{type(exc).__name__}: {str(exc)[:120]}"
        if status != "PASS":
            failures += 1
        print(json.dumps({**tag, "status": status}), flush=True)

    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

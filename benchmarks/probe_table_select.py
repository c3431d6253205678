"""A/B the bucket-table top-k strategies on hardware (round-5 #1).

The round-5 device trace (profile_section_trace.py) attributed 3.7 ms of
the composed section program to table selection: `lax.approx_max_k` over
the [512, 15616] packed table with k=256/recall 0.99 lowers to a FULL
SORT (PartialReduce cannot hit 0.99 at that k/width ratio), while the
XLA pipeline gets its selection fused into the matmul for ~1 ms.

Candidate fixes measured here, speed + candidate-overlap vs exact table
top-k (the quality contract is downstream: candidates feed the exact
rescore, so overlap of the FINAL hybrid lists is what recall_1m.py
gates; this probe reports the candidate-set overlap as the conservative
proxy):

  exact          lax.top_k over the table (baseline semantics)
  approx         lax.approx_max_k(recall_target=0.99)  [current default]
  approx_0.95    recall_target=0.95
  override       recall_target=0.95 + reduction_input_size_override=N —
                 the recall arithmetic runs against the ORIGINAL corpus
                 size (the table is already a bucket-max of those N rows,
                 so the claimed input size is the honest one); the
                 override lets PartialReduce actually reduce
  override_0.99  same with recall_target=0.99

Run: python benchmarks/probe_table_select.py [--width 15616 --batch 512]
"""

from __future__ import annotations

import argparse
import json
from functools import partial

import numpy as np

from profile_stages import timeit


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--width", type=int, default=15616)  # (1M/8192)*128
    parser.add_argument("--k", type=int, default=256)
    parser.add_argument("--n-orig", type=int, default=999_424)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from verbatim_rag_tpu.utils.jax_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    key = jax.random.PRNGKey(3)
    table = jax.random.normal(key, (args.batch, args.width), jnp.float32)

    k = args.k

    @jax.jit
    def sel_exact(t):
        return jax.lax.top_k(t, k)

    @jax.jit
    def sel_approx(t):
        return jax.lax.approx_max_k(t, k, recall_target=0.99, aggregate_to_topk=True)

    @jax.jit
    def sel_approx95(t):
        return jax.lax.approx_max_k(t, k, recall_target=0.95, aggregate_to_topk=True)

    @partial(jax.jit, static_argnames=())
    def sel_override95(t):
        return jax.lax.approx_max_k(
            t, k, recall_target=0.95, aggregate_to_topk=True,
            reduction_input_size_override=args.n_orig,
        )

    @jax.jit
    def sel_override99(t):
        return jax.lax.approx_max_k(
            t, k, recall_target=0.99, aggregate_to_topk=True,
            reduction_input_size_override=args.n_orig,
        )

    _, exact_idx = sel_exact(table)
    exact_sets = [set(np.asarray(r)) for r in exact_idx]

    for label, fn in (
        ("exact", sel_exact),
        ("approx_0.99", sel_approx),
        ("approx_0.95", sel_approx95),
        ("override_0.95", sel_override95),
        ("override_0.99", sel_override99),
    ):
        sync_ms, device_ms = timeit(fn, table)
        _, idx = fn(table)
        idx = np.asarray(idx)
        overlap = float(
            np.mean([len(set(r) & s) / k for r, s in zip(idx, exact_sets)])
        )
        print(
            json.dumps(
                {
                    "metric": f"table_select_{label}",
                    "device_ms": round(device_ms, 3),
                    "sync_ms": round(sync_ms, 3),
                    "overlap_vs_exact": round(overlap, 4),
                    "config": {"batch": args.batch, "width": args.width, "k": k},
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

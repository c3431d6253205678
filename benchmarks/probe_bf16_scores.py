"""Probe: materialize the [B, N] candidate-score matrix in bf16 vs f32.

ROADMAP #2 side-question. The fused hybrid program sits ~20% above a
~15.4 ms floor dominated by materializing both [512, 1M] f32 score
matrices between the matmuls and `approx_max_k`. Candidates feed an
exact f32 rescore downstream, so selection precision in bf16 is
quality-safe — if XLA fuses the down-cast into the matmul epilogue and
PartialReduce reads bf16 natively, the dominant HBM term halves.

Measured 2026-08-18 (v5e, device-honest): d=384 13.14 → 13.17 ms (no
change); d=768/k=256 19.39 → 28.33 ms (1.46× SLOWER); candidate overlap
0.973 / 0.990. Verdict: REJECTED — `approx_max_k` converts bf16 back to
f32 in a separate un-fused pass, so the traffic returns plus an extra
full read. The floor only moves with a fused matmul+selection kernel.

Run: python benchmarks/probe_bf16_scores.py  (real TPU; ~2 min warm)
"""

import json
import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from profile_stages import timeit


@partial(jax.jit, static_argnames=("k", "bf16"))
def mm_select(corpus, q, k, bf16=False):
    scores = jnp.dot(
        q.astype(corpus.dtype), corpus.T, preferred_element_type=jnp.float32
    )
    if bf16:
        scores = scores.astype(jnp.bfloat16)
    return jax.lax.approx_max_k(scores, k=k, recall_target=0.95)


def main() -> None:
    print("platform:", jax.devices()[0].platform, flush=True)
    n, b = 999_424, 512
    key = jax.random.PRNGKey(0)
    for dim, k in ((384, 20), (768, 256)):
        k1, k2, key = jax.random.split(key, 3)
        corpus = jax.random.normal(k1, (n, dim), jnp.bfloat16)
        q = jax.random.normal(k2, (b, dim), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        res = {}
        for bf16 in (False, True):
            sync, dev = timeit(lambda c, qq: mm_select(c, qq, k, bf16), corpus, q)
            res["bf16" if bf16 else "f32"] = dev
            print(
                json.dumps(
                    {
                        "dim": dim,
                        "k": k,
                        "scores": "bf16" if bf16 else "f32",
                        "sync_ms": round(sync, 2),
                        "device_ms": round(dev, 2),
                    }
                ),
                flush=True,
            )
        _, r_f32 = mm_select(corpus, q, k, False)
        _, r_b16 = mm_select(corpus, q, k, True)
        a, bb = np.asarray(r_f32), np.asarray(r_b16)
        ov = np.mean([len(set(a[i]) & set(bb[i])) / k for i in range(b)])
        print(
            json.dumps(
                {
                    "dim": dim,
                    "overlap": round(float(ov), 4),
                    "speedup": round(res["f32"] / res["bf16"], 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

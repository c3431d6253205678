"""Flash-attention BACKWARD dispatch sweep: Pallas vs XLA reference VJP.

`ops/flash_attention.py::FLASH_BWD_MIN_SEQ` (=1024) encodes a measured
crossover: at short sequence the XLA batched-matmul softmax backward runs
at roofline and overlaps with the rest of the step, while the opaque
Pallas custom-call forfeits that overlap (the same composition tax as the
serving section kernel); at long sequence the reference VJP materializes
f32 [B, H, S, S] probability tensors — S² memory that OOMs at S=8192 —
and the blockwise FlashAttention-2 backward (recompute from q·kᵀ + saved
logsumexp) is the only viable path. This bench reproduces that crossover
so the constant stays falsifiable on new hardware.

For each S it times fwd+bwd wall (value_and_grad of a scalar loss over
`flash_attention`) under both dispatch modes by pinning the module's
FLASH_BWD_MIN_SEQ around a freshly-jitted closure, and reports a grad
cosine agreement between the two modes as the correctness companion.

Head config is the production 150M highlighter's (H=12, D=64); batch is
scaled down as S grows so the token count stays comparable.

Run: PYTHONPATH=. python benchmarks/bench_flash_bwd.py [--seqs 512 2048 8192]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seqs", type=int, nargs="+", default=[512, 2048, 8192])
    parser.add_argument("--reps", type=int, default=8)
    parser.add_argument("--heads", type=int, default=12)
    parser.add_argument("--head-dim", type=int, default=64)
    parser.add_argument(
        "--token-budget", type=int, default=4096, help="B = max(1, budget // S)"
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from verbatim_rag_tpu.utils.jax_cache import (
        enable_persistent_compilation_cache,
        pin_platform_from_env,
    )

    pin_platform_from_env()
    enable_persistent_compilation_cache()

    # `import pkg.ops.flash_attention as fa` would bind the FUNCTION the ops
    # __init__ re-exports under the same name, not the module.
    import importlib

    fa = importlib.import_module("verbatim_rag_tpu.ops.flash_attention")

    rng = np.random.default_rng(0)

    def timed_grad(min_seq: int, q, k, v, lengths, reps: int) -> tuple[float, object]:
        """(wall ms per fwd+bwd, dq) with FLASH_BWD_MIN_SEQ pinned to min_seq.

        The dispatch reads the module global at TRACE time, so each mode
        gets a fresh closure -> fresh jit cache entry.
        """
        saved = fa.FLASH_BWD_MIN_SEQ
        fa.FLASH_BWD_MIN_SEQ = min_seq
        try:

            @jax.jit
            def loss_and_grad(q, k, v):
                def loss(q_):
                    out = fa.flash_attention(q_, k, v, lengths)
                    return jnp.sum(out * out)

                return jax.value_and_grad(loss)(q)

            _, dq = loss_and_grad(q, k, v)  # compile + warm (traces NOW,
            dq.block_until_ready()  # while the pin is active)
            start = time.perf_counter()
            for _ in range(reps):
                _, dq = loss_and_grad(q, k, v)
            dq.block_until_ready()
            return (time.perf_counter() - start) / reps * 1e3, dq
        finally:
            fa.FLASH_BWD_MIN_SEQ = saved

    for seq in args.seqs:
        b = max(1, args.token_budget // seq)
        shape = (b, seq, args.heads, args.head_dim)
        q = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        lengths = jnp.full((b,), seq, jnp.int32)

        row: dict[str, object] = {
            "metric": "flash_bwd_dispatch",
            "seq": seq,
            "batch": b,
            "heads": args.heads,
            "head_dim": args.head_dim,
        }
        ms_pallas, dq_pallas = timed_grad(0, q, k, v, lengths, args.reps)
        row["pallas_ms"] = round(ms_pallas, 2)
        try:
            ms_ref, dq_ref = timed_grad(10**9, q, k, v, lengths, args.reps)
            row["reference_ms"] = round(ms_ref, 2)
            row["speedup_pallas"] = round(ms_ref / ms_pallas, 2)
            a = np.asarray(dq_pallas, np.float32).ravel()
            c = np.asarray(dq_ref, np.float32).ravel()
            row["grad_cosine"] = round(
                float(np.dot(a, c) / (np.linalg.norm(a) * np.linalg.norm(c) + 1e-30)),
                6,
            )
        except Exception as exc:  # reference S² memory can OOM at long seq
            row["reference_ms"] = None
            row["reference_error"] = str(exc)[:160]
        row["dispatch_default"] = (
            "pallas" if seq >= fa.FLASH_BWD_MIN_SEQ else "reference"
        )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

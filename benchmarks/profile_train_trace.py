"""Device-trace the 150M training step: MFU + attribution (VERDICT r4 #8).

The 57 ms/step → ~64 TFLOP/s figure has been quoted since round 2 without
a profile. This harness jits the production train step (150M ModernBERT
token classifier, flash fwd + recompute bwd, optax AdamW) at the
production shape, traces a few steps, and reports:

  * module wall ms/step (the honest device time; the 57 ms figure
    carried host dispatch),
  * effective TFLOP/s and MFU vs the v5e bf16 peak (~197 TFLOP/s),
  * the top device ops (is the time flash-bwd recompute, matmuls, or
    optimizer/elementwise?),
  * a batch sweep (--batches 8 16 32) for the small-batch
    underutilization hypothesis.

FLOP model: 6 · params_matmul · tokens (fwd 2x + bwd 4x) + attention
12 · L · S² · H · tokens_factor — standard transformer accounting; exact
enough for an MFU statement.

Run: python benchmarks/profile_train_trace.py [--batches 8 16 32]
"""

from __future__ import annotations

import argparse
import json
import shutil
import time

import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, nargs="+", default=[8, 16, 32])
    parser.add_argument("--seq", type=int, default=512)
    parser.add_argument("--reps", type=int, default=6)
    parser.add_argument(
        "--no-flash",
        action="store_true",
        help="A/B arm: XLA bias-based attention instead of the Pallas flash "
        "forward — tests whether the opaque fwd custom call forfeits scan "
        "overlap at short seq the way the backward measurably does",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from verbatim_rag_tpu.utils.jax_cache import (
        enable_persistent_compilation_cache,
        pin_platform_from_env,
    )

    pin_platform_from_env()
    enable_persistent_compilation_cache()

    from verbatim_rag_tpu.models.config import TrainingConfig, modernbert_base_config
    from verbatim_rag_tpu.models.highlighter import init_highlighter_params
    from verbatim_rag_tpu.training.model import token_loss
    from verbatim_rag_tpu.training.trainer import make_optimizer, train_step
    from verbatim_rag_tpu.utils.profiling import trace_module_wall_ms

    config = modernbert_base_config(
        max_position_embeddings=args.seq, use_flash_attention=not args.no_flash
    )
    n_params = None

    # The PRODUCTION step (training/trainer.py::train_step): donated
    # params/opt_state buffers — a hand-rolled undonated step at this size
    # AOT-estimates 18.4 GB HBM and refuses to compile (measured; donation
    # is load-bearing at 150M, not a nicety).
    def step(params, opt_state, batch, optimizer):
        p, o, loss, _aux = train_step(
            params, opt_state, batch, config, optimizer, loss_fn=token_loss
        )
        return p, o, loss

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()

    for b in args.batches:
        batch = {
            "input_ids": jnp.asarray(
                rng.integers(3, config.vocab_size, (b, args.seq)), jnp.int32
            ),
            "attention_mask": jnp.ones((b, args.seq), jnp.int32),
            "labels": jnp.asarray(rng.integers(0, 2, (b, args.seq)), jnp.int32),
            "label_mask": jnp.ones((b, args.seq), jnp.int32),
        }
        params = init_highlighter_params(jax.random.PRNGKey(0), config)
        if n_params is None:
            n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
        optimizer = make_optimizer(TrainingConfig(learning_rate=3e-4))
        opt_state = optimizer.init(params)
        p, o, loss = step(params, opt_state, batch, optimizer)  # compile + warm
        np.asarray(loss)
        print(f"# b={b} warm t={time.perf_counter() - t0:.1f}s", flush=True)

        logdir = f"/tmp/train_trace_b{b}"
        shutil.rmtree(logdir, ignore_errors=True)
        jax.profiler.start_trace(logdir)
        out = None
        for _ in range(args.reps):
            p, o, out = step(p, o, batch, optimizer)
        np.asarray(out)
        jax.profiler.stop_trace()

        wall_ms = trace_module_wall_ms(logdir) / args.reps

        # Per-op attribution (top 8).
        import glob

        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

        xs = xplane_pb2.XSpace()
        path = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))[-1]
        with open(path, "rb") as fh:
            xs.ParseFromString(fh.read())
        agg: dict[str, float] = {}
        for plane in xs.planes:
            if not plane.name.startswith("/device:TPU"):
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = plane.event_metadata[ev.metadata_id].name
                    key = name.split(" = ")[0][:60]
                    agg[key] = agg.get(key, 0.0) + ev.duration_ps / 1e9
        top = sorted(agg.items(), key=lambda kv: -kv[1])[:8]
        shutil.rmtree(logdir, ignore_errors=True)

        tokens = b * args.seq
        # matmul params dominate (embedding lookups are gathers); 6N·T for
        # fwd+bwd, + attention 12·L·S²·H·B/1e12 both directions.
        L, H = config.num_layers, config.hidden_size
        matmul_flops = 6.0 * n_params * tokens
        attn_flops = 12.0 * L * args.seq * args.seq * H * b
        tflop = (matmul_flops + attn_flops) / 1e12
        tflops = tflop / (wall_ms / 1e3)
        print(
            json.dumps(
                {
                    "metric": "train_step_150m_trace",
                    "batch": b,
                    "seq": args.seq,
                    "flash": not args.no_flash,
                    "module_wall_ms": round(wall_ms, 2),
                    "tokens_per_s": round(tokens / (wall_ms / 1e3), 1),
                    "tflops_effective": round(tflops, 1),
                    "mfu_vs_197": round(tflops / V5E_BF16_PEAK_TFLOPS, 3),
                    "params": n_params,
                    "top_ops": [
                        {"op": k, "ms": round(v / args.reps, 3)} for k, v in top
                    ],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Drill into the 150M train-step trace: EXCLUSIVE per-op attribution.

`profile_train_trace.py` reports top ops by inclusive duration, which on a
scan-over-layers model surfaces only the opaque `while` wrappers. This
companion computes exclusive time (stack-based: parent minus children on
the XLA Ops timeline) and groups ops into phases — attention forward
(pallas custom-call), attention backward (the reference-recompute jnp VJP),
other matmuls (fusions with dots), optimizer/elementwise — so the MFU gap
has names (VERDICT r4 #8).

Also traces the forward-only eval step at the same shape to split
fwd vs bwd+opt.

Run: python benchmarks/analyze_train_trace.py [--batch 8] [--reps 6]
"""

from __future__ import annotations

import argparse
import glob
import json
import shutil
import time


def exclusive_by_name(logdir: str) -> tuple[dict[str, float], dict[str, float]]:
    """(exclusive ms by event name, inclusive ms by name) on XLA Ops lines."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    xs = xplane_pb2.XSpace()
    path = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))[-1]
    with open(path, "rb") as fh:
        xs.ParseFromString(fh.read())
    excl: dict[str, float] = {}
    incl: dict[str, float] = {}
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = sorted(
                (
                    (
                        ev.offset_ps,
                        ev.offset_ps + ev.duration_ps,
                        plane.event_metadata[ev.metadata_id].name,
                    )
                    for ev in line.events
                ),
                key=lambda t: (t[0], -t[1]),
            )
            stack: list[list] = []  # [start, end, name, child_time]
            for start, end, name in evs:
                while stack and stack[-1][1] <= start:
                    s = stack.pop()
                    excl[s[2]] = excl.get(s[2], 0.0) + (s[1] - s[0] - s[3]) / 1e9
                    if stack:
                        stack[-1][3] += s[1] - s[0]
                incl[name] = incl.get(name, 0.0) + (end - start) / 1e9
                stack.append([start, end, name, 0.0])
            while stack:
                s = stack.pop()
                excl[s[2]] = excl.get(s[2], 0.0) + (s[1] - s[0] - s[3]) / 1e9
                if stack:
                    stack[-1][3] += s[1] - s[0]
    return excl, incl


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--seq", type=int, default=512)
    parser.add_argument("--reps", type=int, default=6)
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

    from verbatim_rag_tpu.models.config import TrainingConfig, modernbert_base_config
    from verbatim_rag_tpu.models.highlighter import init_highlighter_params
    from verbatim_rag_tpu.training.model import token_loss
    from verbatim_rag_tpu.training.trainer import eval_step, make_optimizer, train_step
    from verbatim_rag_tpu.utils.profiling import trace_module_wall_ms

    config = modernbert_base_config(max_position_embeddings=args.seq)
    rng = np.random.default_rng(0)
    b = args.batch
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(3, config.vocab_size, (b, args.seq)), jnp.int32
        ),
        "attention_mask": jnp.ones((b, args.seq), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 2, (b, args.seq)), jnp.int32),
        "label_mask": jnp.ones((b, args.seq), jnp.int32),
    }
    params = init_highlighter_params(jax.random.PRNGKey(0), config)
    optimizer = make_optimizer(TrainingConfig(learning_rate=3e-4))
    opt_state = optimizer.init(params)

    t0 = time.perf_counter()

    # --- forward-only (eval) ---------------------------------------------
    loss, _ = eval_step(params, batch, config, token_loss)
    np.asarray(loss)
    print(f"# eval warm t={time.perf_counter() - t0:.1f}s", flush=True)
    logdir = "/tmp/an_eval_trace"
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir)
    out = None
    for _ in range(args.reps):
        out, _ = eval_step(params, batch, config, token_loss)
    np.asarray(out)
    jax.profiler.stop_trace()
    fwd_ms = trace_module_wall_ms(logdir) / args.reps
    shutil.rmtree(logdir, ignore_errors=True)
    print(json.dumps({"phase": "eval_fwd_only", "module_wall_ms": round(fwd_ms, 2)}))

    # --- train step -------------------------------------------------------
    p, o, loss, _aux = train_step(params, opt_state, batch, config, optimizer, token_loss)
    np.asarray(loss)
    print(f"# train warm t={time.perf_counter() - t0:.1f}s", flush=True)
    logdir = "/tmp/an_train_trace"
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir)
    out = None
    for _ in range(args.reps):
        p, o, out, _aux = train_step(p, o, batch, config, optimizer, token_loss)
    np.asarray(out)
    jax.profiler.stop_trace()
    step_ms = trace_module_wall_ms(logdir) / args.reps

    excl, incl = exclusive_by_name(logdir)
    shutil.rmtree(logdir, ignore_errors=True)
    top = sorted(excl.items(), key=lambda kv: -kv[1])[:24]
    print(json.dumps({"phase": "train_step", "module_wall_ms": round(step_ms, 2)}))
    for name, ms in top:
        print(f"  {ms / args.reps:8.3f} ms  {name[:100]}", flush=True)
    total_excl = sum(excl.values()) / args.reps
    print(json.dumps({"sum_exclusive_ms": round(total_excl, 2)}))


if __name__ == "__main__":
    main()

"""Device-trace attribution of the composed hybrid serving programs.

VERDICT r4 #2: the section kernel's residual ~3 ms (10.5 measured vs a
~8.8 ms serial MXU+DMA budget) and the composed program's post-kernel
tail (~7.2 ms) were never attributed with a real profiler — every prior
hypothesis was tested by ablation only. This harness runs the TWO
composed serving programs (XLA pipeline vs section kernel, both with the
pallas rescore) under `jax.profiler` on the real chip, parses the
captured xplane protobuf, and prints per-op device time so the residual
is a measurement, not a guess.

What it answers:
  * inside the composed SECTION program: custom-call (kernel) ms vs
    gather ms vs rescore-kernel ms vs top-k/sort ms vs everything else
  * inside the composed XLA program: how the same stages cost when XLA
    is free to software-pipeline them against each other
  * the section kernel alone: its exact custom-call duration (the
    r4 accounting inferred it by subtraction)

Run on the real chip: python benchmarks/profile_section_trace.py
  [--int8] [--n 999424 --batch 512] [--reps 8] [--keep-traces]
Prints one JSON line per program with the top ops and category sums.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import shutil
import time

import numpy as np

from profile_stages import _retry_compile, timeit


def _parse_xplane(logdir: str) -> list[tuple[str, float, int]]:
    """All (op_name, total_ms, count) rows from the device plane's
    "XLA Ops" line, aggregated over the traced iterations."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane.pb under {logdir}")
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as fh:
        xs.ParseFromString(fh.read())
    agg: dict[str, list[float]] = {}
    module_ms = 0.0
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                # Module wall = per-call device time INCLUDING inter-op
                # gaps (DMA waits, scheduling bubbles) that per-op
                # durations miss.
                module_ms += sum(ev.duration_ps / 1e9 for ev in line.events)
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                cur = agg.setdefault(name, [0.0, 0])
                cur[0] += ev.duration_ps / 1e9  # ps -> ms
                cur[1] += 1
    rows = [(k, v[0], v[1]) for k, v in agg.items()]
    return rows, module_ms


_CATEGORIES = (
    ("pallas_section", re.compile(r"section_kernel|custom-call.*section")),
    ("pallas_rescore", re.compile(r"rescore_kernel|_rescore")),
    ("gather", re.compile(r"gather|dynamic-slice")),
    ("topk_sort", re.compile(r"sort|top-k|PartialReduce|partial-reduce|approx")),
    ("convert_copy", re.compile(r"convert|copy|transpose|bitcast")),
    ("fusion_other", re.compile(r"fusion|reduce|dot|broadcast|iota|select")),
)


def _categorize(name: str) -> str:
    low = name.lower()
    if "custom-call" in low or "custom_call" in low:
        if "rescore" in low:
            return "pallas_rescore"
        return "pallas_custom_call"
    for cat, pat in _CATEGORIES:
        if pat.search(low):
            return cat
    return "other"


def summarize(logdir: str, reps: int, label: str, top: int = 14) -> dict:
    rows, module_ms = _parse_xplane(logdir)
    rows.sort(key=lambda r: -r[1])
    cats: dict[str, float] = {}
    for name, ms, _count in rows:
        cats[_categorize(name)] = cats.get(_categorize(name), 0.0) + ms
    total = sum(ms for _n, ms, _c in rows)
    out = {
        "metric": f"trace_{label}",
        "unit": "ms_per_call",
        "module_wall_ms": round(module_ms / reps, 3),
        "device_total_ms": round(total / reps, 3),
        "categories": {k: round(v / reps, 3) for k, v in sorted(cats.items(), key=lambda i: -i[1])},
        "top_ops": [
            {"op": n[:140], "ms": round(ms / reps, 3), "n": c // reps}
            for n, ms, c in rows[:top]
        ],
    }
    return out


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
    parser.add_argument("--reps", type=int, default=8)
    parser.add_argument("--int8", action="store_true")
    parser.add_argument("--keep-traces", action="store_true")
    parser.add_argument(
        "--programs", nargs="+",
        default=["xla", "section", "kernel_only"],
        choices=["xla", "section", "kernel_only"],
    )
    parser.add_argument("--block-cols", type=int, default=16384,
                        help="section kernel grid (16384 = serving default)")
    parser.add_argument("--table-select", default="approx",
                        choices=["exact", "approx", "approx95"])
    parser.add_argument(
        "--narrow-forward", action="store_true",
        help="int16 term ids + float16 weights in the forward index "
        "(sparse_ids_dtype/sparse_weight_dtype store knobs): halves the "
        "rescore gather traffic",
    )
    args = parser.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from functools import partial

    from verbatim_rag_tpu.utils.jax_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from verbatim_rag_tpu.ops.dense import normalize_rows, quantize_rows_int8
    from verbatim_rag_tpu.ops.hybrid import hybrid_fused_topk
    from verbatim_rag_tpu.ops.section import hybrid_section_topk, section_bucket_tables

    t_start = time.perf_counter()

    def mark(msg):
        print(f"# {msg} t={time.perf_counter() - t_start:.1f}s", flush=True)

    rng = np.random.default_rng(5)
    n, b = args.n, args.batch
    key = jax.random.PRNGKey(5)
    k_dense, k_sketch, k_ids, k_w = jax.random.split(key, 4)
    dense = jax.jit(normalize_rows)(jax.random.normal(k_dense, (n, args.dim), jnp.float32))
    sketch = jax.jit(normalize_rows)(jax.random.normal(k_sketch, (n, args.proj), jnp.float32))
    dense_scale = sketch_scale = None
    if args.int8:
        dense, dense_scale = jax.jit(quantize_rows_int8)(dense)
        sketch, sketch_scale = jax.jit(quantize_rows_int8)(sketch)
    else:
        dense = dense.astype(jnp.bfloat16)
        sketch = sketch.astype(jnp.bfloat16)
    dense_t = jnp.swapaxes(dense, 0, 1)
    sketch_t = jnp.swapaxes(sketch, 0, 1)
    sp_ids = jax.random.randint(k_ids, (n, args.nnz), 1, 30522, jnp.int32)
    sp_w = jax.random.uniform(k_w, (n, args.nnz), dtype=jnp.float32)
    if args.narrow_forward:
        sp_ids = sp_ids.astype(jnp.int16)
        sp_w = sp_w.astype(jnp.float16)
    dq = normalize_rows(jnp.asarray(rng.normal(size=(b, args.dim)), jnp.float32))
    sq = normalize_rows(jnp.asarray(rng.normal(size=(b, args.proj)), jnp.float32))
    q_ids = jnp.asarray(rng.integers(1, 30522, size=(b, args.qnnz)), jnp.int32)
    q_w = jnp.asarray(rng.random(size=(b, args.qnnz)), jnp.float32)
    jnp.asarray(sp_w).block_until_ready()
    mark("corpus on device")

    programs = {}
    if "xla" in args.programs:
        programs["xla_composed"] = partial(
            hybrid_fused_topk, dense, sketch, sp_ids, sp_w, dq, sq, q_ids, q_w,
            k=10, fetch_k=args.fetch_k, depth=args.depth, exact_topk=False,
            dense_scale=dense_scale, sketch_scale=sketch_scale,
            rescore_impl="pallas",
        )
    if "section" in args.programs:
        programs["section_composed"] = partial(
            hybrid_section_topk, dense_t, sketch_t, sp_ids, sp_w, dq, sq,
            q_ids, q_w, k=10, fetch_k=args.fetch_k, depth=args.depth,
            mask=None, dense_scale=dense_scale, sketch_scale=sketch_scale,
            rescore_impl="pallas", table_select=args.table_select,
            block_cols=args.block_cols,
        )
    if "kernel_only" in args.programs:
        scales = (dense_scale, sketch_scale) if args.int8 else ()
        programs["section_kernel_only"] = partial(
            section_bucket_tables, (dense_t, sketch_t), (dq, sq), None,
            scales=scales, block_cols=args.block_cols,
        )

    results = []
    for label, fn in programs.items():
        mark(f"warm {label}")
        sync_ms, device_ms = timeit(fn, warmup=2, reps=4)
        mark(f"{label} device_ms={device_ms:.2f}")
        logdir = f"/tmp/section_trace/{label}"
        shutil.rmtree(logdir, ignore_errors=True)
        jax.profiler.start_trace(logdir)
        out = None
        for _ in range(args.reps):
            out = fn()
        leaf = out[0] if isinstance(out, tuple) else out
        np.asarray(leaf)
        jax.profiler.stop_trace()
        summary = summarize(logdir, args.reps, label)
        summary["timed_device_ms"] = round(device_ms, 3)
        summary["timed_sync_ms"] = round(sync_ms, 3)
        summary["config"] = {
            "n": n, "batch": b, "int8": bool(args.int8),
            "block_cols": args.block_cols, "table_select": args.table_select,
            "narrow_forward": bool(args.narrow_forward),
        }
        results.append(summary)
        print(json.dumps(summary), flush=True)
        if not args.keep_traces:
            shutil.rmtree(logdir, ignore_errors=True)


if __name__ == "__main__":
    main()

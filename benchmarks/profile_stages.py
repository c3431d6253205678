"""Decompose the hybrid serving program into stage timings on real hardware.

The headline device program (`ops/hybrid.py::hybrid_fused_topk`) has four
cost centers; this profiler times each in isolation at the serving shapes so
optimization effort goes where the milliseconds are:

  dense_mm+select    [B,d]x[d,N] matmul + approx_max_k(fetch_k)
  sketch_mm+select   [B,dp]x[dp,N] matmul + approx_max_k(depth)
  rescore            exact forward-index rescore of [B, depth] candidates
  fuse               top_k over rescored + weighted RRF

Each stage runs as its own jitted program with a host readback (honest sync
on tunneled backends). The full fused program is timed too — the gap
between sum-of-stages and fused is XLA's inter-stage fusion profit.

Run: python benchmarks/profile_stages.py [--n 999424 --batch 512 --int8]
Prints one JSON line per timing.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _retry_compile(fn, *args, attempts=6, sleep_s=45):
    """First call of a jitted stage, retried on tunnel compile failures.

    The tunneled backend's remote-compile service drops large fresh
    programs intermittently (`UNAVAILABLE .../remote_compile: Broken
    pipe`) while cached executables keep running. Each successful compile
    lands in the persistent XLA cache, so retries — even across process
    restarts — make monotonic progress through the stage programs.
    """
    for attempt in range(attempts):
        try:
            return fn(*args)
        except Exception as exc:  # jax.errors.JaxRuntimeError on tunnel drop
            if "remote_compile" not in str(exc) and "UNAVAILABLE" not in str(exc):
                raise
            print(
                f"# compile attempt {attempt + 1}/{attempts} failed "
                f"({str(exc).splitlines()[0][:120]}); retrying in {sleep_s}s",
                flush=True,
            )
            time.sleep(sleep_s)
    raise RuntimeError(f"stage never compiled after {attempts} attempts")


def timeit(fn, *args, warmup=2, reps=6):
    """Returns (sync_ms, pipelined_ms).

    sync_ms: median of per-call host-synchronous timings — includes one
    tunnel round-trip (~31 ms on this setup) per call, which distorts
    per-stage attribution. pipelined_ms: dispatch `reps` calls async and
    sync once at the end — the device executes them back to back, so
    (total − one readback) / reps is an honest per-call DEVICE time.
    """

    def run():
        out = fn(*args)
        np.asarray(out[0] if isinstance(out, tuple) else out)

    _retry_compile(run)
    for _ in range(max(warmup - 1, 0)):
        run()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out[0] if isinstance(out, tuple) else out)
    pipelined = (time.perf_counter() - t0) / reps
    return float(np.median(times) * 1000), float(pipelined * 1000)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=999_424)  # 1M rounded to 8192
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--dim", type=int, default=384)
    parser.add_argument("--proj", type=int, default=768)
    parser.add_argument("--nnz", type=int, default=128)
    parser.add_argument("--qnnz", type=int, default=32)
    parser.add_argument("--depth", type=int, default=256)
    parser.add_argument("--fetch-k", type=int, default=20)
    parser.add_argument("--int8", action="store_true", help="int8 dense + int8 sketches")
    args = parser.parse_args()

    import os

    import jax

    # The env var alone does not override a plugin backend (tunneled TPU);
    # pin explicitly when the caller asked for CPU.
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from functools import partial

    from verbatim_rag_tpu.ops.dense import (
        candidate_select,
        dense_scores,
        normalize_rows,
        quantize_rows_int8,
    )
    from verbatim_rag_tpu.ops.fusion import rrf_fuse_device
    from verbatim_rag_tpu.ops.hybrid import (
        NEG_INF,
        exact_rescore_device,
        hybrid_fused_topk,
    )

    def mark(msg):
        # Progress markers: on a wedged tunnel the useful diagnostic is
        # WHERE the run stopped, not just that it produced no timings.
        print(f"# {msg} t={time.perf_counter() - t_start:.1f}s", flush=True)

    t_start = time.perf_counter()
    rng = np.random.default_rng(5)
    n, b = args.n, args.batch
    # Corpus arrays generated ON DEVICE (same rule as bench.py): a [1M, 768]
    # f32 host array is ~3 GB — shipping it through the tunnel hangs for
    # longer than the whole benchmark.
    key = jax.random.PRNGKey(5)
    k_dense, k_sketch, k_ids, k_w = jax.random.split(key, 4)
    dense = jax.jit(normalize_rows)(jax.random.normal(k_dense, (n, args.dim), jnp.float32))
    dense.block_until_ready()
    mark("dense corpus on device")
    sketch = jax.jit(normalize_rows)(jax.random.normal(k_sketch, (n, args.proj), jnp.float32))
    sketch.block_until_ready()
    mark("sketch corpus on device")
    dense_scale = sketch_scale = None
    if args.int8:
        dense, dense_scale = jax.jit(quantize_rows_int8)(dense)
        sketch, sketch_scale = jax.jit(quantize_rows_int8)(sketch)
    else:
        dense = dense.astype(jnp.bfloat16)
        sketch = sketch.astype(jnp.bfloat16)
    sp_ids = jax.random.randint(k_ids, (n, args.nnz), 1, 30522, jnp.int32)
    sp_w = jax.random.uniform(k_w, (n, args.nnz), dtype=jnp.float32)
    dq = normalize_rows(jnp.asarray(rng.normal(size=(b, args.dim)), jnp.float32))
    sq = normalize_rows(jnp.asarray(rng.normal(size=(b, args.proj)), jnp.float32))
    q_ids = jnp.asarray(rng.integers(1, 30522, size=(b, args.qnnz)), jnp.int32)
    q_w = jnp.asarray(rng.random(size=(b, args.qnnz)), jnp.float32)

    jnp.asarray(sp_w).block_until_ready()
    mark("sparse corpus + queries on device")

    sel = candidate_select(False)

    # The corpus arrays are jit ARGUMENTS, never closure captures: a
    # closed-over concrete array lowers as a dense constant inside the HLO
    # module, so the [1M, 768] sketch matrix alone inflated the module to
    # ~3 GB — the serving programs (`ops/hybrid.py`) compile these shapes
    # fine over the same tunnel precisely because they take the corpus as
    # runtime parameters. (Observed live: the closure version wedged the
    # remote-compile RPC at 10 GB client RSS; this version compiles in
    # seconds.)
    @jax.jit
    def stage_dense(dense, dense_scale, dq):
        s = dense_scores(dense, dq, dense_scale)
        return sel(s, k=args.fetch_k)

    @jax.jit
    def stage_sketch(sketch, sketch_scale, sq):
        s = dense_scores(sketch, sq, sketch_scale)
        return sel(s, k=args.depth)

    mark("compiling stage_sketch")
    cand = np.asarray(_retry_compile(stage_sketch, sketch, sketch_scale, sq)[1])
    cand_dev = jnp.asarray(cand)
    mark("stage_sketch compiled")

    @jax.jit
    def stage_rescore(sp_ids, sp_w, cand_dev, q_ids, q_w):
        return exact_rescore_device(cand_dev, sp_ids, sp_w, q_ids, q_w)

    @jax.jit
    def stage_fuse(exact, cand_dev, d_rows):
        r_top, r_pos = jax.lax.top_k(exact, args.fetch_k)
        s_rows = jnp.take_along_axis(cand_dev, r_pos, axis=1)
        s_rows = jnp.where(r_top > NEG_INF / 2, s_rows, -1)
        stacked = jnp.stack([d_rows, s_rows])
        w = jnp.asarray([0.5, 0.5], jnp.float32)
        return rrf_fuse_device(stacked, w, k=10, rrf_k=60)

    mark("compiling stage_dense")
    d_rows = _retry_compile(stage_dense, dense, dense_scale, dq)[1]
    mark("compiling stage_rescore")
    exact = _retry_compile(stage_rescore, sp_ids, sp_w, cand_dev, q_ids, q_w)
    mark("precomputes done; timing stages")

    fused = partial(
        hybrid_fused_topk,
        dense, sketch, sp_ids, sp_w,
        k=10, fetch_k=args.fetch_k, depth=args.depth, exact_topk=False,
        dense_scale=dense_scale, sketch_scale=sketch_scale,
    )

    config = {
        "n": n, "batch": b, "int8": bool(args.int8),
        "depth": args.depth, "fetch_k": args.fetch_k,
    }

    def report(key, sync_ms, device_ms):
        print(
            json.dumps(
                {"metric": f"stage_{key}", "value": round(sync_ms, 3),
                 "device_ms": round(device_ms, 3), "unit": "ms",
                 "config": config}
            ),
            flush=True,  # piped runs must not lose results on timeout
        )

    total_sync = total_dev = 0.0
    for key, fn, fargs in (
        ("dense_mm_select_ms", stage_dense, (dense, dense_scale, dq)),
        ("sketch_mm_select_ms", stage_sketch, (sketch, sketch_scale, sq)),
        ("rescore_ms", stage_rescore, (sp_ids, sp_w, cand_dev, q_ids, q_w)),
        ("fuse_ms", stage_fuse, (exact, cand_dev, d_rows)),
    ):
        sync_ms, device_ms = timeit(fn, *fargs)
        total_sync += sync_ms
        total_dev += device_ms
        report(key, sync_ms, device_ms)
    # Fuse-stage A/B: shifted-masked-adds serving impl vs the scatter
    # segment-sum reference (ops/fusion.py keeps both; same math).
    from verbatim_rag_tpu.ops.fusion import _rrf_fuse_scatter

    @jax.jit
    def stage_fuse_scatter(exact, cand_dev, d_rows):
        r_top, r_pos = jax.lax.top_k(exact, args.fetch_k)
        s_rows = jnp.take_along_axis(cand_dev, r_pos, axis=1)
        s_rows = jnp.where(r_top > NEG_INF / 2, s_rows, -1)
        stacked = jnp.stack([d_rows, s_rows])
        w = jnp.asarray([0.5, 0.5], jnp.float32)
        return _rrf_fuse_scatter(stacked, w, k=10, rrf_k=60)

    report("fuse_scatter_ms", *timeit(stage_fuse_scatter, exact, cand_dev, d_rows))
    report("sum_of_stages_ms", total_sync, total_dev)
    report("fused_full_ms", *timeit(lambda: fused(dq, sq, q_ids, q_w)))


if __name__ == "__main__":
    main()

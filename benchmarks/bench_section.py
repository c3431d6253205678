"""Measure the whole-candidate-section kernel (ops/section.py) on hardware.

The round-3 program matrix proved per-stage Pallas kernels lose in
composition (benchmarks/RESULTS.md); this harness measures the round-4
answer — ONE kernel for both candidate matmuls + in-VMEM selection — at
the serving point [B=512, N~1M], against the XLA candidate section it
must beat:

  xla_section      dense matmul+approx_max_k(20) AND sketch
                   matmul+approx_max_k(256) composed in one jit (the
                   serving program's candidate section, overlap included)
  section[cfg]     the fused kernel at a (block_cols, dot_chunk, q_block)
                   sweep point, + the table top-ks to the same
                   (fetch_k, depth) contract

Also records candidate-list overlap vs the exact-scan ground truth for
both paths (the quality gate: the section kernel's one-winner-per-
(block_cols/128)-rows family must not lose candidates the serving
depth/rescore can't recover).

Run: python benchmarks/bench_section.py [--int8] [--n 999424 --batch 512]
Prints one JSON line per config.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from profile_stages import timeit


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=999_424)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--fetch-k", type=int, default=20)
    parser.add_argument("--depth", type=int, default=256)
    parser.add_argument("--int8", action="store_true")
    parser.add_argument(
        "--configs", nargs="+", default=None,
        help="block_cols:dot_chunk:q_block[:vmem_mb] tuples (default sweep)",
    )
    parser.add_argument("--skip-xla", action="store_true")
    parser.add_argument(
        "--skip-gt", action="store_true",
        help="skip exact-scan ground truth + overlap accounting (pure "
        "timing sweeps; the quality gate run must omit this)",
    )
    parser.add_argument("--score-bf16", action="store_true")
    parser.add_argument(
        "--no-pack", action="store_true",
        help="skeleton probe: running max WITHOUT the position pack "
        "(row decode meaningless — timing only, measures the dot+max floor)",
    )
    parser.add_argument(
        "--no-reduce", action="store_true",
        help="skeleton probe: skip the running-max reads of 15/16 of each "
        "score tile — measures the MXU+DMA floor (timing only)",
    )
    parser.add_argument(
        "--no-mask", action="store_true",
        help="mask=None (bulk-loaded store, capacity == rows): saves one "
        "VPU add per score element in the kernel",
    )
    parser.add_argument(
        "--arms", default="both", choices=("both", "dense", "sketch"),
        help="single-arm decomposition probe",
    )
    parser.add_argument(
        "--table-select", default="exact", choices=("exact", "approx", "approx95"),
        help="table top-k impl: exact lax.top_k vs approx_max_k(0.99)",
    )
    parser.add_argument(
        "--no-topk", action="store_true",
        help="time the Pallas kernel ALONE (skip the table top-k decode) — "
        "separates kernel cost from lax.top_k over the bucket table",
    )
    parser.add_argument(
        "--full", action="store_true",
        help="A/B the FULL hybrid program (candidates + rescore + RRF): "
        "hybrid_section_topk vs hybrid_fused_topk (the serving default)",
    )
    args = parser.parse_args()

    import os

    import jax

    from verbatim_rag_tpu.utils.jax_cache import enable_persistent_compilation_cache

    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    enable_persistent_compilation_cache()
    import jax.numpy as jnp

    interpret = jax.devices()[0].platform not in ("tpu", "axon")

    from functools import partial

    from verbatim_rag_tpu.ops.dense import candidate_select, dense_scores
    from verbatim_rag_tpu.ops.section import section_bucket_tables, table_topk

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dense = jax.random.normal(k1, (args.n, 384), jnp.bfloat16)
    sketch = jax.random.normal(k2, (args.n, 768), jnp.bfloat16)
    dq = jax.random.normal(k3, (args.batch, 384), jnp.float32)
    sq = jax.random.normal(k4, (args.batch, 768), jnp.float32)
    mask = jnp.ones(args.n, bool)
    d_scale = s_scale = None
    if args.int8:
        from verbatim_rag_tpu.ops.dense import quantize_rows_int8

        dense, d_scale = jax.jit(quantize_rows_int8)(dense)
        sketch, s_scale = jax.jit(quantize_rows_int8)(sketch)

    # Transposed copies for the section kernel (one-time flush cost in the
    # store; materialized here outside the timed region). On-device
    # transpose, like `DeviceVectorStore._section_transposed` — the old
    # np.asarray round-trip pulled ~2.2 GB through the tunnel and
    # dominated the harness wall time.
    dense_t = jnp.swapaxes(dense, 0, 1)
    sketch_t = jnp.swapaxes(sketch, 0, 1)
    np.asarray(dense_t[:1, :1]), np.asarray(sketch_t[:1, :1])  # materialize

    if args.full:
        run_full_program_ab(args, dense, sketch, dense_t, sketch_t, dq, sq,
                            mask, d_scale, s_scale, interpret)
        return

    @jax.jit
    def xla_section(dn, sk, q1, q2, m, ds, ss):
        s1 = dense_scores(dn, q1, ds)
        s1 = jnp.where(m[None, :], s1, -1e30)
        d_top, d_rows = candidate_select(False)(s1, k=args.fetch_k)
        s2 = dense_scores(sk, q2, ss)
        s2 = jnp.where(m[None, :], s2, -1e30)
        s_top, s_rows = candidate_select(False)(s2, k=args.depth)
        return d_rows, s_rows

    if not args.skip_xla:
        sync, dev = timeit(xla_section, dense, sketch, dq, sq, mask, d_scale, s_scale)
        print(json.dumps({
            "impl": "xla_section", "sync_ms": round(sync, 2),
            "device_ms": round(dev, 2), "int8": args.int8,
        }), flush=True)
    x_rows_d, x_rows_s = jax.jit(xla_section)(
        dense, sketch, dq, sq, mask, d_scale, s_scale
    )
    x_rows_d, x_rows_s = np.asarray(x_rows_d), np.asarray(x_rows_s)

    # Exact ground truth for overlap accounting. The top-k runs ON DEVICE
    # per column chunk (readback = [B, k] per chunk, not the [B, N] score
    # matrix — a 2 GB readback over the tunnel cost the first version of
    # this harness ~7 min), then a host merge of the per-chunk winners.
    def exact_rows(corpus, q, k):
        step = 131072

        @jax.jit
        def chunk_topk(blk, scale, q):
            s = blk.astype(jnp.float32)
            if scale is not None:
                s = s * scale
            return jax.lax.top_k(jnp.dot(q, s.T), k)

        vals, idxs = [], []
        for s0 in range(0, args.n, step):
            blk = corpus[s0 : s0 + step]
            scale = None
            if hasattr(blk, "dtype") and blk.dtype == jnp.int8:
                scale = (d_scale if corpus is dense else s_scale)[s0 : s0 + step]
            v, i = chunk_topk(blk, scale, q)
            vals.append(np.asarray(v))
            idxs.append(np.asarray(i) + s0)
        v = np.concatenate(vals, axis=1)
        i = np.concatenate(idxs, axis=1)
        if v.shape[1] <= k:
            return i
        sel = np.argpartition(-v, k, axis=1)[:, :k]
        return np.take_along_axis(i, sel, axis=1)  # unordered top-k set

    def overlap(rows, gt):
        return float(np.mean([
            len(set(rows[i].tolist()) & set(gt[i].tolist())) / gt.shape[1]
            for i in range(rows.shape[0])
        ]))

    if args.skip_gt:
        gt_d = gt_s = None
    else:
        gt_d = exact_rows(dense, dq, args.fetch_k)
        gt_s = exact_rows(sketch, sq, args.depth)
        print(json.dumps({
            "impl": "xla_section_overlap",
            "dense_overlap": round(overlap(x_rows_d, gt_d), 4),
            "sketch_overlap": round(overlap(x_rows_s, gt_s), 4),
        }), flush=True)

    configs = args.configs or [
        "8192:2048:512", "8192:2048:256", "16384:2048:512", "4096:2048:512",
        "8192:1024:512",
    ]
    for cfg in configs:
        parts = [int(x) for x in cfg.split(":")]
        bc, dc, qb = parts[:3]
        vmem = parts[3] if len(parts) > 3 else 100
        qsub = parts[4] if len(parts) > 4 else 128
        if args.n % bc:
            print(json.dumps({"impl": f"section_{cfg}", "skip": "n % block_cols"}))
            continue

        @partial(jax.jit, static_argnames=())
        def run_section(dt, st, q1, q2, m, ds, ss, bc=bc, dc=dc, qb=qb,
                        vmem=vmem, qsub=qsub):
            if args.arms == "both":
                corpora, queries = (dt, st), (q1, q2)
                scales = (ds, ss) if args.int8 else ()
                ks = (args.fetch_k, args.depth)
            elif args.arms == "dense":
                corpora, queries = (dt,), (q1,)
                scales = (ds,) if args.int8 else ()
                ks = (args.fetch_k,)
            else:
                corpora, queries = (st,), (q2,)
                scales = (ss,) if args.int8 else ()
                ks = (args.depth,)
            tables = section_bucket_tables(
                corpora, queries, None if args.no_mask else m, scales=scales,
                block_cols=bc, dot_chunk=dc, q_block=qb, vmem_mb=vmem,
                score_bf16=args.score_bf16, pack=not args.no_pack,
                reduce=not args.no_reduce, q_sub=qsub,
                interpret=interpret,
            )
            if args.no_topk:
                # Reduce to [B] per arm: the table readback (16 MB) costs
                # ~400 ms on the tunnel and would swamp the kernel timing;
                # one jnp.max over the table is ~0.02 ms of HBM traffic.
                return tuple(jnp.max(t, axis=1) for t in tables)
            return tuple(
                table_topk(t, kk, bc, args.n, select_impl=args.table_select)[1]
                for t, kk in zip(tables, ks)
            )

        try:
            sync, dev = timeit(
                run_section, dense_t, sketch_t, dq, sq, mask, d_scale, s_scale
            )
            rows = run_section(dense_t, sketch_t, dq, sq, mask, d_scale, s_scale)
            out = {
                "impl": f"section_{cfg}", "sync_ms": round(sync, 2),
                "device_ms": round(dev, 2), "int8": args.int8,
                "arms": args.arms, "score_bf16": args.score_bf16,
            }
            if args.no_pack:
                out["no_pack"] = True
                gt_d = gt_s = None  # row decode is meaningless in this probe
            if args.no_reduce:
                out["no_reduce"] = True
                gt_d = gt_s = None
            if args.no_topk:
                out["no_topk"] = True
                gt_d = gt_s = None  # tables, not rows — nothing to overlap
            if gt_d is not None:
                if args.arms == "both":
                    out["dense_overlap"] = round(overlap(np.asarray(rows[0]), gt_d), 4)
                    out["sketch_overlap"] = round(overlap(np.asarray(rows[1]), gt_s), 4)
                elif args.arms == "dense":
                    out["dense_overlap"] = round(overlap(np.asarray(rows[0]), gt_d), 4)
                else:
                    out["sketch_overlap"] = round(overlap(np.asarray(rows[0]), gt_s), 4)
            print(json.dumps(out), flush=True)
        except Exception as exc:  # noqa: BLE001 — sweep must report and go on
            print(json.dumps({
                "impl": f"section_{cfg}",
                "error": f"{type(exc).__name__}: {str(exc)[:200]}",
            }), flush=True)


def run_full_program_ab(args, dense, sketch, dense_t, sketch_t, dq, sq,
                        mask, d_scale, s_scale, interpret):
    """Device-honest A/B of the FULL hybrid serving program."""
    import jax
    import jax.numpy as jnp

    from verbatim_rag_tpu.ops.hybrid import hybrid_fused_topk
    from verbatim_rag_tpu.ops.section import hybrid_section_topk

    n, batch = args.n, args.batch
    key = jax.random.PRNGKey(7)
    k_ids, k_w, k_qi, k_qw = jax.random.split(key, 4)
    sp_ids = jax.random.randint(k_ids, (n, 128), 1, 30522, jnp.int32)
    sp_w = jax.random.uniform(k_w, (n, 128), jnp.float32)
    q_ids = jax.random.randint(k_qi, (batch, 32), 1, 30522, jnp.int32)
    q_w = jax.random.uniform(k_qw, (batch, 32), jnp.float32)
    top_k, fetch_k, depth = 10, 20, args.depth
    dqn = dq / jnp.linalg.norm(dq, axis=1, keepdims=True)

    def baseline(dn, sk, q1, q2, qi, qw, m, ds, ss):
        return hybrid_fused_topk(
            dn, sk, sp_ids, sp_w, q1, q2, qi, qw,
            k=top_k, fetch_k=fetch_k, depth=depth, mask=m,
            exact_topk=False, dense_scale=ds, sketch_scale=ss,
            rescore_impl="pallas", candidate_impl="xla",
        )

    sync, dev = timeit(baseline, dense, sketch, dqn, sq, q_ids, q_w, mask,
                       d_scale, s_scale)
    # Plain call — hybrid_fused_topk is already jitted; wrapping another
    # jax.jit around it compiles a SECOND (outer) program that misses the
    # in-memory cache and can die on a tunnel remote-compile drop.
    from profile_stages import _retry_compile

    base_scores, base_rows = _retry_compile(
        baseline, dense, sketch, dqn, sq, q_ids, q_w, mask, d_scale, s_scale
    )
    base_rows = np.asarray(base_rows)
    print(json.dumps({
        "impl": "full_xla_pallas_rescore", "sync_ms": round(sync, 2),
        "device_ms": round(dev, 2),
        "device_qps": round(batch / dev * 1000, 1), "int8": args.int8,
    }), flush=True)

    configs = args.configs or ["16384:4096:512"]
    for cfg in configs:
        parts = [int(x) for x in cfg.split(":")]
        bc, dc, qb = parts[:3]
        vmem = parts[3] if len(parts) > 3 else 100

        def section_prog(dt, st, q1, q2, qi, qw, m, ds, ss,
                         bc=bc, dc=dc, qb=qb, vmem=vmem):
            return hybrid_section_topk(
                dt, st, sp_ids, sp_w, q1, q2, qi, qw,
                k=top_k, fetch_k=fetch_k, depth=depth, mask=m,
                dense_scale=ds, sketch_scale=ss, rescore_impl="pallas",
                table_select=args.table_select,
                block_cols=bc, dot_chunk=dc, q_block=qb, vmem_mb=vmem,
                interpret=interpret,
            )

        try:
            sync, dev = timeit(section_prog, dense_t, sketch_t, dqn, sq,
                               q_ids, q_w, mask, d_scale, s_scale)
            _, rows = _retry_compile(
                section_prog, dense_t, sketch_t, dqn, sq, q_ids, q_w, mask,
                d_scale, s_scale
            )
            rows = np.asarray(rows)
            ovl = float(np.mean([
                len(set(rows[i].tolist()) & set(base_rows[i].tolist())) / top_k
                for i in range(batch)
            ]))
            print(json.dumps({
                "impl": f"full_section_{cfg}", "sync_ms": round(sync, 2),
                "device_ms": round(dev, 2),
                "device_qps": round(batch / dev * 1000, 1),
                "top10_overlap_vs_xla": round(ovl, 4), "int8": args.int8,
            }), flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({
                "impl": f"full_section_{cfg}",
                "error": f"{type(exc).__name__}: {str(exc)[:200]}",
            }), flush=True)


if __name__ == "__main__":
    main()

"""Two-process DCN demo: a mesh spanning process boundaries.

Exercises the `parallel/distributed.py` seam beyond a no-op (VERDICT.md r3
missing #3): two `jax.distributed` CPU processes on localhost form one
global ('dp','tp') mesh and run the REAL programs across it:

  1. `sharded_dense_topk` — per-shard candidates, all_gather merge
  2. `sharded_hybrid_topk` — the production hybrid serving program
     (sketch candidates -> per-shard exact rescore -> ICI merges ->
     on-device weighted RRF), verified row-for-row against the
     single-device `hybrid_fused_topk` at the same exact operating point
  3. one sharded TRAINING step (DP batch + TP params + SP sequence) with
     a finite-loss assertion

every one of which crosses the process boundary over Gloo — exactly what
a multi-slice TPU deployment does over DCN (SURVEY.md §2.9 "Distributed
comm backend").

Run one process per terminal (or see tests/test_distributed.py which spawns
both):

    python scripts/dcn_two_process_demo.py --process-id 0 --num-processes 2
    python scripts/dcn_two_process_demo.py --process-id 1 --num-processes 2
"""

from __future__ import annotations

import argparse
import os
import sys

# Importable regardless of the caller's cwd/PYTHONPATH (the test spawns us
# as a bare subprocess).
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--num-processes", type=int, default=2)
    parser.add_argument("--coordinator", default="localhost:9876")
    parser.add_argument("--devices-per-process", type=int, default=4)
    args = parser.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={args.devices_per_process}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    # Cross-process CPU collectives (the CI stand-in for DCN).
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from verbatim_rag_tpu.parallel.distributed import initialize

    ok = initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert ok, "jax.distributed failed to initialize"
    assert jax.process_count() == args.num_processes
    n_global = len(jax.devices())
    assert n_global == args.num_processes * args.devices_per_process

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from verbatim_rag_tpu.parallel.distributed import global_mesh
    from verbatim_rag_tpu.parallel.sharded_search import sharded_dense_topk

    mesh = global_mesh(tp=2)

    # Same host data in every process (deterministic seed).
    n, d, b, k = 64 * n_global, 32, 4, 10
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    mask = np.ones(n, bool)
    mask[::13] = False

    def dist(arr, spec):
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(arr.shape, sharding, lambda i: arr[i])

    scores, rows = sharded_dense_topk(
        dist(corpus, P(("dp", "tp"))),
        dist(queries, P()),
        k,
        dist(mask, P(("dp", "tp"))),
        mesh,
    )
    # Outputs are replicated → fully addressable in every process.
    scores, rows = np.asarray(scores), np.asarray(rows)

    full = queries @ corpus.T
    full[:, ~mask] = -np.inf
    expected = -np.sort(-full, axis=1)[:, :k]
    np.testing.assert_allclose(scores, expected, rtol=5e-3, atol=1e-3)
    gathered = np.take_along_axis(full, rows, axis=1)
    np.testing.assert_allclose(scores, gathered, rtol=5e-3, atol=1e-3)

    # -- Phase 2: the production HYBRID program across the boundary --------
    # Per-shard sketch candidates, per-shard exact rescore, ICI all_gather
    # merges, on-device weighted RRF. At depth >= rows-per-shard the sharded
    # program is exact, so it must reproduce the single-device fused program
    # (hybrid_fused_topk, exact_topk) row for row.
    from verbatim_rag_tpu.ops.hybrid import hybrid_fused_topk
    from verbatim_rag_tpu.parallel.sharded_search import sharded_hybrid_topk

    m_nnz, vocab, d_proj, fetch_k, hk = 8, 64, 32, 20, 10
    # Unique term ids per row (the rescore's at-most-one-match contract).
    sp_ids = np.stack(
        [rng.choice(np.arange(1, vocab), m_nnz, replace=False) for _ in range(n)]
    ).astype(np.int32)
    sp_w = (rng.random((n, m_nnz)) + 0.1).astype(np.float32)
    sketch = rng.normal(size=(n, d_proj)).astype(np.float32)
    sketch_q = rng.normal(size=(b, d_proj)).astype(np.float32)
    q_ids = np.stack(
        [rng.choice(np.arange(1, vocab), 8, replace=False) for _ in range(b)]
    ).astype(np.int32)
    q_w = (rng.random((b, 8)) + 0.1).astype(np.float32)

    h_scores, h_rows = sharded_hybrid_topk(
        dist(corpus, P(("dp", "tp"))),
        dist(sketch, P(("dp", "tp"))),
        dist(sp_ids, P(("dp", "tp"))),
        dist(sp_w, P(("dp", "tp"))),
        dist(queries, P()),
        dist(sketch_q, P()),
        dist(q_ids, P()),
        dist(q_w, P()),
        k=hk,
        fetch_k=fetch_k,
        depth=n,
        mask=dist(mask, P(("dp", "tp"))),
        mesh=mesh,
        dense_weight=0.6,
        sparse_weight=0.4,
        exact_topk=True,
    )
    h_scores, h_rows = np.asarray(h_scores), np.asarray(h_rows)
    assert h_rows.shape == (b, hk) and (h_rows >= 0).any(), "hybrid returned no hits"

    # Single-device reference on each process's local default device.
    r_scores, r_rows = hybrid_fused_topk(
        jnp.asarray(corpus), jnp.asarray(sketch), jnp.asarray(sp_ids),
        jnp.asarray(sp_w), jnp.asarray(queries), jnp.asarray(sketch_q),
        jnp.asarray(q_ids), jnp.asarray(q_w),
        k=hk, fetch_k=fetch_k, depth=n, mask=jnp.asarray(mask),
        dense_weight=0.6, sparse_weight=0.4, exact_topk=True,
    )
    r_scores, r_rows = np.asarray(r_scores), np.asarray(r_rows)
    np.testing.assert_allclose(h_scores, r_scores, rtol=1e-5, atol=1e-7)
    # Rows must match wherever the fused score is unique (RRF ties may
    # permute between merge strategies).
    for i in range(b):
        uniq = np.concatenate([[True], np.abs(np.diff(r_scores[i])) > 1e-9])
        uniq &= np.concatenate([np.abs(np.diff(r_scores[i])) > 1e-9, [True]])
        np.testing.assert_array_equal(h_rows[i][uniq], r_rows[i][uniq])

    # -- Phase 3: one sharded TRAIN step across the boundary ---------------
    # DP batch + TP params + SP sequence; grads/optimizer collectives cross
    # the process boundary; the loss must come back finite and identical in
    # both processes (it is replicated).
    import optax

    from verbatim_rag_tpu.models.config import TrainingConfig, tiny_test_config
    from verbatim_rag_tpu.parallel.mesh import encoder_param_specs
    from verbatim_rag_tpu.training.model import init_qa_model_params, sentence_loss
    from verbatim_rag_tpu.training.trainer import make_optimizer

    config = tiny_test_config(num_heads=2, intermediate_size=64)
    optimizer = make_optimizer(TrainingConfig(learning_rate=1e-4))

    params_host = jax.tree.map(
        np.asarray, init_qa_model_params(jax.random.PRNGKey(0), config)
    )
    specs = encoder_param_specs(params_host)
    params = jax.tree.map(
        lambda leaf, spec: jax.make_array_from_callback(
            np.shape(leaf), NamedSharding(mesh, spec),
            lambda i, leaf=leaf: np.asarray(leaf)[i],
        ),
        params_host,
        specs,
    )
    opt_state = optimizer.init(params)

    dp = mesh.devices.shape[0]
    batch_size, seq, max_sent = dp * 2, 32, 4
    batch_np = {
        "input_ids": rng.integers(
            3, config.vocab_size, (batch_size, seq)
        ).astype(np.int32),
        "attention_mask": np.ones((batch_size, seq), np.int32),
        "boundaries": np.stack(
            [
                np.stack([np.arange(max_sent) * 4 + 1, np.arange(max_sent) * 4 + 4], 1)
                for _ in range(batch_size)
            ]
        ).astype(np.int32),
        "sentence_mask": np.ones((batch_size, max_sent), np.int32),
        "labels": rng.integers(0, 2, (batch_size, max_sent)).astype(np.int32),
    }
    batch = {
        k_: dist(v, P("dp", "tp") if k_ in ("input_ids", "attention_mask") else P("dp"))
        for k_, v in batch_np.items()
    }

    @jax.jit
    def step(params, opt_state, batch):
        (loss, _aux), grads = jax.value_and_grad(sentence_loss, has_aux=True)(
            params, config, batch
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = step(params, opt_state, batch)
    loss_val = float(np.asarray(loss))
    assert np.isfinite(loss_val), f"train step loss not finite: {loss_val}"

    print(
        f"DCN-OK process={jax.process_index()}/{jax.process_count()} "
        f"mesh={dict(zip(mesh.axis_names, mesh.devices.shape))} top-{k} verified "
        f"hybrid-top{hk} verified train-loss={loss_val:.4f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

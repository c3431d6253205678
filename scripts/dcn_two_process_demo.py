"""Two-process DCN demo: a mesh spanning process boundaries.

Exercises the `parallel/distributed.py` seam beyond a no-op (VERDICT.md #8):
two `jax.distributed` CPU processes on localhost form one global ('dp','tp')
mesh; the corpus is row-sharded across BOTH processes' devices and
`sharded_dense_topk` merges per-shard candidates with collectives that cross
the process boundary — exactly what a multi-slice TPU deployment does over
DCN (SURVEY.md §2.9 "Distributed comm backend").

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

    print(
        f"DCN-OK process={jax.process_index()}/{jax.process_count()} "
        f"mesh={dict(zip(mesh.axis_names, mesh.devices.shape))} top-{k} verified"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

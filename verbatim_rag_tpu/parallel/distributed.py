"""Multi-host / multi-slice initialization (DCN scale-out).

SURVEY.md §2.9 "Distributed comm backend": intra-slice communication rides
ICI via the collectives in `sharded_search.py` / `ops/ring_attention.py`;
scaling an index beyond one slice uses `jax.distributed` so the mesh spans
hosts and XLA routes cross-slice collectives over DCN. This module is the
thin, testable seam around that initialization.

On a multi-host deployment every process runs the same program:

    from verbatim_rag_tpu.parallel.distributed import initialize, global_mesh
    initialize()                       # env-driven (GKE/TPU-VM metadata)
    mesh = global_mesh(tp=4)           # ('dp','tp') over ALL processes' devices

Index rows sharded over that mesh put each shard in one slice's HBM; the
per-shard top-k + all_gather merge in `sharded_search.py` then only moves
O(devices·k) candidates across DCN.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed; no-op when single-process.

    With no arguments, relies on jax's environment auto-detection (TPU VM
    metadata / JAX_COORDINATOR_ADDRESS et al). Returns True when a
    multi-process runtime was initialized.
    """
    import jax

    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not explicit and num_processes in (None, 1):
        auto = os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        if not auto:
            logger.info("Single-process run; jax.distributed not initialized")
            return False
    explicitly_configured = bool(
        coordinator_address or num_processes or process_id is not None or explicit
    )
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "jax.distributed initialized: process %d/%d",
            jax.process_index(),
            jax.process_count(),
        )
        return True
    except RuntimeError as exc:
        # Re-initialize in the same process: tolerable in any mode.
        if "already initialized" in str(exc).lower():
            logger.warning("jax.distributed already initialized: %s", exc)
            return True
        if explicitly_configured:
            raise
        logger.warning("jax.distributed.initialize failed/skipped: %s", exc)
        return False
    except Exception as exc:  # auto-detect fallback only
        if explicitly_configured:
            # An operator asked for a multi-host run; silently degrading to
            # independent single-host processes would produce wrong results
            # (each host training/serving 1/N of the data alone).
            raise
        logger.warning("jax.distributed.initialize failed/skipped: %s", exc)
        return False


def global_mesh(dp: int | None = None, tp: int = 1):
    """('dp','tp') mesh over every device of every process."""
    from .mesh import make_mesh

    return make_mesh(dp=dp, tp=tp)


def process_local_batch_slice(global_batch: int) -> slice:
    """The rows of a globally-sharded batch this process should feed.

    Per-host input pipelines (SURVEY.md §2.9 DP plan): each process
    tokenizes/loads only its slice of the global batch.
    """
    import jax

    n_proc = jax.process_count()
    if global_batch % n_proc != 0:
        # Silent floor division would drop the remainder rows from every
        # step on SOME host — no host would ever feed them.
        raise ValueError(
            f"global_batch ({global_batch}) must divide evenly over "
            f"{n_proc} processes; pad the batch or choose a multiple"
        )
    per_process = global_batch // n_proc
    start = jax.process_index() * per_process
    return slice(start, start + per_process)

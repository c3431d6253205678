"""Projection-accelerated sparse retrieval.

TPU hardware truth: random gathers from a vocab-sized table do not vectorize
(Mosaic's `dynamic_gather` only handles same-shape take_along_axis), so an
exact DAAT-style scan of SPLADE vectors cannot reach the MXU. This module
implements the TPU-native answer (cf. PAPERS.md — GPU sparse-retrieval work
like GPUSparse/SpANNS makes the same move): factor the search into

1. **Candidate generation — pure MXU.** A fixed random signed projection
   ``P [V, d_p]`` (Johnson–Lindenstrauss) maps sparse vectors to dense
   sketches at flush time; query sketches are ``q @ P``; candidate scoring
   is a dense [B, d_p] × [d_p, N] matmul — same kernel class as dense
   retrieval, HBM-bandwidth-bound.
2. **Exact rescore — tiny.** The true sparse score is recomputed for only
   the top-C candidates per query from the forward index (C ≈ hundreds), so
   reported scores and the ranks that feed RRF are exact sparse scores.

Approximation only affects which C candidates are considered; recall is
controlled by d_p and C (validated in tests against the exact scan).
"""

from __future__ import annotations

import numpy as np


def projection_matrix(vocab_size: int, d_p: int, seed: int = 0) -> np.ndarray:
    """Deterministic ±1/√d_p signed projection [V, d_p] (float32).

    Built branch-free and temporary-free: uniform f32 draws, then in-place
    ``copysign`` against (r - 0.5). The obvious ``(randint(0,2)*2-1)*c``
    spends seconds on this class of host (each 90 MB temporary is a fresh
    page-faulting pass); this form is one generator fill plus two in-place
    passes (~0.5 s at [30522, 768]). Sketches are never persisted — saved
    stores re-sketch on load — so the exact sign stream is an internal
    detail, not a format contract.
    """
    rng = np.random.Generator(np.random.SFC64(seed))
    r = rng.random((vocab_size, d_p), dtype=np.float32)
    np.subtract(r, np.float32(0.5), out=r)
    np.copysign(np.float32(1.0 / np.sqrt(d_p)), r, out=r)
    return r


def project_rows(
    token_ids: np.ndarray,  # [n, m] int32 (0 = pad)
    weights: np.ndarray,  # [n, m] float32
    projection: np.ndarray,  # [V, d_p]
) -> np.ndarray:
    """Sketch forward-index rows: out[n] = Σ_j w[n,j] · P[ids[n,j]].

    One-time flush cost. Uses the C++ SpMM kernel when available
    (`engine/native.py`); numpy fallback otherwise. Pad slots contribute 0
    because their weight is 0.
    """
    from verbatim_rag_tpu.engine.native import project_rows_native

    native = project_rows_native(token_ids, weights, projection)
    if native is not None:
        return native
    gathered = projection[token_ids]  # [n, m, d_p]
    return np.einsum("nmd,nm->nd", gathered, weights).astype(np.float32)


def project_queries(q_dense: np.ndarray, projection: np.ndarray) -> np.ndarray:
    """Query sketches [B, d_p] from dense query vectors."""
    return (q_dense @ projection).astype(np.float32)


def project_sparse_queries(
    sparse_rows: list[dict[int, float]], projection: np.ndarray
) -> np.ndarray:
    """Query sketches [B, d_p] straight from sparse dicts.

    Queries have tens of terms, so sketching from the sparse form costs
    B·nnz·d_p flops — microseconds — versus a [B, V] dense matmul.
    """
    d_p = projection.shape[1]
    out = np.zeros((len(sparse_rows), d_p), np.float32)
    for i, row in enumerate(sparse_rows):
        for t, w in row.items():
            t = int(t)
            if 0 <= t < projection.shape[0]:
                out[i] += float(w) * projection[t]
    return out


def project_query_arrays(q_ids, q_w, projection_dev):
    """Device-side query sketches [B, d_p] from padded id/weight arrays.

    The device-resident query handoff: when term ids/weights are already on
    device (SPLADE top-k runs there), sketching via a [B, m] row gather +
    weighted sum keeps the encode→search chain free of host syncs. Pad
    slots (id 0, weight 0) gather row 0 but contribute nothing. m is tens
    of terms, so the gather is trivially small next to the candidate matmul.
    """
    import jax.numpy as jnp

    gathered = jnp.take(projection_dev, q_ids, axis=0)  # [B, m, d_p]
    return jnp.einsum(
        "bmd,bm->bd", gathered, q_w.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


def exact_rescore(
    candidate_rows: np.ndarray,  # [B, C] row indices (may contain -1)
    sp_ids: np.ndarray,  # [N, m] host forward index
    sp_weights: np.ndarray,  # [N, m]
    q_dense: np.ndarray,  # [B, V]
) -> np.ndarray:
    """Exact sparse scores for each (query, candidate) — [B, C] float32."""
    from verbatim_rag_tpu.engine.native import exact_rescore_native

    native = exact_rescore_native(candidate_rows, sp_ids, sp_weights, q_dense)
    if native is not None:
        return native
    batch, c = candidate_rows.shape
    safe_rows = np.clip(candidate_rows, 0, sp_ids.shape[0] - 1)
    ids = sp_ids[safe_rows]  # [B, C, m]
    weights = sp_weights[safe_rows]  # [B, C, m]
    q_vals = q_dense[np.arange(batch)[:, None, None], ids]  # [B, C, m]
    scores = np.einsum("bcm,bcm->bc", weights, q_vals)
    return np.where(candidate_rows >= 0, scores, -np.inf).astype(np.float32)

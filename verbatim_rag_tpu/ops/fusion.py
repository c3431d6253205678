"""Hybrid result fusion: weighted Reciprocal Rank Fusion (RRF).

Two implementations of the same math (score(id) = Σ_methods w_m / (rrf_k +
rank_m(id) + 1), results ordered by fused score, `distance = 1 - score`):

- :func:`rrf_merge_host` — reference-exact host merge over hit dicts, parity
  with `vector_stores/hybrid_search.py:73-129` (used at the orchestration
  seam where hits already left the device).
- :func:`rrf_fuse_device` — fully on-device fusion for the fused hybrid query
  pipeline: candidate ids from every method are merged by sort +
  run-segmentation + top-k, all static shapes, no host sync. This is the
  TPU-native equivalent of Milvus's client-side 2-way merge.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

ALLOWED_METHODS = {"dense", "sparse", "full_text"}


# -- host-side (reference-parity) ------------------------------------------------


def sanitize_hybrid_weights(hybrid_weights: dict[str, float]) -> dict[str, float]:
    """Drop unknown methods and non-positive weights; error if nothing remains."""
    if not hybrid_weights:
        raise ValueError("hybrid_weights must be a non-empty dict")
    cleaned: dict[str, float] = {}
    for method, weight in hybrid_weights.items():
        if method not in ALLOWED_METHODS:
            logger.warning("Ignoring unsupported hybrid method %r", method)
            continue
        if not isinstance(weight, (int, float)) or weight <= 0:
            logger.warning("Ignoring non-positive weight for %r: %s", method, weight)
            continue
        cleaned[method] = float(weight)
    if not cleaned:
        raise ValueError("No valid hybrid_weights after validation")
    return cleaned


def normalize_weights(
    results_by_method: dict[str, list], weights: dict[str, float]
) -> dict[str, float]:
    """Restrict to available methods and normalize to sum 1 (equal if all zero)."""
    available = {m: weights.get(m, 0.0) for m in results_by_method}
    total = sum(available.values())
    if total == 0:
        logger.warning(
            "No non-zero weights for available methods; using equal weights for %s",
            list(results_by_method),
        )
        return {m: 1.0 / len(results_by_method) for m in results_by_method}
    return {m: w / total for m, w in available.items()}


def rrf_merge_host(
    results_by_method: dict[str, list[dict[str, Any]]],
    top_k: int,
    weights: dict[str, float],
    rrf_k: int = 60,
    log_label: str = "",
) -> list[dict[str, Any]]:
    """Weighted RRF over hit dicts ({'id': ..., ...}); returns merged hits with
    ``distance = 1 - fused_score``."""
    normalized = normalize_weights(results_by_method, weights)
    if log_label:
        logger.info(
            "Hybrid merge (%s): methods=%s weights=%s rrf_k=%s top_k=%s",
            log_label,
            list(results_by_method),
            normalized,
            rrf_k,
            top_k,
        )

    fused: dict[Any, float] = {}
    hit_by_id: dict[Any, dict] = {}
    for method, hits in results_by_method.items():
        weight = normalized.get(method, 0.0)
        for rank, hit in enumerate(hits):
            hit_id = hit.get("id")
            if hit_id is None:
                # `is None`, not falsy: integer row id 0 and empty-string
                # ids are legal and must participate in fusion.
                continue
            fused.setdefault(hit_id, 0.0)
            hit_by_id.setdefault(hit_id, hit)
            fused[hit_id] += weight / (rrf_k + rank + 1)

    ranked = sorted(fused, key=lambda hid: fused[hid], reverse=True)[:top_k]
    merged = []
    for hit_id in ranked:
        hit = dict(hit_by_id[hit_id])
        hit["distance"] = 1.0 - fused[hit_id]
        merged.append(hit)
    return merged


def rrf_fuse_np(
    method_indices, method_weights, k: int, rrf_k: int = 60
) -> tuple["np.ndarray", "np.ndarray"]:
    """Vectorized host RRF over per-method candidate row arrays.

    Same math as :func:`rrf_fuse_device`, for pipelines where candidates are
    already host-resident (e.g. after exact sparse rescoring).

    :param method_indices: [M, B, Km] int rows (−1 = missing)
    :param method_weights: [M] normalized weights
    :return: (fused scores [B, k], rows [B, k]; −1 pads)
    """
    import numpy as np

    n_methods, batch, km = method_indices.shape
    ranks = np.arange(km)[None, None, :]
    contrib = method_weights[:, None, None] / (rrf_k + ranks + 1.0)
    contrib = np.where(method_indices >= 0, contrib, 0.0)

    ids = np.moveaxis(method_indices, 0, 1).reshape(batch, -1)
    scores = np.moveaxis(contrib, 0, 1).reshape(batch, -1)

    out_scores = np.zeros((batch, k), np.float32)
    out_rows = np.full((batch, k), -1, np.int64)
    for b in range(batch):
        fused: dict[int, float] = {}
        for row, s in zip(ids[b], scores[b]):
            if row >= 0:
                fused[int(row)] = fused.get(int(row), 0.0) + float(s)
        ranked = sorted(fused.items(), key=lambda kv: -kv[1])[:k]
        for j, (row, s) in enumerate(ranked):
            out_rows[b, j] = row
            out_scores[b, j] = s
    return out_scores, out_rows


# -- device-side -------------------------------------------------------------------


def _flatten_contrib(method_indices, method_weights, rrf_k):
    """[M, B, Km] → ([B, M·Km] ids, [B, M·Km] per-slot RRF contributions)."""
    n_methods, batch, km = method_indices.shape
    ranks = jnp.broadcast_to(jnp.arange(km)[None, None, :], method_indices.shape)
    contrib = method_weights[:, None, None] / (rrf_k + ranks + 1.0)  # [M, B, Km]
    contrib = jnp.where(method_indices >= 0, contrib, 0.0)
    total = n_methods * km
    ids = jnp.moveaxis(method_indices, 0, 1).reshape(batch, total)
    scores = jnp.moveaxis(contrib, 0, 1).reshape(batch, total)
    return ids, scores


@partial(jax.jit, static_argnames=("k", "rrf_k"))
def rrf_fuse_device(
    method_indices: jax.Array,  # [M, B, Km] row indices per method (−1 = no hit)
    method_weights: jax.Array,  # [M] normalized weights
    k: int,
    rrf_k: int = 60,
) -> tuple[jax.Array, jax.Array]:
    """Fuse M ranked candidate lists on device.

    Duplicate ids are merged scatter-free: an id appears at most once per
    method, so after the sort-by-id a run of equal ids has at most M
    elements — the segmented sum is M−1 shifted masked adds (pure
    elementwise VPU work; TPU scatters serialize). Each run's fused score
    lands on its last slot; runs are ordered by id, so tie-breaking
    (smaller id first) matches the scatter formulation exactly.

    :return: (fused scores [B, k], row indices [B, k]); slots without a
        candidate carry index −1 and score 0.
    """
    n_methods, batch, _ = method_indices.shape
    ids, scores = _flatten_contrib(method_indices, method_weights, rrf_k)

    # Sort by id so duplicates (same row from several methods) are adjacent.
    # Missing candidates (-1) sort first and carry zero score.
    order = jnp.argsort(ids, axis=1)
    ids_sorted = jnp.take_along_axis(ids, order, axis=1)
    scores_sorted = jnp.take_along_axis(scores, order, axis=1)

    def shifted(x, j, fill):
        pad = jnp.full((batch, j), fill, x.dtype)
        return jnp.concatenate([pad, x[:, :-j]], axis=1)

    fused = scores_sorted
    for j in range(1, n_methods):
        # ids are sorted, so equality at distance j implies one run.
        same = ids_sorted == shifted(ids_sorted, j, -2)
        fused = fused + jnp.where(same, shifted(scores_sorted, j, 0.0), 0.0)

    run_end = jnp.concatenate(
        [ids_sorted[:, 1:] != ids_sorted[:, :-1], jnp.ones((batch, 1), bool)], axis=1
    )
    fused_scores = jnp.where(run_end & (ids_sorted >= 0), fused, -jnp.inf)
    top_scores, top_pos = jax.lax.top_k(fused_scores, k)
    top_ids = jnp.take_along_axis(ids_sorted, top_pos, axis=1)
    top_ids = jnp.where(top_scores > -jnp.inf, top_ids, -1)
    top_scores = jnp.where(top_ids >= 0, top_scores, 0.0)
    return top_scores, top_ids


@partial(jax.jit, static_argnames=("k", "rrf_k"))
def _rrf_fuse_scatter(
    method_indices: jax.Array,  # [M, B, Km]
    method_weights: jax.Array,  # [M]
    k: int,
    rrf_k: int = 60,
) -> tuple[jax.Array, jax.Array]:
    """The original scatter-based segment-sum formulation, kept as the
    differential reference for :func:`rrf_fuse_device` (same math, ties
    included; measured slower on TPU — scatters serialize)."""
    batch = method_indices.shape[1]
    total = method_indices.shape[0] * method_indices.shape[2]
    ids, scores = _flatten_contrib(method_indices, method_weights, rrf_k)

    order = jnp.argsort(ids, axis=1)
    ids_sorted = jnp.take_along_axis(ids, order, axis=1)
    scores_sorted = jnp.take_along_axis(scores, order, axis=1)

    run_start = jnp.concatenate(
        [jnp.ones((batch, 1), bool), ids_sorted[:, 1:] != ids_sorted[:, :-1]], axis=1
    )
    run_id = jnp.cumsum(run_start.astype(jnp.int32), axis=1) - 1  # [B, total]
    rows = jnp.broadcast_to(jnp.arange(batch)[:, None], run_id.shape)
    summed = jnp.zeros((batch, total), jnp.float32).at[rows, run_id].add(scores_sorted)
    rep_ids = (
        jnp.full((batch, total), -1, jnp.int32).at[rows, run_id].max(ids_sorted)
    )

    fused_scores = jnp.where(rep_ids >= 0, summed, -jnp.inf)
    top_scores, top_pos = jax.lax.top_k(fused_scores, k)
    top_ids = jnp.take_along_axis(rep_ids, top_pos, axis=1)
    top_scores = jnp.where(top_ids >= 0, top_scores, 0.0)
    return top_scores, top_ids

"""Rescore kernels (ops/rescore.py) vs the scan reference, interpret mode.

`exact_rescore_device` (ops/hybrid.py) is the behavioral reference — the
same multiset of matched (candidate-slot x query-term) products, so the
variants must agree to f32 re-association tolerance.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from verbatim_rag_tpu.ops.hybrid import exact_rescore_device
from verbatim_rag_tpu.ops.rescore import (
    NEG_INF,
    exact_rescore_device_pallas,
    exact_rescore_oneshot,
    rescore_pallas,
)


def _setup(b=4, c=8, n=64, m=16, qm=8, seed=0, missing=True):
    rng = np.random.default_rng(seed)
    # Forward index: unique term ids per row, pad slots id 0 / weight 0.
    sp_ids = np.zeros((n, m), np.int32)
    sp_w = np.zeros((n, m), np.float32)
    for r in range(n):
        nnz = rng.integers(0, m + 1)
        sp_ids[r, :nnz] = rng.choice(np.arange(1, 500), size=nnz, replace=False)
        sp_w[r, :nnz] = rng.gamma(2.0, 1.0, size=nnz).astype(np.float32)
    # Queries: unique ids per row (some overlapping the corpus vocab), pads 0.
    q_ids = np.zeros((b, qm), np.int32)
    q_w = np.zeros((b, qm), np.float32)
    for r in range(b):
        nnz = rng.integers(1, qm + 1)
        q_ids[r, :nnz] = rng.choice(np.arange(1, 500), size=nnz, replace=False)
        q_w[r, :nnz] = rng.gamma(2.0, 1.0, size=nnz).astype(np.float32)
    cand = rng.integers(0, n, size=(b, c)).astype(np.int32)
    if missing:
        cand[0, -2:] = -1  # missing candidates stay NEG_INF
    return tuple(map(jnp.asarray, (cand, sp_ids, sp_w, q_ids, q_w)))


@pytest.mark.parametrize("impl", ["oneshot", "pallas"])
def test_matches_scan_reference(impl):
    cand, sp_ids, sp_w, q_ids, q_w = _setup()
    ref = np.asarray(exact_rescore_device(cand, sp_ids, sp_w, q_ids, q_w))
    if impl == "oneshot":
        got = np.asarray(exact_rescore_oneshot(cand, sp_ids, sp_w, q_ids, q_w))
    else:
        got = np.asarray(
            exact_rescore_device_pallas(cand, sp_ids, sp_w, q_ids, q_w, interpret=True)
        )
    assert got.shape == ref.shape
    miss = np.asarray(cand) < 0
    assert (got[miss] <= NEG_INF / 2).all()
    np.testing.assert_allclose(got[~miss], ref[~miss], rtol=1e-6, atol=1e-6)


def test_serving_like_shapes_and_padding():
    # B not a multiple of the kernel's query tile; C·m a full-lane multiple.
    cand, sp_ids, sp_w, q_ids, q_w = _setup(b=5, c=16, n=128, m=8, qm=4, seed=3)
    ref = np.asarray(exact_rescore_device(cand, sp_ids, sp_w, q_ids, q_w))
    got = np.asarray(
        exact_rescore_device_pallas(cand, sp_ids, sp_w, q_ids, q_w, interpret=True)
    )
    miss = np.asarray(cand) < 0
    np.testing.assert_allclose(got[~miss], ref[~miss], rtol=1e-6, atol=1e-6)


def test_rescore_pallas_direct_gathered_arrays():
    cand, sp_ids, sp_w, q_ids, q_w = _setup(b=4, c=8, n=64, m=16, qm=8, seed=7, missing=False)
    flat = np.asarray(cand).reshape(-1)
    cand_ids = jnp.asarray(np.asarray(sp_ids)[flat].reshape(4, 8, 16))
    cand_w = jnp.asarray(np.asarray(sp_w)[flat].reshape(4, 8, 16))
    got = np.asarray(rescore_pallas(cand_ids, cand_w, q_ids, q_w, interpret=True))
    ref = np.asarray(exact_rescore_device(cand, sp_ids, sp_w, q_ids, q_w))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_zero_query_scores_zero():
    cand, sp_ids, sp_w, _, _ = _setup(missing=False)
    q_ids = jnp.zeros((4, 8), jnp.int32)
    q_w = jnp.zeros((4, 8), jnp.float32)
    got = np.asarray(
        exact_rescore_device_pallas(cand, sp_ids, sp_w, q_ids, q_w, interpret=True)
    )
    np.testing.assert_array_equal(got, 0.0)


def test_duplicate_candidates_score_identically():
    cand, sp_ids, sp_w, q_ids, q_w = _setup(missing=False)
    cand = cand.at[:, 1].set(cand[:, 0])
    got = np.asarray(
        exact_rescore_device_pallas(cand, sp_ids, sp_w, q_ids, q_w, interpret=True)
    )
    np.testing.assert_array_equal(got[:, 0], got[:, 1])

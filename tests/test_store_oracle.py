"""Randomized differential oracle: DeviceVectorStore's full hybrid dispatch
vs a from-scratch numpy implementation.

The targeted unit tests pin individual mechanisms (dispatch, rescore, RRF,
masks); this file checks the COMPOSED pipeline — normalize → per-method
top-(2k) ranking over live+filtered rows → weighted RRF — against an oracle
that shares no code with the store, across random corpora, deletes, and
filters. Continuous random scores make rank ties measure-zero, so the
comparison is exact on ids.
"""

import numpy as np
import pytest

pytest.importorskip("jax")

from verbatim_rag_tpu.engine.store import DeviceVectorStore

DIM, VOCAB, NNZ = 8, 64, 4


def _full_coverage_query(rng):
    """A sparse query with weight on EVERY vocab term: each row's exact
    sparse score is then a continuous random sum, so per-method rank ties
    (which RRF orders arbitrarily) are measure-zero."""
    return {int(t): float(rng.random() + 0.1) for t in range(1, VOCAB)}


def _build(seed, n=40, with_deletes=True):
    rng = np.random.default_rng(seed)
    dense = rng.normal(size=(n, DIM)).astype(np.float32)
    sparse = []
    for _ in range(n):
        terms = rng.choice(np.arange(1, VOCAB), size=NNZ, replace=False)
        sparse.append({int(t): float(rng.random() + 0.05) for t in terms})
    store = DeviceVectorStore(dense_dim=DIM, sparse_vocab=VOCAB, sparse_max_nnz=NNZ, block=16)
    store.add_vectors(
        [
            {
                "id": f"r{i}",
                "text": f"text {i}",
                "metadata": {"document_id": f"d{i % 3}", "year": 2020 + i % 4},
                "dense": dense[i],
                "sparse": sparse[i],
            }
            for i in range(n)
        ]
    )
    store.flush()
    deleted = set()
    if with_deletes:
        dead = rng.choice(n, size=n // 5, replace=False)
        store.delete([f"r{i}" for i in dead])
        deleted = set(int(i) for i in dead)
    return store, dense, sparse, deleted, rng


def _oracle_hybrid(dense, sparse, live_rows, q_dense, q_sparse, top_k, rrf_k=60,
                   weights=(0.5, 0.5)):
    """Reference-semantics hybrid: per-method top-(2k) over live rows, RRF.

    Returns [(row, fused_score)] so callers can compare tie-aware: two rows
    that appear at the SAME rank in different equal-weight methods fuse to
    identical scores, and their relative order is implementation-defined.
    """
    import ml_dtypes

    # Mirror the store's storage/matmul dtypes exactly: rows are normalized
    # in f32 then stored bf16; the query is normalized f32 then cast bf16
    # for the MXU dot (f32 accumulate).
    qd = (q_dense / np.linalg.norm(q_dense)).astype(ml_dtypes.bfloat16).astype(np.float32)
    rows = sorted(live_rows)
    d_norm = (
        dense[rows] / np.linalg.norm(dense[rows], axis=1, keepdims=True)
    ).astype(ml_dtypes.bfloat16).astype(np.float32)
    d_scores = d_norm @ qd
    s_scores = np.array(
        [sum(w * q_sparse.get(t, 0.0) for t, w in sparse[r].items()) for r in rows]
    )
    fetch = min(2 * top_k, len(rows))
    d_rank = [rows[i] for i in np.argsort(-d_scores)[:fetch]]
    s_rank = [rows[i] for i in np.argsort(-s_scores)[:fetch]]
    fused: dict[int, float] = {}
    total = sum(weights)
    for w, ranking in zip(weights, (d_rank, s_rank)):
        for rank, row in enumerate(ranking):
            fused[row] = fused.get(row, 0.0) + (w / total) / (rrf_k + rank + 1)
    ranked = sorted(fused.items(), key=lambda kv: -kv[1])[:top_k]
    return ranked


def _assert_matches_oracle(got_ids, ranked, context=""):
    """Tie-aware order comparison: ids must match tier-by-tier, where a tier
    is a run of equal fused scores."""
    want_ids = [f"r{r}" for r, _ in ranked]
    assert set(got_ids) <= set(want_ids) | set(), context  # no foreign rows
    assert len(got_ids) == len(want_ids), context
    i = 0
    while i < len(ranked):
        j = i
        while j < len(ranked) and abs(ranked[j][1] - ranked[i][1]) < 1e-12:
            j += 1
        assert set(got_ids[i:j]) == {f"r{r}" for r, _ in ranked[i:j]}, (
            f"{context}: tier {i}:{j} differs"
        )
        i = j


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_hybrid_matches_numpy_oracle(seed):
    store, dense, sparse, deleted, rng = _build(seed)
    n = len(dense)
    live = [i for i in range(n) if i not in deleted]
    for trial in range(3):
        qd = rng.normal(size=DIM).astype(np.float32)
        qs = _full_coverage_query(rng)
        got = [h.id for h in store.query(dense_query=qd, sparse_query=qs, top_k=5)]
        ranked = _oracle_hybrid(dense, sparse, live, qd, qs, 5)
        _assert_matches_oracle(got, ranked, f"seed={seed} trial={trial}")


@pytest.mark.parametrize("seed", [0, 1])
def test_hybrid_with_filter_matches_oracle(seed):
    store, dense, sparse, deleted, rng = _build(seed)
    n = len(dense)
    # document_id filter (promoted fast path) AND a year predicate via the
    # expression parser — composed with tombstones.
    live = [
        i for i in range(n)
        if i not in deleted and i % 3 == 1 and (2020 + i % 4) >= 2022
    ]
    flt = 'document_id == "d1" and year >= 2022'
    for trial in range(2):
        qd = rng.normal(size=DIM).astype(np.float32)
        qs = _full_coverage_query(rng)
        got = [h.id for h in store.query(dense_query=qd, sparse_query=qs, top_k=5, filter=flt)]
        ranked = _oracle_hybrid(dense, sparse, live, qd, qs, 5)
        _assert_matches_oracle(got, ranked, f"seed={seed} trial={trial}")


@pytest.mark.parametrize("weights", [(0.8, 0.2), (0.2, 0.8)])
def test_weighted_hybrid_matches_oracle(weights):
    store, dense, sparse, deleted, rng = _build(7)
    live = [i for i in range(len(dense)) if i not in deleted]
    qd = rng.normal(size=DIM).astype(np.float32)
    qs = _full_coverage_query(rng)
    got = [
        h.id
        for h in store.query(
            dense_query=qd, sparse_query=qs, top_k=5,
            hybrid_weights={"dense": weights[0], "sparse": weights[1]},
        )
    ]
    ranked = _oracle_hybrid(dense, sparse, live, qd, qs, 5, weights=weights)
    _assert_matches_oracle(got, ranked, f"weights={weights}")


WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu",
]


def _bm25_oracle(texts, live_rows, query_text, top_k, k1=1.2, b=0.75):
    """From-scratch BM25 mirroring the store's semantics: document-side
    saturation frozen at flush (avgdl over ALL rows), idf over LIVE rows
    (df decremented on delete). Hash collisions are impossible here: the
    word pool is tiny vs the vocab."""
    import math
    import re

    docs = [re.findall(r"[a-z0-9]+", t.lower()) for t in texts]
    avgdl = max(sum(len(d) for d in docs) / max(len(docs), 1), 1.0)
    df: dict[str, int] = {}
    for r in live_rows:
        for w in set(docs[r]):
            df[w] = df.get(w, 0) + 1
    n_live = max(len(live_rows), 1)
    q_terms = set(re.findall(r"[a-z0-9]+", query_text.lower()))
    scores = {}
    for r in live_rows:
        dl = len(docs[r])
        norm = k1 * (1.0 - b + b * dl / avgdl)
        s = 0.0
        for w in q_terms:
            tf = docs[r].count(w)
            if tf == 0:
                continue
            idf = math.log1p((n_live - df.get(w, 0) + 0.5) / (df.get(w, 0) + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + norm)
        scores[r] = s
    return sorted(scores.items(), key=lambda kv: -kv[1])[:top_k]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_full_text_bm25_matches_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    n = 24
    texts = [
        " ".join(rng.choice(WORDS, size=rng.integers(5, 14)))
        for _ in range(n)
    ]
    store = DeviceVectorStore(
        dense_dim=None, sparse_vocab=None, enable_full_text=True,
        full_text_vocab=1 << 18, block=16,
    )
    store.add_vectors(
        [{"id": f"r{i}", "text": texts[i], "metadata": {}} for i in range(n)]
    )
    store.flush()
    dead = [int(i) for i in rng.choice(n, size=n // 4, replace=False)]
    store.delete([f"r{i}" for i in dead])
    live = [i for i in range(n) if i not in dead]

    for trial in range(3):
        query = " ".join(rng.choice(WORDS, size=3, replace=False))
        got = [
            (h.id, h.score)
            for h in store.query(text_query=query, top_k=6)
        ]
        ranked = _bm25_oracle(texts, live, query, 6)
        # Tie-aware id comparison + score agreement.
        _assert_matches_oracle(
            [g for g, _ in got],
            ranked,
            f"seed={seed} trial={trial} q={query!r}",
        )
        for (gid, gscore), (orow, oscore) in zip(got, ranked):
            if gid == f"r{orow}":  # same row: scores must agree numerically
                assert gscore == pytest.approx(oscore, rel=2e-3), (gid, query)

"""Store-level parity across rescore implementations.

`DeviceVectorStore(rescore_impl=...)` switches the exact-rescore strategy
inside the fused device programs (ops/hybrid.py::rescore_fn). All three
must return the same rows and scores for hybrid and sparse queries — the
kernels are alternative schedules of the same math.
"""

import numpy as np
import pytest

pytest.importorskip("jax")

from verbatim_rag_tpu.engine.store import DeviceVectorStore

DIM, VOCAB, NNZ = 8, 64, 4


def _build(rescore_impl, seed=11, n=48):
    rng = np.random.default_rng(seed)
    dense = rng.normal(size=(n, DIM)).astype(np.float32)
    store = DeviceVectorStore(
        dense_dim=DIM,
        sparse_vocab=VOCAB,
        sparse_max_nnz=NNZ,
        block=16,
        rescore_impl=rescore_impl,
    )
    store.add_vectors(
        [
            {
                "id": f"r{i}",
                "text": f"text {i}",
                "metadata": {},
                "dense": dense[i],
                "sparse": {
                    int(t): float(rng.random() + 0.05)
                    for t in rng.choice(np.arange(1, VOCAB), size=NNZ, replace=False)
                },
            }
            for i in range(n)
        ]
    )
    store.flush()
    return store


def _query(rng):
    qd = rng.normal(size=DIM).astype(np.float32)
    qs = {int(t): float(rng.random() + 0.1) for t in range(1, VOCAB, 3)}
    return qd, qs


@pytest.mark.parametrize("impl", ["oneshot", "pallas"])
def test_hybrid_and_sparse_match_scan(impl):
    rng = np.random.default_rng(5)
    ref = _build("scan")
    alt = _build(impl)
    for trial in range(3):
        qd, qs = _query(rng)
        r_ref = ref.query_batch(dense_queries=[qd], sparse_queries=[qs], top_k=6)[0]
        r_alt = alt.query_batch(dense_queries=[qd], sparse_queries=[qs], top_k=6)[0]
        assert [h.id for h in r_ref] == [h.id for h in r_alt]
        np.testing.assert_allclose(
            [h.score for h in r_ref], [h.score for h in r_alt], rtol=1e-6
        )
        s_ref = ref.query_batch(sparse_queries=[qs], top_k=6)[0]
        s_alt = alt.query_batch(sparse_queries=[qs], top_k=6)[0]
        assert [h.id for h in s_ref] == [h.id for h in s_alt]
        np.testing.assert_allclose(
            [h.score for h in s_ref], [h.score for h in s_alt], rtol=1e-6
        )


@pytest.mark.parametrize("impl", ["oneshot", "pallas"])
def test_parity_with_deletes_and_filters(impl):
    """The impl switch must compose with tombstones and filter masks —
    the mask flows into the candidate stage, the rescore sees -1 pads."""
    rng = np.random.default_rng(29)

    def build(rescore_impl):
        r = np.random.default_rng(31)
        store = DeviceVectorStore(
            dense_dim=DIM, sparse_vocab=VOCAB, sparse_max_nnz=NNZ,
            block=16, rescore_impl=rescore_impl,
        )
        store.add_vectors([
            {
                "id": f"r{i}",
                "text": f"text {i}",
                "metadata": {"year": 2020 + i % 3},
                "dense": r.normal(size=DIM).astype(np.float32),
                "sparse": {
                    int(t): float(r.random() + 0.05)
                    for t in r.choice(np.arange(1, VOCAB), size=NNZ, replace=False)
                },
            }
            for i in range(40)
        ])
        store.flush()
        store.delete([f"r{i}" for i in range(0, 40, 7)])
        return store

    ref, alt = build("scan"), build(impl)
    for trial in range(2):
        qd, qs = _query(rng)
        kwargs = dict(
            dense_queries=[qd], sparse_queries=[qs], top_k=6,
            filter={"year": 2021},
        )
        r_ref = ref.query_batch(**kwargs)[0]
        r_alt = alt.query_batch(**kwargs)[0]
        assert [h.id for h in r_ref] == [h.id for h in r_alt]
        assert all(h.metadata["year"] == 2021 for h in r_alt)
        assert not any(int(h.id[1:]) % 7 == 0 for h in r_alt)


def test_invalid_impl_rejected():
    with pytest.raises(ValueError, match="rescore_impl"):
        DeviceVectorStore(dense_dim=DIM, rescore_impl="magic")
    with pytest.raises(ValueError, match="candidate_impl"):
        DeviceVectorStore(dense_dim=DIM, candidate_impl="magic")
    with pytest.raises(ValueError, match="candidate_impl"):
        DeviceVectorStore(dense_dim=DIM, candidate_impl="magic,xla")
    with pytest.raises(ValueError, match="candidate_impl"):
        DeviceVectorStore(dense_dim=DIM, candidate_impl="xla,bucket,xla")


def test_validate_candidate_impl_spec():
    """The round-3 per-stage comma-pair spec was retired with the round-4
    whole-section kernel (VERDICT r3 #9) — only single impls validate."""
    from verbatim_rag_tpu.ops.hybrid import validate_candidate_impl

    assert validate_candidate_impl("xla") == "xla"
    assert validate_candidate_impl("bucket") == "bucket"
    for retired in ("", "bucket,xla", "xla,bucket", "section"):
        with pytest.raises(ValueError, match="candidate_impl"):
            validate_candidate_impl(retired)


def test_impl_knobs_survive_save_load(tmp_path):
    """The configured kernels must be what a reloaded deployment runs —
    save() persists the impl knobs alongside the other constructor config."""
    store = _build("pallas")
    store.candidate_impl = store.candidate_impl_requested = "bucket"
    path = str(tmp_path / "idx")
    store.save(path)
    loaded = DeviceVectorStore.load(path)
    assert loaded.rescore_impl == "pallas"
    assert loaded.candidate_impl == "bucket"


def test_bucket_candidate_impl_store_parity():
    """candidate_impl='bucket' on CPU takes the automatic XLA fallback —
    the store must return identical results to the default config."""
    rng = np.random.default_rng(23)
    ref = _build("scan")
    alt = DeviceVectorStore(
        dense_dim=DIM,
        sparse_vocab=VOCAB,
        sparse_max_nnz=NNZ,
        block=16,
        candidate_impl="bucket",
    )
    rng2 = np.random.default_rng(11)  # same corpus as _build(..., seed=11)
    dense = rng2.normal(size=(48, DIM)).astype(np.float32)
    alt.add_vectors(
        [
            {
                "id": f"r{i}",
                "text": f"text {i}",
                "metadata": {},
                "dense": dense[i],
                "sparse": {
                    int(t): float(rng2.random() + 0.05)
                    for t in rng2.choice(np.arange(1, VOCAB), size=NNZ, replace=False)
                },
            }
            for i in range(48)
        ]
    )
    alt.flush()
    qd, qs = _query(rng)
    r_ref = ref.query_batch(dense_queries=[qd], sparse_queries=[qs], top_k=6)[0]
    r_alt = alt.query_batch(dense_queries=[qd], sparse_queries=[qs], top_k=6)[0]
    assert [h.id for h in r_ref] == [h.id for h in r_alt]


def _build_section_pair(n=300, seed=31):
    """(xla store, section store) over the same corpus at a section-servable
    capacity (block=8192 → capacity 8192)."""
    rng = np.random.default_rng(seed)
    dense = rng.normal(size=(n, DIM)).astype(np.float32)
    sparse_rows = [
        {
            int(t): float(rng.random() + 0.05)
            for t in rng.choice(np.arange(1, VOCAB), size=NNZ, replace=False)
        }
        for _ in range(n)
    ]
    stores = []
    for impl in ("xla", "section"):
        s = DeviceVectorStore(
            dense_dim=DIM,
            sparse_vocab=VOCAB,
            sparse_max_nnz=NNZ,
            block=8192,
            candidate_impl=impl,
        )
        s.add_vectors(
            [
                {
                    "id": f"r{i}",
                    "text": f"text {i}",
                    "metadata": {},
                    "dense": dense[i],
                    "sparse": sparse_rows[i],
                }
                for i in range(n)
            ]
        )
        s.flush()
        stores.append(s)
    return stores


def test_section_candidate_impl_store_parity(monkeypatch):
    """candidate_impl='section' (interpret mode, forced via env) must agree
    with the XLA hybrid program on hybrid queries: the bucket table at
    block_cols=8192 over an 8192-capacity store is exhaustive enough that
    the exact-rescore + RRF top-k coincide on small corpora."""
    monkeypatch.setenv("VERBATIM_SECTION_INTERPRET", "1")
    rng = np.random.default_rng(7)
    ref, alt = _build_section_pair()
    qd, qs = _query(rng)
    r_ref = ref.query_batch(dense_queries=[qd], sparse_queries=[qs], top_k=6)[0]
    r_alt = alt.query_batch(dense_queries=[qd], sparse_queries=[qs], top_k=6)[0]
    # The dense arm's bucket table keeps one winner per 64 rows, so its
    # candidate set is approximate — require rank-1 agreement and high
    # top-6 overlap rather than exact list equality.
    assert r_ref and r_alt
    assert r_ref[0].id == r_alt[0].id
    overlap = len({h.id for h in r_ref} & {h.id for h in r_alt})
    assert overlap >= 4, (r_ref, r_alt)
    # Single-method queries silently take the per-stage 'xla' impl.
    s_ref = ref.query_batch(sparse_queries=[qs], top_k=6)[0]
    s_alt = alt.query_batch(sparse_queries=[qs], top_k=6)[0]
    assert [h.id for h in s_ref] == [h.id for h in s_alt]


def test_section_falls_back_off_tpu_and_on_geometry():
    """Without the interpret override on CPU, and on non-8192 capacities,
    'section' serves through the XLA program with identical results."""
    rng = np.random.default_rng(9)
    ref = _build("scan")
    alt = DeviceVectorStore(
        dense_dim=DIM,
        sparse_vocab=VOCAB,
        sparse_max_nnz=NNZ,
        block=16,  # capacity 48: fails the section geometry gate too
        candidate_impl="section",
    )
    rng2 = np.random.default_rng(11)  # same corpus as _build(..., seed=11)
    dense = rng2.normal(size=(48, DIM)).astype(np.float32)
    alt.add_vectors(
        [
            {
                "id": f"r{i}",
                "text": f"text {i}",
                "metadata": {},
                "dense": dense[i],
                "sparse": {
                    int(t): float(rng2.random() + 0.05)
                    for t in rng2.choice(np.arange(1, VOCAB), size=NNZ, replace=False)
                },
            }
            for i in range(48)
        ]
    )
    alt.flush()
    qd, qs = _query(rng)
    r_ref = ref.query_batch(dense_queries=[qd], sparse_queries=[qs], top_k=6)[0]
    r_alt = alt.query_batch(dense_queries=[qd], sparse_queries=[qs], top_k=6)[0]
    assert [h.id for h in r_ref] == [h.id for h in r_alt]


def test_section_rejects_int4_and_bad_mesh_block():
    with pytest.raises(ValueError, match="int4"):
        DeviceVectorStore(dense_dim=DIM, dense_dtype="int4", candidate_impl="section")

    from verbatim_rag_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=4, tp=2)
    # A mesh block that cannot tile the per-shard 8192-column grid fails at
    # construction; a conforming block (mesh.size * 8192) is accepted.
    with pytest.raises(ValueError, match="8192"):
        DeviceVectorStore(
            dense_dim=DIM, mesh=mesh, block=mesh.size * 2, candidate_impl="section"
        )
    store = DeviceVectorStore(
        dense_dim=DIM, mesh=mesh, block=mesh.size * 8192, candidate_impl="section"
    )
    assert store.candidate_impl == "section"


def test_legacy_comma_pair_spec_maps_to_xla(caplog):
    """0.4.x checkpoints persisted per-stage comma-pair specs; the retired
    format must stay loadable (ADVICE r4): map to 'xla' with a warning."""
    import logging

    with caplog.at_level(logging.WARNING, logger="verbatim_rag_tpu.engine.store"):
        store = DeviceVectorStore(dense_dim=DIM, candidate_impl="bucket,xla")
    assert store.candidate_impl == "xla"
    # The mapped spec is what persists — a re-save clears the legacy format.
    assert store.candidate_impl_requested == "xla"
    assert any("comma-pair" in r.message for r in caplog.records)


def test_section_exact_request_falls_back_to_xla(monkeypatch):
    """approx_topk=False is a documented exactness knob; the section
    kernel's bucket table cannot honor it (one winner per bucket), so the
    dispatch must take the XLA program instead (ADVICE r4, medium)."""
    monkeypatch.setenv("VERBATIM_SECTION_INTERPRET", "1")
    rng = np.random.default_rng(7)
    ref, store = _build_section_pair()

    calls = {"section": 0}
    import verbatim_rag_tpu.ops.section as section_mod

    real = section_mod.hybrid_section_topk

    def spy(*a, **kw):
        calls["section"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(section_mod, "hybrid_section_topk", spy)

    qd, qs = _query(rng)
    # Control: an approx hybrid query on this store DOES ride the kernel.
    store.query_batch(dense_queries=[qd], sparse_queries=[qs], top_k=6)
    assert calls["section"] == 1

    exact = store.query_batch(
        dense_queries=[qd], sparse_queries=[qs], top_k=6,
        search_params={"approx_topk": False},
    )[0]
    assert calls["section"] == 1, "exact request must not ride the bucket table"

    # The exact path returns exactly what the exact XLA store returns.
    r_ref = ref.query_batch(
        dense_queries=[qd], sparse_queries=[qs], top_k=6,
        search_params={"approx_topk": False},
    )[0]
    assert [h.id for h in exact] == [h.id for h in r_ref]

    # Store-level approx_topk=False + auto resolves straight to xla.
    exact_store = DeviceVectorStore(
        dense_dim=DIM,
        dense_dtype="int8",
        sketch_dtype="int8",
        approx_topk=False,
    )
    assert exact_store.candidate_impl == "xla"


def test_candidate_impl_auto_resolution(tmp_path):
    """'auto' (the ctor default) follows the measured composition A/B
    (benchmarks/RESULTS.md round 4): the whole-section kernel only wins the
    composed program on the int8 tier, so auto → section there and xla
    everywhere else (bf16, int4, meshes). save() persists the REQUESTED
    spec so a reload re-resolves against the load-time mesh/backend."""
    s_int8 = DeviceVectorStore(
        dense_dim=DIM,
        sparse_vocab=VOCAB,
        sparse_max_nnz=NNZ,
        dense_dtype="int8",
        sketch_dtype="int8",
    )
    assert s_int8.candidate_impl == "section"
    assert s_int8.candidate_impl_requested == "auto"

    s_bf16 = DeviceVectorStore(dense_dim=DIM, sparse_vocab=VOCAB, sparse_max_nnz=NNZ)
    assert s_bf16.candidate_impl == "xla"

    # int4 resolves to xla silently (explicit 'section' raises instead).
    s_int4 = DeviceVectorStore(
        dense_dim=DIM, dense_dtype="int4", sketch_dtype="int4"
    )
    assert s_int4.candidate_impl == "xla"

    # Round-trip: the saved config says 'auto', and the reload re-resolves.
    s_int8.add_vectors(
        [
            {
                "id": "r0",
                "text": "t",
                "metadata": {},
                "dense": np.ones(DIM, np.float32),
                "sparse": {1: 1.0},
            }
        ]
    )
    s_int8.flush()
    path = str(tmp_path / "auto_idx")
    s_int8.save(path)
    import json

    with open(path + ".json") as f:
        assert json.load(f)["config"]["candidate_impl"] == "auto"
    loaded = DeviceVectorStore.load(path)
    assert loaded.candidate_impl == "section"


def test_section_three_way_store_parity(monkeypatch):
    """The `enable_full_text` 3-way hybrid rides the section program too
    (ops/section.py::hybrid_section_topk_3way): all three arms' tables come
    from ONE grid pass, then two exact rescores + 3-way weighted RRF. Must
    agree with the XLA 3-way program (hybrid_fused_topk_3way) on small
    corpora where the bucket tables are effectively exhaustive."""
    monkeypatch.setenv("VERBATIM_SECTION_INTERPRET", "1")
    rng = np.random.default_rng(41)
    n = 200
    dense = rng.normal(size=(n, DIM)).astype(np.float32)
    sparse_rows = [
        {
            int(t): float(rng.random() + 0.05)
            for t in rng.choice(np.arange(1, VOCAB), size=NNZ, replace=False)
        }
        for _ in range(n)
    ]
    topics = ["solar panels", "wind turbines", "hydro dams", "coal plants"]
    stores = []
    for impl in ("xla", "section"):
        s = DeviceVectorStore(
            dense_dim=DIM,
            sparse_vocab=VOCAB,
            sparse_max_nnz=NNZ,
            block=8192,
            candidate_impl=impl,
            enable_full_text=True,
            full_text_vocab=1 << 12,
        )
        s.add_vectors(
            [
                {
                    "id": f"r{i}",
                    "text": f"Document {i} about {topics[i % 4]} and energy.",
                    "metadata": {},
                    "dense": dense[i],
                    "sparse": sparse_rows[i],
                }
                for i in range(n)
            ]
        )
        s.flush()
        stores.append(s)
    ref, alt = stores
    qd, qs = _query(rng)
    kwargs = dict(
        dense_queries=[qd],
        sparse_queries=[qs],
        text_queries=["solar panels energy"],
        hybrid_weights={"dense": 0.3, "sparse": 0.3, "full_text": 0.4},
        top_k=6,
    )
    r_ref = ref.query_batch(**kwargs)[0]
    r_alt = alt.query_batch(**kwargs)[0]
    assert r_ref and r_alt
    # Same contract as the 2-way section parity test: the dense arm's
    # bucket table is approximate, so require rank-1 agreement + overlap.
    assert r_ref[0].id == r_alt[0].id
    overlap = len({h.id for h in r_ref} & {h.id for h in r_alt})
    assert overlap >= 4, (r_ref, r_alt)

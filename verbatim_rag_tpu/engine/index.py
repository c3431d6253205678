"""VerbatimIndex — ingest + retrieval orchestration over the device store.

Parity: reference `verbatim_rag/index.py` — document conversion and metadata
flattening (L73-126), chunking via provider (L128-168), enhanced text =
heading context + title/source/metadata footer (L170-198), batched dense +
sparse embedding (L200-223), per-chunk metadata assembly (L225-257),
per-document and bulk ingest (L318-411), search-type auto-resolution (hybrid
iff both providers, L612-623), browsing and `inspect` stats (L688-783).

TPU-first: embeddings are computed in corpus-level batches and appended to
the device-resident store; the bulk path streams chunk batches so encode and
index append pipeline (default flush every 2000 chunks, parity L340-411).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Iterable, Mapping, Sequence

import numpy as np

from verbatim_rag_tpu.ingestion.chunkers import ChunkerProvider, MarkdownChunkerProvider
from verbatim_rag_tpu.ingestion.document import Chunk, Document
from verbatim_rag_tpu.ingestion.schema import DocumentSchema

from .embedding_providers import (
    DenseEmbeddingProvider,
    HashedBowDenseProvider,
    HashedSparseProvider,
    SparseEmbeddingProvider,
)
from .filters import FilterSpec
from .search_result import SearchResult
from .store import DeviceVectorStore, VectorStore

logger = logging.getLogger(__name__)


class VerbatimIndex:
    """Hybrid retrieval index: chunk → encode → device arrays → fused search."""

    def __init__(
        self,
        dense_provider: DenseEmbeddingProvider | None = None,
        sparse_provider: SparseEmbeddingProvider | None = None,
        chunker: ChunkerProvider | None = None,
        store: VectorStore | None = None,
        enable_full_text: bool = False,
        db_path: str | None = None,
        mesh=None,
        dense_dtype: str = "bfloat16",
        sketch_dtype: str | None = None,
        **store_kwargs,
    ):
        self.dense_provider = dense_provider
        self.sparse_provider = sparse_provider
        self.chunker = chunker or MarkdownChunkerProvider(split_level=2, min_chunk_size=64)
        self.enable_full_text = enable_full_text
        self.db_path = db_path
        if store is not None:
            if store_kwargs:
                raise TypeError(
                    "store kwargs and an explicit store are mutually exclusive: "
                    f"{sorted(store_kwargs)}"
                )
            self.store = store
        else:
            self.store = DeviceVectorStore(
                dense_dim=dense_provider.get_dimension() if dense_provider else None,
                sparse_vocab=sparse_provider.get_dimension() if sparse_provider else None,
                enable_full_text=enable_full_text,
                mesh=mesh,
                # "int8" = capacity mode: 2x corpus rows per chip (see
                # DeviceVectorStore._dense_store_dtype). sketch_dtype="int8"
                # additionally quantizes the (largest) sketch matrix.
                dense_dtype=dense_dtype,
                sketch_dtype=sketch_dtype,
                # Remaining store knobs pass through verbatim (capacity
                # tiers, kernel impls, rescore depth, ...) — the facade
                # stays current as the store grows configuration.
                **store_kwargs,
            )
        #: document_id → {title, source, metadata, num_chunks}
        self.documents: dict[str, dict[str, Any]] = {}

    # -- ingest --------------------------------------------------------------------

    def add_documents(self, docs: Sequence[DocumentSchema | Document | dict]) -> list[str]:
        """Per-document ingest; returns document ids."""
        ids = []
        for doc in docs:
            document = self._coerce_document(doc)
            self._ingest_chunk_batch(self._prepare_document(document))
            ids.append(document.id)
        self.store.flush()
        return ids

    def add_document(self, doc: DocumentSchema | Document | dict) -> str:
        return self.add_documents([doc])[0]

    def add_documents_bulk(
        self,
        docs: Iterable[DocumentSchema | Document | dict],
        chunk_batch_size: int = 2000,
        doc_batch_size: int = 500,
    ) -> list[str]:
        """Bulk ingest with cross-document chunk batching (parity L340-411):
        chunks accumulate across documents and flush every
        ``chunk_batch_size`` chunks / ``doc_batch_size`` docs, keeping the
        encoder fed with large batches."""
        ids: list[str] = []
        pending: list[dict[str, Any]] = []
        docs_in_batch = 0
        for doc in docs:
            document = self._coerce_document(doc)
            pending.extend(self._prepare_document(document))
            ids.append(document.id)
            docs_in_batch += 1
            if len(pending) >= chunk_batch_size or docs_in_batch >= doc_batch_size:
                self._ingest_chunk_batch(pending)
                pending, docs_in_batch = [], 0
        if pending:
            self._ingest_chunk_batch(pending)
        self.store.flush()
        return ids

    def _coerce_document(self, doc: DocumentSchema | Document | dict) -> Document:
        if isinstance(doc, Document):
            return doc
        if isinstance(doc, DocumentSchema):
            return doc.to_document()
        if isinstance(doc, dict):
            return DocumentSchema(**doc).to_document()
        raise TypeError(f"Cannot ingest {type(doc)!r}")

    def _prepare_document(self, document: Document) -> list[dict[str, Any]]:
        """Chunk a document and assemble un-embedded store records."""
        pairs = self.chunker.chunk(document.content)
        footer = self._document_footer(document)
        records = []
        chunks: list[Chunk] = []
        for i, (raw, enhanced) in enumerate(pairs):
            if not raw.strip():
                continue
            chunk = Chunk(text=raw, enhanced_text=enhanced + footer)
            # System fields LAST: user metadata carrying its own
            # 'document_id'/'chunk_index' must not shadow the identity the
            # store keys deletes and browsing on (a shadowed document_id
            # makes chunks undeletable orphans).
            metadata = {
                **document.metadata,
                "document_id": document.id,
                "title": document.title or document.metadata.get("title", ""),
                "source": document.source or document.metadata.get("source", ""),
                "chunk_index": i,
            }
            records.append(
                {
                    "id": chunk.id,
                    "text": chunk.text,
                    "enhanced_text": chunk.enhanced_text,
                    "metadata": metadata,
                }
            )
            chunks.append(chunk)
        document.chunks = chunks
        self.documents[document.id] = {
            "title": document.title,
            "source": document.source,
            "metadata": document.metadata,
            "num_chunks": len(records),
        }
        return records

    @staticmethod
    def _document_footer(document: Document) -> str:
        """Title/source/metadata footer appended to enhanced text only
        (parity: `index.py:170-198`). Raw chunk text is never touched."""
        parts = []
        if document.title:
            parts.append(f"Document: {document.title}")
        if document.source:
            parts.append(f"Source: {document.source}")
        for key, value in document.metadata.items():
            if isinstance(value, (str, int, float, bool)):
                parts.append(f"{key}: {value}")
        if not parts:
            return ""
        return "\n\n[" + " | ".join(parts) + "]"

    def _ingest_chunk_batch(self, records: list[dict[str, Any]]) -> None:
        if not records:
            return
        enhanced = [r["enhanced_text"] for r in records]
        if self.dense_provider is not None:
            dense = np.asarray(self.dense_provider.embed_batch(enhanced), np.float32)
            for rec, vec in zip(records, dense):
                rec["dense"] = vec
        if self.sparse_provider is not None:
            if getattr(self.store, "accepts_sparse_arrays", False) and hasattr(
                self.sparse_provider, "embed_batch_arrays"
            ):
                # Fast path: padded top-nnz arrays straight from the device
                # into the store's forward index — no per-chunk dict
                # round-trip (embed_batch → _pad_sparse costs ~10% of
                # steady-state ingest).
                sp_ids, sp_w = self.sparse_provider.embed_batch_arrays(enhanced)
                for rec, row_ids, row_w in zip(records, sp_ids, sp_w):
                    rec["sparse_arrays"] = (row_ids, row_w)
            else:
                for rec, sparse in zip(
                    records, self.sparse_provider.embed_batch(enhanced)
                ):
                    rec["sparse"] = sparse
        self.store.add_vectors(records)

    # -- query ----------------------------------------------------------------------

    def query(
        self,
        text: str | None = None,
        k: int = 5,
        filter: FilterSpec = None,
        search_type: str | None = None,
        hybrid_weights: Mapping[str, float] | None = None,
        rrf_k: int = 60,
        search_params: Mapping[str, Any] | None = None,
    ) -> list[SearchResult]:
        return self.query_batch(
            [text] if text is not None else None,
            k=k,
            filter=filter,
            search_type=search_type,
            hybrid_weights=hybrid_weights,
            rrf_k=rrf_k,
            search_params=search_params,
        )[0]

    def query_batch(
        self,
        texts: Sequence[str] | None,
        k: int = 5,
        filter: FilterSpec = None,
        search_type: str | None = None,
        hybrid_weights: Mapping[str, float] | None = None,
        rrf_k: int = 60,
        search_params: Mapping[str, Any] | None = None,
    ) -> list[list[SearchResult]]:
        """Batched retrieval. Search-type resolution (parity L552-655):

        - ``filter`` with no text → filter-only browse;
        - explicit ``hybrid_weights`` → weighted N-way hybrid over the named
          methods;
        - explicit ``search_type`` in {dense, sparse, hybrid, full_text};
        - otherwise auto: hybrid when both providers exist, else whichever
          single provider is configured.

        ``search_params`` forwards per-search knobs to the store (parity with
        the reference forwarding Milvus search_params): ``rescore_depth``
        trades sparse recall vs speed per query; ``approx_topk`` picks the
        candidate k-selection strategy.
        """
        if texts is None:
            return self.store.query_batch(top_k=k, filter=filter)

        resolved = self._resolve_search_type(search_type, hybrid_weights)
        methods = (
            set(hybrid_weights)
            if hybrid_weights
            else {"dense", "sparse"}
            if resolved == "hybrid"
            else {resolved}
        )
        if hybrid_weights or search_type == "hybrid":
            # An EXPLICIT hybrid request must not silently degrade to
            # whatever single method happens to have a provider — same
            # raise-don't-degrade rule the store enforces for single
            # methods (store.py query dispatch).
            available = {
                "dense": self.dense_provider is not None,
                "sparse": self.sparse_provider is not None,
                "full_text": self.enable_full_text,
            }
            missing = sorted(m for m in methods if not available.get(m, False))
            if missing:
                raise ValueError(
                    f"Hybrid query requests {missing} but this index has no "
                    "matching provider/full-text config; configure the "
                    "provider or drop the method from the request"
                )

        # Device handoff (on by default): JAX providers return device arrays
        # that the store composes straight into the fused search program —
        # the encode→search chain then has no intermediate host readback.
        # VERBATIM_DEVICE_HANDOFF=0 restores the host materialization path
        # (A/B knob; also the path non-JAX providers always take).
        handoff = (
            os.environ.get("VERBATIM_DEVICE_HANDOFF", "1") != "0"
            and getattr(self.store, "accepts_query_arrays", False)
        )
        dense_q = None
        if "dense" in methods and self.dense_provider is not None:
            if handoff and hasattr(self.dense_provider, "embed_batch_device"):
                dense_q = self.dense_provider.embed_batch_device(list(texts))
            else:
                dense_q = np.asarray(
                    self.dense_provider.embed_batch(list(texts)), np.float32
                )
        sparse_q = None
        if "sparse" in methods and self.sparse_provider is not None:
            if handoff and hasattr(self.sparse_provider, "embed_query_arrays_device"):
                sparse_q = self.sparse_provider.embed_query_arrays_device(list(texts))
            else:
                sparse_q = self.sparse_provider.embed_batch(list(texts))
        text_q = list(texts) if "full_text" in methods and self.enable_full_text else None

        return self.store.query_batch(
            dense_queries=dense_q,
            sparse_queries=sparse_q,
            text_queries=text_q,
            top_k=k,
            filter=filter,
            search_type=None if len(methods) > 1 else next(iter(methods)),
            hybrid_weights=hybrid_weights,
            rrf_k=rrf_k,
            search_params=search_params,
        )

    def _resolve_search_type(
        self, search_type: str | None, hybrid_weights: Mapping[str, float] | None
    ) -> str:
        if hybrid_weights:
            return "hybrid"
        if search_type:
            return search_type
        if self.dense_provider is not None and self.sparse_provider is not None:
            return "hybrid"
        if self.dense_provider is not None:
            return "dense"
        if self.sparse_provider is not None:
            return "sparse"
        if self.enable_full_text:
            return "full_text"
        raise ValueError("No embedding providers configured")

    # -- browsing --------------------------------------------------------------------

    def get_document(self, document_id: str) -> dict[str, Any] | None:
        return self.documents.get(document_id)

    def get_all_documents(self) -> list[dict[str, Any]]:
        return [{"id": doc_id, **info} for doc_id, info in self.documents.items()]

    def get_all_chunks(self, limit: int = 100) -> list[SearchResult]:
        return self.store.get_by_filter(None, limit=limit)

    def get_chunks_by_document(self, document_id: str, limit: int = 1000) -> list[SearchResult]:
        return self.store.get_by_filter({"document_id": document_id}, limit=limit)

    def delete_document(self, document_id: str) -> None:
        self.store.delete_document(document_id)
        self.documents.pop(document_id, None)

    def inspect(self) -> dict[str, Any]:
        """Index statistics (parity: `index.py:741-783`)."""
        return {
            "num_documents": len(self.documents),
            "num_chunks": self.store.count(),
            "dense": self.dense_provider is not None,
            "sparse": self.sparse_provider is not None,
            "full_text": self.enable_full_text,
            "dense_dim": self.dense_provider.get_dimension() if self.dense_provider else None,
            "sparse_vocab": (
                self.sparse_provider.get_dimension() if self.sparse_provider else None
            ),
        }

    # -- persistence -------------------------------------------------------------------

    def save(self, path: str | None = None) -> None:
        import json

        path = path or self.db_path
        if not path:
            raise ValueError("No path given and no db_path configured")
        self.store.save(path)
        # json_safe: document metadata may hold datetimes/enums/sets — the
        # store's own dump already tolerates them; docs.json must too, or a
        # save crashes AFTER the store files were written (partial state).
        from .store import json_safe

        with open(path + ".docs.json", "w") as f:
            json.dump(self.documents, f, default=json_safe)
        # Provider identity: an index is only meaningful in the vector space
        # of the providers that built it (ADVICE round 1) — persist who they
        # were so `load` reconstructs the same space or fails loudly.
        providers = {
            "dense": self.dense_provider.describe() if self.dense_provider else None,
            "sparse": self.sparse_provider.describe() if self.sparse_provider else None,
        }
        with open(path + ".providers.json", "w") as f:
            json.dump(providers, f)

    def load_documents(self, path: str | None = None) -> None:
        import json

        path = path or self.db_path
        with open(path + ".docs.json") as f:
            self.documents = json.load(f)

    @classmethod
    def load(
        cls,
        path: str,
        mesh=None,
        dense_provider: DenseEmbeddingProvider | None = None,
        sparse_provider: SparseEmbeddingProvider | None = None,
    ) -> "VerbatimIndex":
        """Load a saved index, reconstructing the providers that built it.

        Explicit provider args override the persisted identities. For legacy
        indexes saved without identities, falls back to hashed providers with
        a loud warning (those indexes were hashed-built in practice, but the
        space cannot be verified).
        """
        import json
        import logging
        import os

        from .embedding_providers import provider_from_config

        store = DeviceVectorStore.load(path, mesh=mesh)
        providers_path = path + ".providers.json"
        if os.path.exists(providers_path):
            with open(providers_path) as f:
                identities = json.load(f)
            if dense_provider is None:
                dense_provider = provider_from_config(identities.get("dense"))
            if sparse_provider is None:
                sparse_provider = provider_from_config(identities.get("sparse"))
        else:
            log = logging.getLogger(__name__)
            if dense_provider is None and store.dense_dim:
                log.warning(
                    "Index at %s has no provider identity (pre-round-2 save); "
                    "assuming HashedBowDenseProvider(dim=%d). If it was built "
                    "with a neural provider, retrieval will be meaningless — "
                    "pass the original provider explicitly.",
                    path,
                    store.dense_dim,
                )
                dense_provider = HashedBowDenseProvider(dim=store.dense_dim)
            if sparse_provider is None and store.sparse_vocab:
                log.warning(
                    "Index at %s has no sparse provider identity; assuming "
                    "HashedSparseProvider(vocab_size=%d).",
                    path,
                    store.sparse_vocab,
                )
                sparse_provider = HashedSparseProvider(vocab_size=store.sparse_vocab)

        index = cls(
            dense_provider=dense_provider,
            sparse_provider=sparse_provider,
            store=store,
            enable_full_text=store.enable_full_text,
            db_path=path,
        )
        if os.path.exists(path + ".docs.json"):
            index.load_documents(path)
        return index

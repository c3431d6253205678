"""Device compute ops: jitted retrieval scoring + Pallas kernels.

This package replaces the native search capabilities the reference outsourced
to Milvus (SURVEY.md §2.8): brute-force dense search (IVF_FLAT/COSINE →
MXU tiled matmul + top-k), sparse top-k (SPARSE_INVERTED_INDEX/DAAT →
signed-projection sketch candidates + exact rescore, with an exact
forward-index scan retained), BM25 scoring (server-side function → on-device
BM25 from corpus stats), RRF merge (client-side → fused on-device / host),
plus the encoder kernels (Pallas flash attention, ring attention).
"""

from .dense import dense_topk, normalize_rows
from .flash_attention import attention_reference, flash_attention, flash_attention_tpu
from .fusion import rrf_fuse_device, rrf_fuse_np, rrf_merge_host
from .hybrid import hybrid_candidates, hybrid_topk
from .ring_attention import ring_attention, shard_sequence
from .sparse import bm25_idf, bm25_saturate, densify_queries, sparse_topk
from .sparse_projected import (
    exact_rescore,
    project_rows,
    project_sparse_queries,
    projection_matrix,
)

__all__ = [
    "attention_reference",
    "bm25_idf",
    "bm25_saturate",
    "dense_topk",
    "densify_queries",
    "exact_rescore",
    "flash_attention",
    "flash_attention_tpu",
    "hybrid_candidates",
    "hybrid_topk",
    "normalize_rows",
    "project_rows",
    "project_sparse_queries",
    "projection_matrix",
    "ring_attention",
    "rrf_fuse_device",
    "rrf_fuse_np",
    "rrf_merge_host",
    "shard_sequence",
    "sparse_topk",
]

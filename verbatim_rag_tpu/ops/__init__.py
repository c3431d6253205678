"""Device compute ops: jitted retrieval scoring + Pallas kernels.

This package replaces the native search capabilities the reference outsourced
to Milvus (SURVEY.md §2.8): brute-force dense search (IVF_FLAT/COSINE →
MXU tiled matmul + top-k), sparse DAAT top-k (SPARSE_INVERTED_INDEX →
padded forward-index gather scan), BM25 scoring (server-side function →
on-device BM25 from corpus stats), and client-side RRF merge (→ on-device
scatter-add fusion).
"""

from .dense import dense_topk, normalize_rows
from .fusion import rrf_fuse_device, rrf_merge_host
from .sparse import sparse_topk

__all__ = [
    "dense_topk",
    "normalize_rows",
    "rrf_fuse_device",
    "rrf_merge_host",
    "sparse_topk",
]

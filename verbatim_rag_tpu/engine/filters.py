"""Metadata filtering: device-side boolean masks from host-side predicates.

TPU-native replacement for Milvus scalar filtering / JSON predicate pushdown
(`milvus_base.py:315-353`). Instead of a query-language string evaluated
inside a C++ store, a filter here compiles to a boolean mask over index rows
that the scoring kernels apply *before* top-k (masked rows score -inf), so
filtered search costs the same device pass as unfiltered search.

Accepted filter shapes:
- ``dict``: equality / membership per field — ``{"document_id": "d1"}``,
  ``{"dataset_id": ["a", "b"]}``. Promoted fields (user_id, document_id,
  dataset_id — mirroring the reference's promoted dynamic fields,
  `vector_stores/utils.py:32-52`) are evaluated vectorized over hashed
  columns; other fields fall back to a per-row metadata scan.
- ``callable``: ``fn(metadata: dict) -> bool`` evaluated per row.
"""

from __future__ import annotations

import hashlib
from typing import Any, Callable, Mapping, Sequence, Union

import numpy as np

FilterSpec = Union[Mapping[str, Any], Callable[[dict], bool], None]

#: Fields mirrored into vectorized hash columns at ingest.
PROMOTED_FIELDS = ("user_id", "document_id", "dataset_id")


def stable_hash64(value: Any) -> np.int64:
    """Deterministic 64-bit hash of a scalar (stable across processes)."""
    digest = hashlib.blake2b(repr(value).encode(), digest_size=8).digest()
    return np.int64(int.from_bytes(digest, "little", signed=True))


def compile_filter(
    spec: FilterSpec,
    n_rows: int,
    promoted_columns: Mapping[str, np.ndarray],
    metadata_rows: Sequence[dict],
) -> np.ndarray | None:
    """Compile a filter spec to a boolean row mask (or None for no filter)."""
    if spec is None:
        return None
    if callable(spec):
        mask = np.zeros(n_rows, dtype=bool)
        for i in range(n_rows):
            try:
                mask[i] = bool(spec(metadata_rows[i]))
            except Exception:
                mask[i] = False
        return mask
    if not isinstance(spec, Mapping):
        raise TypeError(f"Unsupported filter spec: {type(spec)!r}")

    mask = np.ones(n_rows, dtype=bool)
    for fieldname, expected in spec.items():
        values = (
            list(expected)
            if isinstance(expected, (list, tuple, set, frozenset))
            else [expected]
        )
        if fieldname in promoted_columns:
            column = promoted_columns[fieldname][:n_rows]
            wanted = np.array([stable_hash64(v) for v in values], dtype=np.int64)
            mask &= np.isin(column, wanted)
        else:
            row_ok = np.fromiter(
                (metadata_rows[i].get(fieldname) in values for i in range(n_rows)),
                dtype=bool,
                count=n_rows,
            )
            mask &= row_ok
    return mask

"""Device-resident hybrid vector store.

TPU-native replacement for the reference's Milvus-backed stores
(`vector_stores/milvus_local.py`, `milvus_cloud.py`, `milvus_base.py`): the
index *is* a set of sharded device arrays, not an external service.

Layout per capability (all shapes static, capacity grows in block multiples):

- dense:      ``[cap, d]`` row-normalized bf16 (cosine ≡ dot on the MXU)
- sparse:     padded forward index ``token_ids [cap, m] i32`` +
              ``weights [cap, m] f32`` (SPLADE term weights)
- full-text:  same forward-index layout holding BM25-saturated term
              frequencies over a hashed analyzer vocab, plus host-side
              document-frequency stats (parity with the server-side BM25
              function of `milvus_cloud.py:157-197`)
- validity:   ``[cap] bool`` — tombstones for deletes (Milvus gives deletes
              away; device arrays use mask + periodic compaction)

Text, enhanced text, and metadata stay host-side (they are only materialized
for the final top-k hits); promoted metadata fields are mirrored into hashed
columns for vectorized filtering (`filters.py`).

Writes append into host-side pending buffers; `flush()` materializes device
arrays (append = device concat). Queries auto-flush. Hybrid queries fetch
``top_k*2`` per method (parity with `milvus_base.py:261-294`) and fuse with
weighted RRF on device.
"""

from __future__ import annotations

import json
import logging
import os
import re
from abc import ABC, abstractmethod
from typing import Any, Mapping, Sequence

import numpy as np

from .filters import PROMOTED_FIELDS, FilterSpec, compile_filter, stable_hash64
from .search_result import SearchResult

logger = logging.getLogger(__name__)

_BLOCK = 8192
#: New rows are padded to this multiple before the device write, so flushes
#: of any size reuse a handful of compiled write programs.
_FLUSH_PAD = 1024

_write_rows_jit = None


def _write_rows():
    """Lazy jitted row writer: (arr [cap, w], rows [r, w], offset) → arr.

    The offset is traced, so every flush at the same (cap, r) shape reuses
    one cached executable. No donation: a concurrent reader (an in-flight
    query on another thread) may still hold the previous buffer, and the
    non-donated copy is one HBM-bandwidth pass per flush.
    """
    global _write_rows_jit
    if _write_rows_jit is None:
        import jax

        def _write(arr, rows, offset):
            return jax.lax.dynamic_update_slice(arr, rows, (offset, 0))

        _write_rows_jit = jax.jit(_write)
    return _write_rows_jit


class VectorStore(ABC):
    """Abstract store contract (parity: `vector_stores/base.py:42-74`)."""

    @abstractmethod
    def add_vectors(self, records: list[dict[str, Any]]) -> None:
        """Insert records: {id, text, enhanced_text, metadata, dense?, sparse?}."""

    @abstractmethod
    def query(self, **kwargs) -> list[SearchResult]:
        """Search; see DeviceVectorStore.query for the full parameter set."""

    @abstractmethod
    def delete(self, ids: list[str]) -> None:
        """Remove records by id."""


def json_safe(value):
    """``json.dump`` default for metadata payloads.

    Parity: `vector_stores/utils.py:10-29` json_serialize_safe —
    datetimes/enums/sets in metadata must not break persistence. Shared by
    the store's own state dump and ``VerbatimIndex.save``'s docs.json.
    """
    import datetime
    import enum

    if isinstance(value, (datetime.date, datetime.datetime)):
        return value.isoformat()
    if isinstance(value, enum.Enum):
        return value.value
    if isinstance(value, (set, frozenset)):
        return sorted(value)
    if isinstance(value, np.generic):
        return value.item()
    return str(value)


def _fnv1a(token: str) -> int:
    """FNV-1a 32-bit — identical to the C++ analyzer so an index built with
    either implementation is queryable with the other."""
    h = 2166136261
    for byte in token.encode():
        h = ((h ^ byte) * 16777619) & 0xFFFFFFFF
    return h


def _analyze(text: str, vocab_size: int) -> tuple[np.ndarray, np.ndarray, int]:
    """BM25 analyzer: lowercase word tokens hashed into a fixed vocab.

    :return: (unique term ids, term frequencies, document length).

    Slot layout matches `native/verbatim_host.cpp::analyze_text` exactly
    (FNV-1a mod vocab−1, slot 0 reserved for padding); the native path is
    used when available.
    """
    from .native import analyze_text_native

    native = analyze_text_native(text, vocab_size)
    if native is not None:
        return native
    tokens = re.findall(r"[a-z0-9]+", text.lower())
    if not tokens:
        return np.zeros(0, np.int32), np.zeros(0, np.int32), 0
    ids = np.fromiter(
        ((_fnv1a(t[:256]) % (vocab_size - 1)) + 1 for t in tokens),
        dtype=np.int64,
        count=len(tokens),
    )
    unique, counts = np.unique(ids, return_counts=True)
    return unique.astype(np.int32), counts.astype(np.int32), len(tokens)


def _pad_sparse(
    entries: Mapping[int, float] | Sequence[tuple[int, float]],
    max_nnz: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Pad a sparse vector to fixed width, keeping the heaviest terms."""
    items = list(entries.items()) if isinstance(entries, Mapping) else list(entries)
    items = [(int(t), float(w)) for t, w in items if w != 0.0]
    if len(items) > max_nnz:
        items.sort(key=lambda tw: -abs(tw[1]))
        items = items[:max_nnz]
    ids = np.zeros(max_nnz, np.int32)
    weights = np.zeros(max_nnz, np.float32)
    for j, (t, w) in enumerate(items):
        ids[j] = t
        weights[j] = w
    return ids, weights


def _is_device_array(x) -> bool:
    """True for jax.Array inputs (the device query handoff)."""
    import jax

    return isinstance(x, jax.Array)


def _is_sparse_arrays(payload) -> bool:
    """True when a sparse query payload is an ``(ids, weights)`` array pair
    rather than a sequence of term→weight mappings."""
    return (
        isinstance(payload, tuple)
        and len(payload) == 2
        and not isinstance(payload[0], Mapping)
        and getattr(payload[0], "ndim", None) == 2
    )


class DeviceVectorStore(VectorStore):
    """The HBM-resident hybrid index."""

    #: records may carry ``sparse_arrays`` = (ids int32 [m], weights f32 [m])
    #: instead of a ``sparse`` dict — the provider→store ingest fast path
    #: (padded top-nnz rows go straight into the forward index).
    accepts_sparse_arrays = True
    #: query_batch accepts jax.Array dense queries and (ids, w) sparse query
    #: array pairs — the encode→search device handoff (`VerbatimIndex`
    #: checks this before passing device arrays through).
    accepts_query_arrays = True

    def __init__(
        self,
        dense_dim: int | None = 384,
        sparse_vocab: int | None = 30522,
        sparse_max_nnz: int = 128,
        enable_full_text: bool = False,
        full_text_vocab: int = 1 << 17,
        full_text_max_nnz: int = 256,
        dense_dtype: str = "bfloat16",
        sketch_dtype: str | None = None,
        block: int = _BLOCK,
        bm25_k1: float = 1.2,
        bm25_b: float = 0.75,
        sparse_mode: str = "projected",
        projection_dim: int = 768,
        rescore_depth: int = 256,
        projection_seed: int = 0,
        mesh=None,
        approx_topk: bool = True,
        auto_compact_threshold: float | None = None,
        allow_exact_at_scale: bool = False,
        rescore_impl: str = "pallas",
        candidate_impl: str = "auto",
        sparse_weight_dtype: str = "float32",
        sparse_ids_dtype: str = "int32",
    ):
        if sparse_mode not in ("projected", "exact"):
            raise ValueError(f"sparse_mode must be 'projected' or 'exact', got {sparse_mode!r}")
        if rescore_impl not in ("scan", "oneshot", "pallas"):
            raise ValueError(
                f"rescore_impl must be 'scan', 'oneshot' or 'pallas', got {rescore_impl!r}"
            )
        from ..ops.hybrid import validate_candidate_impl

        if "," in candidate_impl:
            # 0.4.x persisted per-stage comma-pair specs ("dense,sketch"
            # splits like "bucket,xla"); the split was retired in 0.5.0 but
            # indexes saved under it must stay loadable. Map a valid legacy
            # pair to its measured composition winner instead of raising;
            # junk specs still fail like any other typo.
            parts = candidate_impl.split(",")
            if len(parts) != 2 or any(p not in ("xla", "bucket") for p in parts):
                raise ValueError(
                    f"candidate_impl {candidate_impl!r} is not a valid spec "
                    "(the 0.4.x comma-pair format held exactly two of "
                    "'xla'/'bucket')"
                )
            logger.warning(
                "candidate_impl=%r is the retired 0.4.x per-stage comma-pair "
                "spec; using 'xla' (the measured composition winner). "
                "Re-save the index to persist the new spec.",
                candidate_impl,
            )
            candidate_impl = "xla"
        #: the spec as passed ("auto" before resolution) — persisted by
        #: save() so a reloaded store re-resolves against the load-time
        #: mesh/tier instead of freezing one machine's resolution.
        self.candidate_impl_requested = candidate_impl
        if candidate_impl == "auto":
            # Measured policy (benchmarks/RESULTS.md round 4, full-program
            # composition A/B at [512, 1M]): the whole-section kernel wins
            # the COMPOSED serving program only on the int8 tier, where its
            # halved DMA + doubled MXU rate survive the composition tax
            # (15.27 vs 16.28 ms); on bf16 the XLA program's software
            # pipelining of the two matmuls against the rescore wins
            # (17.61 vs 19.42). int4 stores are XLA-only; mesh stores
            # resolve to 'xla' under "auto" (the per-shard section path
            # exists — sharded_hybrid_section_topk — but is opt-in until
            # measured on multi-chip hardware); and a store built for
            # exact selection (approx_topk=False) resolves to the XLA
            # program outright — the section kernel's bucket table is
            # approximate by construction.
            candidate_impl = (
                "section"
                if dense_dtype == "int8"
                and sketch_dtype == "int8"
                and mesh is None
                and approx_topk
                else "xla"
            )
        if candidate_impl == "section":
            # Whole-candidate-section Pallas program (ops/section.py): both
            # hybrid matmuls + in-VMEM selection in ONE kernel over
            # TRANSPOSED corpora. Not a per-stage impl, so it bypasses the
            # split; constraints checked here so misconfiguration fails at
            # construction, not first query.
            if dense_dtype == "int4" or sketch_dtype == "int4":
                raise ValueError(
                    "candidate_impl='section' does not serve the int4 tier "
                    "(the section kernel streams int8/bf16 blocks; no packed "
                    "4-bit unpack) — use 'xla' for int4 stores"
                )
            if mesh is not None and block % (mesh.size * 8192) != 0:
                raise ValueError(
                    "candidate_impl='section' on a mesh needs each shard's "
                    "capacity to tile the kernel's 8192-column grid: pass "
                    f"block as a multiple of mesh.size*8192 ({mesh.size * 8192}), "
                    f"got block={block}"
                )
        else:
            validate_candidate_impl(candidate_impl)  # raises on bad specs
        if dense_dtype not in ("bfloat16", "float32", "int8", "int4"):
            raise ValueError(
                "dense_dtype must be 'bfloat16', 'float32', 'int8' or 'int4', "
                f"got {dense_dtype!r}"
            )
        if sketch_dtype not in (None, "bfloat16", "float32", "int8", "int4"):
            raise ValueError(
                "sketch_dtype must be None, 'bfloat16', 'float32', 'int8' or "
                f"'int4', got {sketch_dtype!r}"
            )
        if dense_dtype == "int4" and dense_dim % 2:
            raise ValueError("int4 dense packing needs an even dense_dim")
        if sketch_dtype == "int4" and projection_dim % 2:
            raise ValueError("int4 sketch packing needs an even projection_dim")
        if sparse_weight_dtype not in ("float32", "float16"):
            raise ValueError(
                "sparse_weight_dtype must be 'float32' or 'float16', "
                f"got {sparse_weight_dtype!r}"
            )
        if sparse_ids_dtype not in ("int32", "int16"):
            raise ValueError(
                f"sparse_ids_dtype must be 'int32' or 'int16', got {sparse_ids_dtype!r}"
            )
        if sparse_ids_dtype == "int16" and sparse_vocab > 32768:
            raise ValueError(
                f"sparse_ids_dtype='int16' holds vocab ids < 32768; "
                f"sparse_vocab is {sparse_vocab}"
            )
        if mesh is not None and block % mesh.size != 0:
            raise ValueError(
                f"block ({block}) must be a multiple of the mesh size ({mesh.size}) "
                "so index rows shard evenly"
            )
        if sparse_mode == "exact":
            logger.warning(
                "sparse_mode='exact' scans the forward index with XLA gathers — "
                "correct everywhere, but orders of magnitude slower than "
                "'projected' on TPU backends at large N (gathers don't "
                "vectorize on the MXU/VPU). Intended for validation runs."
            )
        self.dense_dim = dense_dim
        self.sparse_vocab = sparse_vocab
        self.sparse_max_nnz = sparse_max_nnz
        self.enable_full_text = enable_full_text
        self.full_text_vocab = full_text_vocab
        self.full_text_max_nnz = full_text_max_nnz
        self.dense_dtype = dense_dtype
        #: Sketch-matrix storage dtype. None follows dense_dtype's float
        #: family; "int8" quantizes sketches per row — at 1M×768 the sketch
        #: matrix is the LARGEST device array (1.5 GB bf16), so int8 halves
        #: it. Sketches only pick rescore candidates (exact forward-index
        #: rescore fixes every reported score), so quantization moves
        #: candidate recall, not correctness — validated by recall tests.
        self.sketch_dtype = sketch_dtype
        self.block = block
        self.bm25_k1 = bm25_k1
        self.bm25_b = bm25_b
        self.sparse_mode = sparse_mode
        self.projection_dim = projection_dim
        self.rescore_depth = rescore_depth
        self.projection_seed = projection_seed
        #: Optional `jax.sharding.Mesh` — when set, index arrays are
        #: row-sharded over every mesh device and queries run through the
        #: distributed kernels in `parallel/sharded_search.py` (per-shard
        #: top-k + ICI merge). The multi-chip replacement for Milvus's
        #: horizontally-scaled cluster (`milvus_base.py:189-313`).
        self.mesh = mesh
        #: Auto-compaction: when set, `delete()` rebuilds the arrays densely
        #: once the dead fraction exceeds this (Milvus hides the equivalent
        #: housekeeping inside the service). None = manual `compact()` only.
        self.auto_compact_threshold = auto_compact_threshold
        self.allow_exact_at_scale = allow_exact_at_scale
        #: Candidate k-selection: `approx_max_k` (TPU hardware MIPS top-k,
        #: recall_target per ops/dense.candidate_select — measured 3–10× faster at 1M on v5e) vs exact
        #: `lax.top_k`. Serving default is approx: measured at 1M chunks with
        #: SPLADE-like stats, the hybrid top-10 is IDENTICAL to the exact
        #: pipeline (benchmarks/recall_1m.py — overlap 1.0, recall@10 vs
        #: ground truth 0.9906 for both). Per-query override via
        #: search_params["approx_topk"]=False.
        self.approx_topk = approx_topk
        #: Exact-rescore strategy inside the fused programs (ops/hybrid.py
        #: rescore_fn): "scan" (reference), "oneshot" (single XLA broadcast
        #: reduction), "pallas" (VMEM-resident kernel). Differential-tested
        #: equal; switches the device program, so A/B-able per store.
        self.rescore_impl = rescore_impl
        #: Candidate-selection strategy: "xla" matmul + approx/exact top-k
        #: (ops/dense.py candidate_topk), "section" the whole-candidate-
        #: section Pallas program (ops/section.py, round-4 default-eligible
        #: winner on TPU 2-way hybrids), or "bucket" the per-stage Pallas
        #: matmul+bucket-max kernel (measured A/B instrument; auto-falls
        #: back off-TPU or on shapes/dtypes it doesn't serve). Same
        #: selection family — candidate recall knob, not a correctness
        #: knob. (The round-3 "dense,sketch" comma-pair spec was retired
        #: with the section kernel, VERDICT r3 #9.)
        self.candidate_impl = candidate_impl
        self._warned_section_fallback: set[str] = set()
        #: Forward-index weight storage. At scale the [N, m] id+weight
        #: arrays dominate HBM (8 B/slot at 1M x 128 = 1 GB; 4x that at
        #: the 4M capacity point) — "float16" halves the weight half.
        #: Exact-rescore math still runs f32; reported scores become
        #: exact dots of the f16-stored weights (~3 significant digits,
        #: the SPLADE heads' own training precision).
        self.sparse_weight_dtype = sparse_weight_dtype
        #: Forward-index term-id storage; "int16" (vocab < 32768 — BERT's
        #: 30522 fits) halves the id half. Ids are exact integers either
        #: way, so results are bit-identical to int32.
        self.sparse_ids_dtype = sparse_ids_dtype

        # Host-side record state.
        self._ids: list[str] = []
        self._row_of: dict[str, int] = {}
        self._texts: list[str] = []
        self._enhanced: list[str] = []
        self._metadata: list[dict] = []
        self._valid = np.zeros(0, dtype=bool)
        self._promoted: dict[str, np.ndarray] = {
            f: np.zeros(0, dtype=np.int64) for f in PROMOTED_FIELDS
        }

        # Pending (unflushed) vector buffers (+ id set for duplicate checks).
        self._pending: list[dict[str, Any]] = []
        self._pending_ids: set[str] = set()

        # Device arrays (built lazily on flush).
        self._dense = None  # [cap, d] (int8 when dense_dtype="int8")
        self._dense_scale = None  # [cap, 1] f32 per-row scales (int8 mode only)
        self._sp_ids = None  # [cap, m]
        self._sp_w = None  # [cap, m]
        self._sp_proj = None  # [cap, d_p] projected sparse sketches
        self._sp_proj_scale = None  # [cap, 1] f32 scales (int8 sketches only)
        self._ft_ids = None  # [cap, fm]
        self._ft_tf = None  # [cap, fm] raw tf
        self._ft_w = None  # [cap, fm] BM25-saturated weights
        self._ft_proj = None  # [cap, d_p] projected BM25 sketches
        self._ft_proj_scale = None  # [cap, 1] f32 scales (int8 sketches only)

        self._valid_dev = None  # [cap]
        self._capacity = 0
        #: Lazily-materialized TRANSPOSED ([d, cap]) corpus copies for
        #: candidate_impl="section" (ops/section.py wants the contraction
        #: dim on sublanes). Built on first section query, dropped whenever
        #: the backing arrays change (flush/reserve/compact — deletes only
        #: flip the mask, which is passed fresh per query). Costs one extra
        #: corpus copy in HBM (~2.3 GB at 1M bf16, ~1.2 GB int8).
        self._section_t = None
        self._section_ft_t = None  # [d_p, cap] BM25-sketch transpose (3-way)

        # Full-text corpus stats (host).
        self._doc_len = np.zeros(0, dtype=np.float32)
        self._doc_freq = (
            np.zeros(full_text_vocab, dtype=np.int64) if enable_full_text else None
        )

    # -- basic accessors -----------------------------------------------------

    @property
    def _dense_store_dtype(self):
        """Device dtype of the dense matrix. ``int8`` is the capacity mode:
        per-row symmetric quantization (`ops/dense.quantize_rows_int8`) halves
        HBM vs bf16 (2x corpus rows per chip) and runs the candidate matmul on
        the MXU int8 path (~1.3x faster at [512, 1M] on v5e) at a measured
        recall cost (dense-only recall@10 ~0.96 vs f32 exact; hybrid RRF
        absorbs most of it — see benchmarks/recall_1m.py --dense-dtype int8).
        """
        import jax.numpy as jnp

        return {
            "bfloat16": jnp.bfloat16,
            "float32": jnp.float32,
            "int8": jnp.int8,
            "int4": jnp.int8,  # two 4-bit codes packed per byte
        }[self.dense_dtype]

    @property
    def _dense_quantized(self) -> bool:
        return self.dense_dtype in ("int8", "int4")

    @property
    def _dense_width(self) -> int:
        """Stored column count of the dense matrix (int4 packs pairs)."""
        return self.dense_dim // 2 if self.dense_dtype == "int4" else self.dense_dim

    @property
    def _sketch_quantized(self) -> bool:
        return self.sketch_dtype in ("int8", "int4")

    @property
    def _sp_w_dtype(self):
        import jax.numpy as jnp

        return jnp.float16 if self.sparse_weight_dtype == "float16" else jnp.float32

    @property
    def _sp_ids_dtype(self):
        import jax.numpy as jnp

        return jnp.int16 if self.sparse_ids_dtype == "int16" else jnp.int32

    @property
    def _sketch_width(self) -> int:
        """Stored column count of the sketch matrices (int4 packs pairs)."""
        return (
            self.projection_dim // 2
            if self.sketch_dtype == "int4"
            else self.projection_dim
        )

    @property
    def _sketch_dtype(self):
        """Sketch-matrix storage dtype: explicit ``sketch_dtype`` wins;
        otherwise sketches follow the dense matrix's float family."""
        import jax.numpy as jnp

        if self.sketch_dtype is not None:
            return {
                "bfloat16": jnp.bfloat16,
                "float32": jnp.float32,
                "int8": jnp.int8,
                "int4": jnp.int8,
            }[self.sketch_dtype]
        return jnp.float32 if self.dense_dtype == "float32" else jnp.bfloat16

    def _dense_rows_f32(self, n: int) -> np.ndarray:
        """Host float32 view of the first ``n`` dense rows (dequantized)."""
        if self.dense_dtype == "int4":
            packed = np.asarray(self._dense[:n], np.int8)
            lo = np.right_shift(np.left_shift(packed, 4), 4)
            hi = np.right_shift(packed, 4)
            codes = np.concatenate([lo, hi], axis=-1)  # half-split layout
            return codes.astype(np.float32) * np.asarray(
                self._dense_scale[:n], np.float32
            )
        rows = np.asarray(self._dense[:n], np.float32)
        if self.dense_dtype == "int8":
            rows = rows * np.asarray(self._dense_scale[:n], np.float32)
        return rows

    def _dense_scoring_args(self):
        """(corpus, scale) as the fused programs expect them; int4 wraps
        the packed codes + scales into the ops-level Int4Rows carrier."""
        if self.dense_dtype == "int4":
            from verbatim_rag_tpu.ops.dense import Int4Rows

            return Int4Rows(self._dense, self._dense_scale), None
        return self._dense, self._dense_scale

    def _sketch_scoring_args(self, proj, scale):
        """Same boundary wrap for a sketch matrix (sp or full-text)."""
        if self.sketch_dtype == "int4":
            from verbatim_rag_tpu.ops.dense import Int4Rows

            return Int4Rows(proj, scale), None
        return proj, scale

    @property
    def _per_stage_candidate_impl(self) -> str:
        """'section' is a whole-program impl (both arms in one kernel); the
        per-stage kernels (single-method queries, the 3-way/sharded
        programs) take the stage-wise default instead."""
        return "xla" if self.candidate_impl == "section" else self.candidate_impl

    def _section_transposed(self):
        """[d, cap] device transposes of (dense, sketch) for the section
        kernel, built once per backing-array generation (see _section_t)."""
        if self._section_t is None:
            import jax.numpy as jnp

            dense_c, _ = self._dense_scoring_args()
            sketch_c, _ = self._sketch_scoring_args(
                self._sp_proj, self._sp_proj_scale
            )
            # Eager device transposes: one [cap, d] read + [d, cap] write
            # each — a few ms at 1M, amortized over every query until the
            # next flush/compact. On a mesh the transposes are re-placed
            # COLUMN-sharded (P(None, ('dp','tp'))) so each shard holds
            # exactly its row range's transpose for the per-shard kernel.
            self._section_t = (
                self._place_cols(jnp.swapaxes(dense_c, 0, 1)),
                self._place_cols(jnp.swapaxes(sketch_c, 0, 1)),
            )
        return self._section_t

    def _place_cols(self, arr):
        """Column-shard a [d, cap] transpose over the mesh (no-op without)."""
        if self.mesh is None:
            return arr
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(arr, NamedSharding(self.mesh, P(None, ("dp", "tp"))))

    def _section_ft_transposed(self, ft_sketch):
        """[d_p, cap] device transpose of the BM25 sketches for the 3-way
        section program; same lifecycle as `_section_transposed`."""
        if self._section_ft_t is None:
            import jax.numpy as jnp

            self._section_ft_t = self._place_cols(jnp.swapaxes(ft_sketch, 0, 1))
        return self._section_ft_t

    @property
    def size(self) -> int:
        """Number of rows ever inserted (including tombstones/pending)."""
        return len(self._ids) + len(self._pending)

    def count(self) -> int:
        """Number of live records."""
        live = int(self._valid.sum()) if self._valid.size else 0
        return live + len(self._pending)

    # -- ingest ----------------------------------------------------------------

    def add_vectors(self, records: list[dict[str, Any]]) -> None:
        """Queue records for insertion.

        Record keys: ``id`` (str), ``text``, ``enhanced_text``, ``metadata``
        (dict), ``dense`` (array [d] or None), ``sparse`` (dict token→weight
        or None). Full-text stats are derived from ``text`` automatically
        when enabled.
        """
        # Validate the WHOLE batch before queueing any of it: a mid-loop
        # raise would leave earlier records in _pending, silently half-
        # ingesting a batch the caller believes was rejected. Checks cover
        # flushed rows, the unflushed pending buffer, and in-batch dups.
        seen: set[str] = set()
        for rec in records:
            rid = rec["id"]
            if rid in self._row_of or rid in self._pending_ids or rid in seen:
                raise ValueError(f"Duplicate id: {rid}")
            seen.add(rid)
        for rec in records:
            self._pending.append(rec)
            self._pending_ids.add(rec["id"])

    def flush(self) -> None:
        """Materialize pending records into the device arrays."""
        if not self._pending:
            if self.enable_full_text and self._bm25_stale:
                self._recompute_bm25()
            return
        import jax.numpy as jnp

        pending, self._pending = self._pending, []
        self._pending_ids.clear()
        n_new = len(pending)
        offset = len(self._ids)

        dense_new = (
            np.zeros((n_new, self.dense_dim), np.float32) if self.dense_dim else None
        )
        sp_ids_new = (
            np.zeros((n_new, self.sparse_max_nnz), np.int32) if self.sparse_vocab else None
        )
        sp_w_new = (
            np.zeros((n_new, self.sparse_max_nnz), np.float32) if self.sparse_vocab else None
        )
        ft_ids_new = (
            np.zeros((n_new, self.full_text_max_nnz), np.int32)
            if self.enable_full_text
            else None
        )
        ft_tf_new = (
            np.zeros((n_new, self.full_text_max_nnz), np.int32)
            if self.enable_full_text
            else None
        )
        dl_new = np.zeros(n_new, np.float32)

        for i, rec in enumerate(pending):
            self._ids.append(rec["id"])
            self._row_of[rec["id"]] = offset + i
            self._texts.append(rec.get("text", ""))
            self._enhanced.append(rec.get("enhanced_text", ""))
            meta = rec.get("metadata", {}) or {}
            self._metadata.append(meta)

            if dense_new is not None and rec.get("dense") is not None:
                vec = np.asarray(rec["dense"], np.float32)
                norm = np.linalg.norm(vec)
                dense_new[i] = vec / norm if norm > 0 else vec
            if sp_ids_new is not None and rec.get("sparse_arrays") is not None:
                row_ids, row_w = rec["sparse_arrays"]
                if len(row_ids) > self.sparse_max_nnz:
                    # Keep the heaviest terms regardless of provider row
                    # order (same policy as _pad_sparse on dicts) — do not
                    # assume embed_batch_arrays emits descending weights.
                    top = np.argpartition(-np.abs(row_w), self.sparse_max_nnz - 1)[
                        : self.sparse_max_nnz
                    ]
                    row_ids, row_w = row_ids[top], row_w[top]
                m = len(row_ids)
                sp_ids_new[i, :m] = row_ids
                sp_w_new[i, :m] = row_w
            elif sp_ids_new is not None and rec.get("sparse") is not None:
                sp_ids_new[i], sp_w_new[i] = _pad_sparse(rec["sparse"], self.sparse_max_nnz)
            if self.enable_full_text:
                terms, tfs, dl = _analyze(rec.get("text", ""), self.full_text_vocab)
                keep = min(len(terms), self.full_text_max_nnz)
                if len(terms) > self.full_text_max_nnz:
                    top = np.argsort(-tfs)[: self.full_text_max_nnz]
                    terms, tfs = terms[top], tfs[top]
                    keep = self.full_text_max_nnz
                ft_ids_new[i, :keep] = terms[:keep]
                ft_tf_new[i, :keep] = tfs[:keep]
                dl_new[i] = dl
                self._doc_freq[terms] += 1

        # Host columnar state.
        self._valid = np.concatenate([self._valid, np.ones(n_new, bool)])
        for f in PROMOTED_FIELDS:
            col = np.fromiter(
                (
                    stable_hash64(m.get(f)) if m.get(f) is not None else np.int64(0)
                    for m in self._metadata[offset:]
                ),
                dtype=np.int64,
                count=n_new,
            )
            self._promoted[f] = np.concatenate([self._promoted[f], col])
        self._doc_len = np.concatenate([self._doc_len, dl_new])

        # Device arrays: geometric capacity + fixed-shape dynamic writes.
        #
        # Round-1 design concatenated on device per flush — a FRESH XLA
        # compile for every new capacity shape, which dominated e2e ingest
        # (15.9 s of a 32.7 s profile was backend_compile). Now capacity
        # doubles (O(log N) allocation shapes), new rows are padded to a
        # fixed row-chunk and written with `dynamic_update_slice` whose
        # offset is a traced scalar — so steady-state flushes reuse cached
        # executables and dispatch without compiling.
        n_total = len(self._ids)
        pad_unit = min(_FLUSH_PAD, self.block)
        pad_rows = -(-n_new // pad_unit) * pad_unit
        new_cap = self._target_capacity(offset + pad_rows, first_flush=offset == 0)

        def _grow(old, new_host, width, dtype):
            arr = self._grow_capacity(old, new_cap, width, dtype)
            buf = np.zeros((pad_rows, width), new_host.dtype)
            buf[:n_new] = new_host
            arr = _write_rows()(arr, jnp.asarray(buf, dtype=dtype), offset)
            return self._place(arr)

        dtype_dense = self._sketch_dtype  # jnp.int8 when sketch_dtype="int8"

        def _grow_sketch(arr, scale_arr, proj_new):
            """Grow a sketch matrix (+ its scale column in quantized modes)."""
            if self._sketch_quantized:
                from verbatim_rag_tpu.ops.dense import (
                    quantize_rows_int4,
                    quantize_rows_int8,
                )

                if self.sketch_dtype == "int4":
                    pq, pscale = quantize_rows_int4(proj_new)
                else:
                    pq, pscale = quantize_rows_int8(proj_new)
                return (
                    _grow(arr, pq, self._sketch_width, jnp.int8),
                    _grow(scale_arr, pscale, 1, jnp.float32),
                )
            return _grow(arr, proj_new, self.projection_dim, dtype_dense), scale_arr
        if dense_new is not None:
            if self._dense_quantized:
                from verbatim_rag_tpu.ops.dense import (
                    quantize_rows_int4,
                    quantize_rows_int8,
                )

                if self.dense_dtype == "int4":
                    q_new, scale_new = quantize_rows_int4(dense_new)
                else:
                    q_new, scale_new = quantize_rows_int8(dense_new)
                self._dense = _grow(self._dense, q_new, self._dense_width, jnp.int8)
                self._dense_scale = _grow(self._dense_scale, scale_new, 1, jnp.float32)
            else:
                self._dense = _grow(
                    self._dense, dense_new, self.dense_dim, self._dense_store_dtype
                )
        if sp_ids_new is not None:
            self._sp_ids = _grow(
                self._sp_ids, sp_ids_new, self.sparse_max_nnz, self._sp_ids_dtype
            )
            self._sp_w = _grow(self._sp_w, sp_w_new, self.sparse_max_nnz, self._sp_w_dtype)
            if self.sparse_mode == "projected":
                from verbatim_rag_tpu.ops.sparse_projected import project_rows

                proj_new = project_rows(
                    sp_ids_new, sp_w_new, self._projection(self.sparse_vocab)
                )
                self._sp_proj, self._sp_proj_scale = _grow_sketch(
                    self._sp_proj, self._sp_proj_scale, proj_new
                )
        if self.enable_full_text:
            self._ft_ids = _grow(self._ft_ids, ft_ids_new, self.full_text_max_nnz, jnp.int32)
            self._ft_tf = _grow(self._ft_tf, ft_tf_new, self.full_text_max_nnz, jnp.int32)
            self._recompute_bm25()
            if self.sparse_mode == "projected":
                from verbatim_rag_tpu.ops.sparse_projected import project_rows

                # Sketch new rows with current-avgdl saturation; older sketches
                # go slightly stale as avgdl drifts, which only nudges
                # candidate generation — exact rescoring uses fresh weights.
                # (Computed locally: a full host mirror of the saturated
                # matrix cost an O(N) device readback per flush.)
                n = len(self._ids)
                avgdl = max(float(self._doc_len[:n].mean()) if n else 1.0, 1.0)
                tf_new = ft_tf_new.astype(np.float32)
                norm = self.bm25_k1 * (
                    1.0 - self.bm25_b + self.bm25_b * dl_new[:, None] / avgdl
                )
                sat_new = np.where(
                    tf_new > 0, tf_new * (self.bm25_k1 + 1.0) / (tf_new + norm), 0.0
                ).astype(np.float32)
                proj_new = project_rows(
                    ft_ids_new, sat_new, self._projection(self.full_text_vocab)
                )
                self._ft_proj, self._ft_proj_scale = _grow_sketch(
                    self._ft_proj, self._ft_proj_scale, proj_new
                )

        valid_padded = np.zeros(new_cap, bool)
        valid_padded[: self._valid.size] = self._valid
        self._valid_dev = self._place(jnp.asarray(valid_padded))
        self._capacity = new_cap
        self._section_t = self._section_ft_t = None  # backing arrays changed

    def _place(self, arr):
        """Row-shard an index array over the mesh (no-op without one)."""
        if self.mesh is None:
            return arr
        import jax

        from verbatim_rag_tpu.parallel.mesh import row_sharding

        return jax.device_put(arr, row_sharding(self.mesh))

    def _target_capacity(self, needed: int, first_flush: bool = False) -> int:
        """Next capacity: doubles from `block` so allocation shapes are
        O(log N) distinct (each shape's programs compile once, then cache).

        The FIRST flush of an empty store sizes tightly (next block
        multiple): `load()`, one-shot bulk ingests and `compact()` all
        materialize in one flush, and doubling there would permanently tax
        every query with up to 2x dead rows."""
        if first_flush:
            # Never below an explicit reserve()'s capacity.
            return max(-(-needed // self.block) * self.block, self.block, self._capacity)
        cap = max(self._capacity, self.block)
        while cap < needed:
            cap *= 2
        return cap

    @staticmethod
    def _grow_capacity(old, cap: int, width: int, dtype):
        """Allocate [cap, width] and copy the old rows into the prefix."""
        import jax.numpy as jnp

        if old is not None and old.shape[0] >= cap:
            return old
        fresh = jnp.zeros((cap, width), dtype)
        if old is None:
            return fresh
        return _write_rows()(fresh, old, 0)

    @property
    def _bm25_stale(self) -> bool:
        return self._ft_w is None and self._ft_tf is not None

    def _recompute_bm25(self) -> None:
        """Refresh document-side BM25 saturation (avgdl moved)."""
        from verbatim_rag_tpu.ops.sparse import bm25_saturate
        import jax.numpy as jnp

        n = len(self._ids)
        avgdl = max(float(self._doc_len[:n].mean()) if n else 1.0, 1.0)
        cap = int(self._ft_tf.shape[0])
        dl_padded = np.zeros(cap, np.float32)
        dl_padded[:n] = self._doc_len[:n]
        self._ft_w = self._place(
            bm25_saturate(
                self._ft_tf, jnp.asarray(dl_padded), jnp.float32(avgdl),
                k1=self.bm25_k1, b=self.bm25_b,
            )
        )

    # -- projections ---------------------------------------------------------------

    _projection_cache: dict = {}

    def _projection(self, vocab: int) -> np.ndarray:
        key = (vocab, self.projection_dim, self.projection_seed)
        if key not in DeviceVectorStore._projection_cache:
            from verbatim_rag_tpu.ops.sparse_projected import projection_matrix

            DeviceVectorStore._projection_cache[key] = projection_matrix(
                vocab, self.projection_dim, self.projection_seed
            )
        return DeviceVectorStore._projection_cache[key]

    _projection_dev_cache: dict = {}

    def _projection_dev(self, vocab: int):
        """Device copy of the projection matrix (for on-device query
        sketching in the handoff path). ~90 MB HBM at [30522, 768] — shared
        process-wide per (vocab, d_p, seed), like the host cache above."""
        key = (vocab, self.projection_dim, self.projection_seed)
        if key not in DeviceVectorStore._projection_dev_cache:
            import jax.numpy as jnp

            DeviceVectorStore._projection_dev_cache[key] = jnp.asarray(
                self._projection(vocab)
            )
        return DeviceVectorStore._projection_dev_cache[key]

    # -- deletes -----------------------------------------------------------------

    def delete(self, ids: list[str]) -> None:
        self.flush()
        import jax.numpy as jnp

        rows = [self._row_of[i] for i in ids if i in self._row_of]
        if not rows:
            return
        if self.enable_full_text and self._doc_freq is not None:
            # Keep BM25 corpus stats honest under tombstones: re-derive each
            # deleted row's terms from its host-side text (same analyzer +
            # same truncation policy as ingest, so the decrement mirrors the
            # increment exactly) and drop them from the document frequencies.
            # Without this, idf drifts after deletes until a compact().
            for r in rows:
                if not self._valid[r]:
                    continue  # already tombstoned; don't double-decrement
                terms, tfs, _dl = _analyze(self._texts[r], self.full_text_vocab)
                if len(terms) > self.full_text_max_nnz:
                    top = np.argsort(-tfs)[: self.full_text_max_nnz]
                    terms = terms[top]
                self._doc_freq[terms] -= 1
        self._valid[rows] = False
        if self._valid_dev is not None:
            self._valid_dev = self._place(
                self._valid_dev.at[jnp.asarray(rows)].set(False)
            )
        if self.auto_compact_threshold is not None:
            n = len(self._ids)
            dead = n - int(self._valid[:n].sum())
            if n and dead / n >= self.auto_compact_threshold:
                reclaimed = self.compact()
                logger.info("auto-compacted %d tombstoned rows", reclaimed)

    def delete_document(self, document_id: str) -> None:
        self.flush()
        rows = [
            i
            for i, m in enumerate(self._metadata)
            if m.get("document_id") == document_id and self._valid[i]
        ]
        self.delete([self._ids[r] for r in rows])

    def reserve(self, n_rows: int) -> None:
        """Pre-size device capacity for a known corpus size: one allocation
        instead of log2(n) growth copies during a large ingest."""
        if n_rows <= self._capacity:
            return
        self.flush()
        cap = max(-(-n_rows // self.block) * self.block, self.block)
        import jax.numpy as jnp

        dtype_dense = self._sketch_dtype
        if self.dense_dim:
            self._dense = self._place(
                self._grow_capacity(
                    self._dense, cap, self._dense_width, self._dense_store_dtype
                )
            )
            if self._dense_quantized:
                self._dense_scale = self._place(
                    self._grow_capacity(self._dense_scale, cap, 1, jnp.float32)
                )
        if self.sparse_vocab:
            self._sp_ids = self._place(
                self._grow_capacity(
                    self._sp_ids, cap, self.sparse_max_nnz, self._sp_ids_dtype
                )
            )
            self._sp_w = self._place(
                self._grow_capacity(self._sp_w, cap, self.sparse_max_nnz, self._sp_w_dtype)
            )
            if self.sparse_mode == "projected":
                self._sp_proj = self._place(
                    self._grow_capacity(self._sp_proj, cap, self._sketch_width, dtype_dense)
                )
                if self._sketch_quantized:
                    self._sp_proj_scale = self._place(
                        self._grow_capacity(self._sp_proj_scale, cap, 1, jnp.float32)
                    )
        if self.enable_full_text:
            self._ft_ids = self._place(
                self._grow_capacity(self._ft_ids, cap, self.full_text_max_nnz, jnp.int32)
            )
            self._ft_tf = self._place(
                self._grow_capacity(self._ft_tf, cap, self.full_text_max_nnz, jnp.int32)
            )
            if self.sparse_mode == "projected":
                self._ft_proj = self._place(
                    self._grow_capacity(self._ft_proj, cap, self._sketch_width, dtype_dense)
                )
                if self._sketch_quantized:
                    self._ft_proj_scale = self._place(
                        self._grow_capacity(self._ft_proj_scale, cap, 1, jnp.float32)
                    )
            self._ft_w = None  # recomputed lazily at the right capacity
        valid_padded = np.zeros(cap, bool)
        valid_padded[: self._valid.size] = self._valid
        self._valid_dev = self._place(jnp.asarray(valid_padded))
        self._capacity = cap
        self._section_t = self._section_ft_t = None  # backing arrays changed

    def compact(self, min_dead_fraction: float = 0.0) -> int:
        """Reclaim tombstoned rows by rebuilding the arrays densely.

        Milvus hides this housekeeping inside the service (SURVEY.md §7 hard
        parts: "incremental updates/deletes ... need tombstones + compaction");
        here it is an explicit O(N) rebuild, worth running when the dead
        fraction is large. Returns the number of rows reclaimed.
        """
        self.flush()
        n = len(self._ids)
        dead = n - int(self._valid[:n].sum())
        if n == 0 or dead == 0 or dead / n < min_dead_fraction:
            return 0

        keep = np.flatnonzero(self._valid[:n])
        # One O(N) readback per array for the rebuild (per-row device slices
        # would be one round-trip each).
        sp_ids_np = np.asarray(self._sp_ids[:n]) if self._sp_ids is not None else None
        sp_w_np = np.asarray(self._sp_w[:n]) if self._sp_ids is not None else None
        dense_np = self._dense_rows_f32(n) if self._dense is not None else None
        records = []
        for row in keep:
            rec: dict[str, Any] = {
                "id": self._ids[row],
                "text": self._texts[row],
                "enhanced_text": self._enhanced[row],
                "metadata": self._metadata[row],
            }
            if dense_np is not None:
                rec["dense"] = dense_np[row]
            if sp_ids_np is not None:
                rec["sparse"] = {
                    int(t): float(w)
                    for t, w in zip(sp_ids_np[row], sp_w_np[row])
                    if w != 0.0
                }
            records.append(rec)

        fresh = DeviceVectorStore(
            dense_dim=self.dense_dim,
            sparse_vocab=self.sparse_vocab,
            sparse_max_nnz=self.sparse_max_nnz,
            enable_full_text=self.enable_full_text,
            full_text_vocab=self.full_text_vocab,
            full_text_max_nnz=self.full_text_max_nnz,
            dense_dtype=self.dense_dtype,
            sketch_dtype=self.sketch_dtype,
            block=self.block,
            bm25_k1=self.bm25_k1,
            bm25_b=self.bm25_b,
            sparse_mode=self.sparse_mode,
            projection_dim=self.projection_dim,
            rescore_depth=self.rescore_depth,
            projection_seed=self.projection_seed,
            mesh=self.mesh,
            approx_topk=self.approx_topk,
            auto_compact_threshold=self.auto_compact_threshold,
            allow_exact_at_scale=self.allow_exact_at_scale,
            rescore_impl=self.rescore_impl,
            candidate_impl=self.candidate_impl_requested,
            sparse_weight_dtype=self.sparse_weight_dtype,
            sparse_ids_dtype=self.sparse_ids_dtype,
        )
        fresh.add_vectors(records)
        fresh.flush()
        self.__dict__.update(fresh.__dict__)
        return dead

    # -- query --------------------------------------------------------------------

    def query(
        self,
        dense_query: np.ndarray | None = None,
        sparse_query: Mapping[int, float] | None = None,
        text_query: str | None = None,
        top_k: int = 10,
        filter: FilterSpec = None,
        search_type: str | None = None,
        hybrid_weights: Mapping[str, float] | None = None,
        rrf_k: int = 60,
        search_params: Mapping[str, Any] | None = None,
    ) -> list[SearchResult]:
        """Single-query search. See `query_batch` for the batched fast path."""
        results = self.query_batch(
            dense_queries=None if dense_query is None else np.asarray(dense_query)[None, :],
            sparse_queries=None if sparse_query is None else [sparse_query],
            text_queries=None if text_query is None else [text_query],
            top_k=top_k,
            filter=filter,
            search_type=search_type,
            hybrid_weights=hybrid_weights,
            rrf_k=rrf_k,
            search_params=search_params,
        )
        return results[0]

    def query_batch(
        self,
        dense_queries=None,  # [B, d] np.ndarray or jax.Array (device handoff)
        sparse_queries=None,  # Sequence[Mapping[int, float]] or (ids, w) arrays
        text_queries: Sequence[str] | None = None,
        top_k: int = 10,
        filter: FilterSpec = None,
        search_type: str | None = None,
        hybrid_weights: Mapping[str, float] | None = None,
        rrf_k: int = 60,
        search_params: Mapping[str, Any] | None = None,
    ) -> list[list[SearchResult]]:
        """Batched search over any combination of methods.

        Dispatch (parity with `milvus_base.py:189-313`):
        - filter-only when no query vectors are given;
        - a single method runs alone;
        - multiple methods (or explicit ``hybrid_weights``) run per-method
          top_k*2 searches fused on device with weighted RRF.

        Device handoff: ``dense_queries`` may be a jax.Array and
        ``sparse_queries`` a ``(ids [B, m] int32, weights [B, m] f32)``
        array pair (np or jax, pad slots id 0 / weight 0) — the forms the
        JAX providers produce on device. The search then composes encode
        output straight into the fused query program with no host readback
        between encode and search.

        ``search_params`` (parity with the Milvus per-search knobs the
        reference forwards): ``rescore_depth`` — sketch candidates rescored
        exactly per query (recall↔speed); ``approx_topk`` — override the
        store's candidate k-selection strategy for this call.
        """
        self.flush()
        params = dict(search_params or {})
        depth_override = params.pop("rescore_depth", None)
        approx_override = params.pop("approx_topk", None)
        if params:
            logger.warning("Ignoring unknown search_params keys: %s", sorted(params))
        # Quantize the client-supplied depth to power-of-two buckets in
        # [64, 4096]: `depth` is jit-static, so each distinct value compiles
        # a fresh XLA executable — an unauthenticated client cycling values
        # must not be able to force unbounded compile churn.
        if depth_override:
            d = max(64, min(int(depth_override), 4096))
            depth_override = 1 << (d - 1).bit_length()
        else:
            depth_override = None
        exact_topk = not (
            self.approx_topk if approx_override is None else bool(approx_override)
        )
        n = len(self._ids)
        if n == 0:
            batch = self._batch_size(dense_queries, sparse_queries, text_queries)
            return [[] for _ in range(max(batch, 1))]

        mask = self._build_mask(filter)

        methods: dict[str, Any] = {}
        if dense_queries is not None and self._dense is not None:
            methods["dense"] = (
                dense_queries
                if _is_device_array(dense_queries)
                else np.asarray(dense_queries, np.float32)
            )
        if sparse_queries is not None and self._sp_ids is not None:
            methods["sparse"] = sparse_queries
        if text_queries is not None and self.enable_full_text:
            methods["full_text"] = text_queries

        if search_type in ("dense", "sparse", "full_text"):
            if search_type not in methods:
                raise ValueError(
                    f"search_type={search_type!r} requested but that method is "
                    f"unavailable here (available: {sorted(methods) or 'none'})"
                )
            methods = {search_type: methods[search_type]}

        if not methods:
            # Filter-only browse is only legitimate when the caller supplied
            # NO query payload. A query that can't be served (provider/index
            # mismatch, or an unknown search_type string) must raise — not
            # degrade into arbitrary rows presented as results with score 0.
            asked = [
                name
                for name, q in (
                    ("dense", dense_queries),
                    ("sparse", sparse_queries),
                    ("full_text", text_queries),
                )
                if q is not None
            ]
            if asked:
                raise ValueError(
                    f"Query supplied for {asked} but the store has no matching "
                    "index (dense requires dense vectors at ingest; sparse a "
                    "sparse index; full_text enable_full_text=True)"
                )
            if search_type not in (None, "filter"):
                raise ValueError(
                    f"Unknown or unavailable search_type {search_type!r} "
                    "(expected 'dense', 'sparse', 'full_text', or None)"
                )
            return self._filter_only(mask, top_k, dense_queries, sparse_queries, text_queries)

        if len(methods) == 1 and not hybrid_weights:
            name = next(iter(methods))
            scores, rows = self._run_method(
                name, methods[name], top_k, mask,
                exact_topk=exact_topk, depth_override=depth_override,
            )
            return self._materialize(scores, rows)

        # Hybrid: per-method candidates at 2x depth, weighted-RRF fused.
        from verbatim_rag_tpu.ops.fusion import normalize_weights, rrf_fuse_np

        weights = dict(hybrid_weights) if hybrid_weights else {m: 1.0 for m in methods}
        weights = normalize_weights({m: [] for m in methods}, weights)
        fetch_k = min(top_k * 2, n)

        if (
            set(methods) in ({"dense", "sparse"}, {"dense", "sparse", "full_text"})
            and self.sparse_mode == "projected"
            and self._dense is not None
            and self._sp_proj is not None
            and ("full_text" not in methods or self._ft_proj is not None)
        ):
            # Serving fast path: every candidate matmul in one device
            # program — 2-way, or 3-way when BM25 full text rides along
            # (the enable_full_text configuration keeps the single-sync
            # design instead of three dispatches + host fusion).
            scores, rows = self._hybrid_projected(
                methods["dense"], methods["sparse"], top_k, fetch_k, mask,
                weights, rrf_k, exact_topk=exact_topk, depth_override=depth_override,
                text_q=methods.get("full_text"),
            )
            return self._materialize(scores, rows)
        all_rows, w_list = [], []
        for name, payload in methods.items():
            scores, rows = self._run_method(
                name, payload, fetch_k, mask,
                exact_topk=exact_topk, depth_override=depth_override,
            )
            all_rows.append(np.where(scores > -1e29, rows, -1))
            w_list.append(weights.get(name, 0.0))

        fused_scores, fused_rows = rrf_fuse_np(
            np.stack(all_rows), np.asarray(w_list, np.float32),
            k=min(top_k, fetch_k), rrf_k=rrf_k,
        )
        return self._materialize(fused_scores, fused_rows)

    # -- internals -------------------------------------------------------------------

    @staticmethod
    def _batch_size(dense, sparse, text) -> int:
        if dense is not None:
            return len(dense)
        if sparse is not None:
            return len(sparse[0]) if _is_sparse_arrays(sparse) else len(sparse)
        if text is not None:
            return len(text)
        return 1

    @staticmethod
    def _sparse_payload_dicts(payload) -> list[dict[int, float]]:
        """Sparse query payload → list of {term: weight} dicts.

        The host-dict form is needed only off the projected serving path
        (exact-scan validation mode); an array payload pays one readback
        here — exactly what the legacy dict path paid up front."""
        if not _is_sparse_arrays(payload):
            return list(payload)
        ids, w = np.asarray(payload[0]), np.asarray(payload[1])
        return [
            {int(t): float(x) for t, x in zip(ids[i], w[i]) if x != 0.0}
            for i in range(len(ids))
        ]

    def _sparse_query_device(self, payload, vocab: int):
        """Sparse query payload → device ``(q_ids, q_w, q_proj)``.

        Array payloads (the device handoff) sketch on device via
        `project_query_arrays` — no host sync anywhere on the path. Dict
        payloads keep the legacy host sketch + pad, then upload."""
        import jax.numpy as jnp

        from verbatim_rag_tpu.ops.sparse_projected import (
            project_query_arrays,
            project_sparse_queries,
        )

        if _is_sparse_arrays(payload):
            q_ids = jnp.asarray(payload[0], jnp.int32)
            q_w = jnp.asarray(payload[1], jnp.float32)
            q_proj = project_query_arrays(q_ids, q_w, self._projection_dev(vocab))
            return q_ids, q_w, q_proj
        rows = list(payload)
        q_proj = jnp.asarray(project_sparse_queries(rows, self._projection(vocab)))
        q_ids, q_w = self._pad_sparse_queries(rows)
        return jnp.asarray(q_ids), jnp.asarray(q_w), q_proj

    def _build_mask(self, filter: FilterSpec):
        import jax.numpy as jnp

        if filter is None and self._valid_dev is not None:
            # Unfiltered serving path: the device validity mask is kept
            # current by flush/delete/reserve/compact, so reuse it — the
            # host rebuild below costs O(capacity) CPU work plus a [cap]
            # H2D upload per query, on a path that otherwise syncs once.
            return self._valid_dev
        n = len(self._ids)
        filter_mask = compile_filter(filter, n, self._promoted, self._metadata)
        host = np.zeros(self._capacity, bool)
        host[:n] = self._valid[:n]
        if filter_mask is not None:
            host[:n] &= filter_mask
        return self._place(jnp.asarray(host))

    def _run_method(
        self, name: str, payload, k: int, mask,
        exact_topk: bool = True, depth_override: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Run one retrieval method → host (scores [B,k], rows [B,k]; -1 pad)."""
        import jax.numpy as jnp

        from verbatim_rag_tpu.ops.dense import dense_topk, normalize_rows
        from verbatim_rag_tpu.ops.sparse import sparse_topk

        k = min(k, self._capacity)
        if name == "dense":
            q = normalize_rows(jnp.asarray(payload, jnp.float32))
            dense_c, dense_s = self._dense_scoring_args()
            if self.mesh is not None:
                from verbatim_rag_tpu.parallel.sharded_search import (
                    replicate,
                    sharded_dense_topk,
                )

                scores, rows = sharded_dense_topk(
                    dense_c, replicate(q, self.mesh), k, mask, self.mesh,
                    exact_topk=exact_topk, corpus_scale=dense_s,
                )
            else:
                scores, rows = dense_topk(
                    dense_c, q, k, mask,
                    exact_topk=exact_topk, corpus_scale=dense_s,
                )
            return np.asarray(scores), np.asarray(rows)

        if name == "sparse":
            if self.sparse_mode == "projected":
                return self._projected_search(
                    payload, self._sp_proj, self._sp_ids, self._sp_w,
                    self.sparse_vocab, k, mask,
                    exact_topk=exact_topk, depth_override=depth_override,
                    scale_dev=self._sp_proj_scale,
                )
            q_dense = self._densify_host(
                self._sparse_payload_dicts(payload), self.sparse_vocab
            )
            scores, rows = self._exact_sparse_topk(
                self._sp_ids, self._sp_w, jnp.asarray(q_dense), k, mask
            )
            return np.asarray(scores), np.asarray(rows)

        if name == "full_text":
            q_sparse = self._bm25_query_sparse(payload)
            if self.sparse_mode == "projected":
                return self._projected_search(
                    q_sparse, self._ft_proj, self._ft_ids, self._ft_w,
                    self.full_text_vocab, k, mask,
                    exact_topk=exact_topk, depth_override=depth_override,
                    scale_dev=self._ft_proj_scale,
                )
            q_dense = self._densify_host(q_sparse, self.full_text_vocab)
            scores, rows = self._exact_sparse_topk(
                self._ft_ids, self._ft_w, jnp.asarray(q_dense), k, mask
            )
            return np.asarray(scores), np.asarray(rows)
        raise ValueError(f"Unknown method {name!r}")

    #: Above this many rows the exact XLA-gather scan is a serving hazard
    #: (orders of magnitude slower than 'projected' on TPU); refuse instead
    #: of limping (VERDICT r2 weak #4 — a misconfigured store should fail
    #: loudly, not ship a footgun). Opt out with allow_exact_at_scale=True.
    EXACT_SCAN_MAX_ROWS = 200_000

    def _exact_sparse_topk(self, ids_dev, w_dev, q_dense, k: int, mask):
        """Exact forward-index scan, single-device or mesh-sharded."""
        from verbatim_rag_tpu.ops.sparse import sparse_topk

        n = len(self._ids)
        if n > self.EXACT_SCAN_MAX_ROWS and not self.allow_exact_at_scale:
            raise RuntimeError(
                f"Exact sparse scan over {n} rows refused: sparse_mode='exact' "
                "(or full-text without projected sketches) runs XLA vocab "
                "gathers that are orders of magnitude slower than "
                "sparse_mode='projected' at this scale. Use projected mode, "
                "or pass allow_exact_at_scale=True for validation runs."
            )

        if self.mesh is not None:
            from verbatim_rag_tpu.parallel.sharded_search import (
                replicate,
                sharded_sparse_topk,
            )

            return sharded_sparse_topk(
                ids_dev, w_dev, replicate(q_dense, self.mesh), k, mask,
                self.mesh, block=self.block,
            )
        return sparse_topk(ids_dev, w_dev, q_dense, k, mask, block=self.block)

    #: Query-nnz padding buckets — bounds jit recompiles to a handful of shapes.
    _QUERY_NNZ_BUCKETS = (16, 32, 64, 128, 256)

    @classmethod
    def _pad_sparse_queries(
        cls, sparse_rows: Sequence[Mapping[int, float]]
    ) -> tuple[np.ndarray, np.ndarray]:
        """Pad sparse query dicts to [B, qm] id/weight arrays (bucketed qm)."""
        max_nnz = max(
            (sum(1 for w in row.values() if w != 0.0) for row in sparse_rows),
            default=1,
        )
        max_nnz = max(max_nnz, 1)
        qm = next(
            (b for b in cls._QUERY_NNZ_BUCKETS if b >= max_nnz),
            -(-max_nnz // 256) * 256,
        )
        ids = np.zeros((len(sparse_rows), qm), np.int32)
        weights = np.zeros((len(sparse_rows), qm), np.float32)
        for i, row in enumerate(sparse_rows):
            ids[i], weights[i] = _pad_sparse(row, qm)
        return ids, weights

    def _hybrid_projected(
        self,
        dense_q,  # [B, d] np.ndarray or jax.Array
        sparse_q,  # list of term→weight dicts, or (ids, w) arrays
        top_k: int,
        fetch_k: int,
        mask,
        weights: Mapping[str, float],
        rrf_k: int,
        exact_topk: bool = True,
        depth_override: int | None = None,
        text_q: Sequence[str] | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """The hybrid serving fast path: candidate matmuls, exact sparse
        rescore, and weighted RRF all in ONE device program — a single sync
        per batch and no host-side fusion loop (`ops/hybrid.py`
        hybrid_fused_topk). With device-handoff inputs the whole
        encode→search chain has exactly one host sync: the final [B, k]
        readback. With ``text_q`` the BM25 full-text method joins as a
        third arm of the SAME program (hybrid_fused_topk_3way)."""
        import jax.numpy as jnp

        from verbatim_rag_tpu.ops.dense import normalize_rows
        from verbatim_rag_tpu.ops.hybrid import (
            hybrid_fused_topk,
            hybrid_fused_topk_3way,
        )

        depth = min(max(depth_override or self.rescore_depth, fetch_k), self._capacity)
        if _is_device_array(dense_q):
            q = normalize_rows(dense_q.astype(jnp.float32))
        else:
            q = np.asarray(dense_q, np.float32)
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        q_ids, q_w, q_proj = self._sparse_query_device(sparse_q, self.sparse_vocab)
        dense_c, dense_s = self._dense_scoring_args()
        sketch_c, sketch_s = self._sketch_scoring_args(
            self._sp_proj, self._sp_proj_scale
        )

        ft_args = None
        if text_q is not None:
            ft_qids, ft_qw, ft_qproj = self._sparse_query_device(
                self._bm25_query_sparse(text_q), self.full_text_vocab
            )
            ft_sketch, ft_scale = self._sketch_scoring_args(
                self._ft_proj, self._ft_proj_scale
            )
            ft_args = (ft_sketch, ft_qids, ft_qw, ft_qproj, ft_scale)

        if self.mesh is not None:
            from verbatim_rag_tpu.parallel.sharded_search import (
                replicate,
                sharded_hybrid_topk,
            )

            use_section = self.candidate_impl == "section" and self._section_serves(
                exact_topk
            )
            ft_arm = None
            if ft_args is not None:
                ft_sketch, ft_qids, ft_qw, ft_qproj, ft_scale = ft_args
                ft_arm = (
                    self._section_ft_transposed(ft_sketch) if use_section else ft_sketch,
                    self._ft_ids, self._ft_w,
                    replicate(ft_qproj, self.mesh),
                    replicate(ft_qids, self.mesh),
                    replicate(ft_qw, self.mesh),
                    float(weights.get("full_text", 0.5)),
                    ft_scale,
                )
            if use_section:
                # Per-shard section kernel (VERDICT r4 #6): each shard runs
                # the single-device Pallas program over its own transposed
                # blocks; the ICI merge is the same as sharded_hybrid_topk.
                import jax

                from verbatim_rag_tpu.parallel.sharded_search import (
                    sharded_hybrid_section_topk,
                )

                dense_t, sketch_t = self._section_transposed()
                per_shard = self._capacity // self.mesh.size
                interp = jax.devices()[0].platform not in ("tpu", "axon")
                scores, rows = sharded_hybrid_section_topk(
                    dense_t,
                    sketch_t,
                    self._sp_ids,
                    self._sp_w,
                    replicate(jnp.asarray(q), self.mesh),
                    replicate(q_proj, self.mesh),
                    replicate(q_ids, self.mesh),
                    replicate(q_w, self.mesh),
                    k=min(top_k, fetch_k),
                    fetch_k=fetch_k,
                    depth=depth,
                    mask=mask,
                    mesh=self.mesh,
                    dense_weight=float(weights.get("dense", 0.5)),
                    sparse_weight=float(weights.get("sparse", 0.5)),
                    rrf_k=rrf_k,
                    dense_scale=dense_s,
                    sketch_scale=sketch_s,
                    rescore_impl=self.rescore_impl,
                    # exact-selection queries fall back above, so the
                    # table-select layer stays on the measured approx winner.
                    table_select="approx",
                    ft_arm=ft_arm,
                    block_cols=16384 if per_shard % 16384 == 0 else 8192,
                    interpret=interp,
                )
            else:
                scores, rows = sharded_hybrid_topk(
                    dense_c,
                    sketch_c,
                    self._sp_ids,
                    self._sp_w,
                    replicate(jnp.asarray(q), self.mesh),
                    replicate(q_proj, self.mesh),
                    replicate(q_ids, self.mesh),
                    replicate(q_w, self.mesh),
                    k=min(top_k, fetch_k),
                    fetch_k=fetch_k,
                    depth=depth,
                    mask=mask,
                    mesh=self.mesh,
                    dense_weight=float(weights.get("dense", 0.5)),
                    sparse_weight=float(weights.get("sparse", 0.5)),
                    rrf_k=rrf_k,
                    exact_topk=exact_topk,
                    dense_scale=dense_s,
                    sketch_scale=sketch_s,
                    rescore_impl=self.rescore_impl,
                    candidate_impl=self._per_stage_candidate_impl,
                    ft_arm=ft_arm,
                )
        elif (
            ft_args is not None
            and self.candidate_impl == "section"
            and self._section_serves(exact_topk)
        ):
            import jax

            from verbatim_rag_tpu.ops.section import hybrid_section_topk_3way

            ft_sketch, ft_qids, ft_qw, ft_qproj, ft_scale = ft_args
            dense_t, sketch_t = self._section_transposed()
            interp = jax.devices()[0].platform not in ("tpu", "axon")
            scores, rows = hybrid_section_topk_3way(
                dense_t,
                sketch_t,
                self._sp_ids,
                self._sp_w,
                self._section_ft_transposed(ft_sketch),
                self._ft_ids,
                self._ft_w,
                jnp.asarray(q),
                q_proj,
                q_ids,
                q_w,
                ft_qproj,
                ft_qids,
                ft_qw,
                k=min(top_k, fetch_k),
                fetch_k=fetch_k,
                depth=depth,
                mask=mask,
                dense_weight=float(weights.get("dense", 1 / 3)),
                sparse_weight=float(weights.get("sparse", 1 / 3)),
                ft_weight=float(weights.get("full_text", 1 / 3)),
                rrf_k=rrf_k,
                dense_scale=dense_s,
                sketch_scale=sketch_s,
                ft_scale=ft_scale,
                rescore_impl=self.rescore_impl,
                table_select="approx",
                block_cols=16384 if self._capacity % 16384 == 0 else 8192,
                interpret=interp,
            )
        elif ft_args is not None:
            ft_sketch, ft_qids, ft_qw, ft_qproj, ft_scale = ft_args
            scores, rows = hybrid_fused_topk_3way(
                dense_c,
                sketch_c,
                self._sp_ids,
                self._sp_w,
                ft_sketch,
                self._ft_ids,
                self._ft_w,
                jnp.asarray(q),
                q_proj,
                q_ids,
                q_w,
                ft_qproj,
                ft_qids,
                ft_qw,
                k=min(top_k, fetch_k),
                fetch_k=fetch_k,
                depth=depth,
                mask=mask,
                dense_weight=float(weights.get("dense", 1 / 3)),
                sparse_weight=float(weights.get("sparse", 1 / 3)),
                ft_weight=float(weights.get("full_text", 1 / 3)),
                rrf_k=rrf_k,
                exact_topk=exact_topk,
                dense_scale=dense_s,
                sketch_scale=sketch_s,
                ft_scale=ft_scale,
                rescore_impl=self.rescore_impl,
                candidate_impl=self._per_stage_candidate_impl,
            )
        elif self.candidate_impl == "section" and self._section_serves(exact_topk):
            import jax

            from verbatim_rag_tpu.ops.section import hybrid_section_topk

            dense_t, sketch_t = self._section_transposed()
            interp = jax.devices()[0].platform not in ("tpu", "axon")
            scores, rows = hybrid_section_topk(
                dense_t,
                sketch_t,
                self._sp_ids,
                self._sp_w,
                jnp.asarray(q),
                q_proj,
                q_ids,
                q_w,
                k=min(top_k, fetch_k),
                fetch_k=fetch_k,
                depth=depth,
                mask=mask,
                dense_weight=float(weights.get("dense", 0.5)),
                sparse_weight=float(weights.get("sparse", 0.5)),
                rrf_k=rrf_k,
                dense_scale=dense_s,
                sketch_scale=sketch_s,
                rescore_impl=self.rescore_impl,
                # exact-selection queries never reach here (_section_serves
                # falls back to the XLA program), so the table-select layer
                # stays on the measured approx winner.
                table_select="approx",
                block_cols=16384 if self._capacity % 16384 == 0 else 8192,
                interpret=interp,
            )
        else:
            scores, rows = hybrid_fused_topk(
                dense_c,
                sketch_c,
                self._sp_ids,
                self._sp_w,
                jnp.asarray(q),
                q_proj,
                q_ids,
                q_w,
                k=min(top_k, fetch_k),
                fetch_k=fetch_k,
                depth=depth,
                mask=mask,
                dense_weight=float(weights.get("dense", 0.5)),
                sparse_weight=float(weights.get("sparse", 0.5)),
                rrf_k=rrf_k,
                exact_topk=exact_topk,
                dense_scale=dense_s,
                sketch_scale=sketch_s,
                rescore_impl=self.rescore_impl,
                candidate_impl=self._per_stage_candidate_impl,
            )
        return np.asarray(scores), np.asarray(rows)

    def _section_serves(self, exact_topk: bool = False) -> bool:
        """Whether the section kernel can serve this query/backend.

        Geometry: the kernel grids the corpus in block_cols-column steps,
        so capacity must be a multiple of 8192 (the default allocation
        block guarantees it; tiny custom-block stores fall back). Backend:
        off-TPU the Pallas program would need interpret mode (debug-only
        speed) — fall back to the XLA hybrid program, like the rescore
        dispatch does (ops/rescore.exact_rescore_dispatch). Exactness: a
        query requesting exact selection (approx_topk=False) falls back
        too — the kernel's bucket table keeps one winner per bucket, so
        rows the exact `lax.top_k` path would return can be dropped no
        matter how the table is then selected over. Tests force interpret
        via VERBATIM_SECTION_INTERPRET=1."""
        import os

        import jax

        reason = None
        shards = self.mesh.size if self.mesh is not None else 1
        if exact_topk:
            reason = (
                "exact selection requested (approx_topk=False) — the "
                "kernel's bucket table is approximate by construction"
            )
        elif self._capacity % (shards * 8192) != 0:
            reason = (
                f"capacity {self._capacity} does not tile the section "
                f"kernel's 8192-column grid over {shards} shard(s) "
                "(custom block size?)"
            )
        elif (
            os.environ.get("VERBATIM_SECTION_INTERPRET") != "1"
            and jax.devices()[0].platform not in ("tpu", "axon")
        ):
            reason = "no TPU backend"
        if reason is None:
            return True
        if reason not in self._warned_section_fallback:
            logger.warning(
                "candidate_impl='section' cannot serve this query (%s); "
                "using the XLA hybrid program instead",
                reason,
            )
            self._warned_section_fallback.add(reason)
        return False

    def _bm25_query_sparse(self, texts: Sequence[str]) -> list[dict[int, float]]:
        """BM25 query side: {term: idf(term)} per text."""
        # N = live documents only — tombstoned rows are excluded from both
        # df (decremented in delete()) and N, so idf matches a compacted
        # store bit-for-bit in df and to rounding in N.
        n_rows = len(self._ids)
        n = max(int(self._valid[:n_rows].sum()), 1)
        df = np.maximum(self._doc_freq.astype(np.float64), 0.0)
        idf = np.log1p((n - df + 0.5) / (df + 0.5)).astype(np.float32)
        out = []
        for text in texts:
            terms, _tfs, _dl = _analyze(text, self.full_text_vocab)
            out.append({int(t): float(idf[t]) for t in terms})
        return out

    def _projected_search(
        self,
        q_sparse,  # list of term→weight dicts, or (ids, w) arrays
        proj_corpus,  # device [cap, d_p]
        ids_dev,  # device [cap, m] forward-index term ids
        weights_dev,  # device [cap, m] term weights
        vocab: int,
        k: int,
        mask,
        exact_topk: bool = True,
        depth_override: int | None = None,
        scale_dev=None,  # [cap, 1] f32 — int8 sketches only
    ) -> tuple[np.ndarray, np.ndarray]:
        """Two-phase sparse search entirely on device: MXU sketch-matmul
        candidates + exact forward-index rescore + final top-k in one program
        (see `ops/hybrid.py` projected_sparse_topk)."""
        from verbatim_rag_tpu.ops.hybrid import projected_sparse_topk

        depth = min(max(depth_override or self.rescore_depth, 2 * k), self._capacity)
        q_ids, q_w, q_proj = self._sparse_query_device(q_sparse, vocab)
        proj_corpus, scale_dev = self._sketch_scoring_args(proj_corpus, scale_dev)
        if self.mesh is not None:
            from verbatim_rag_tpu.parallel.sharded_search import (
                replicate,
                sharded_projected_sparse_topk,
            )

            top_scores, top_rows = sharded_projected_sparse_topk(
                proj_corpus,
                ids_dev,
                weights_dev,
                replicate(q_proj, self.mesh),
                replicate(q_ids, self.mesh),
                replicate(q_w, self.mesh),
                min(k, self._capacity),
                depth,
                mask,
                self.mesh,
                exact_topk=exact_topk,
                sketch_scale=scale_dev,
                rescore_impl=self.rescore_impl,
                candidate_impl=self._per_stage_candidate_impl,
            )
        else:
            top_scores, top_rows = projected_sparse_topk(
                proj_corpus,
                ids_dev,
                weights_dev,
                q_proj,
                q_ids,
                q_w,
                min(k, self._capacity),
                depth,
                mask,
                exact_topk=exact_topk,
                sketch_scale=scale_dev,
                rescore_impl=self.rescore_impl,
                candidate_impl=self._per_stage_candidate_impl,
            )
        return np.asarray(top_scores), np.asarray(top_rows)

    @staticmethod
    def _densify_host(sparse_rows: Sequence[Mapping[int, float]], vocab: int) -> np.ndarray:
        q = np.zeros((len(sparse_rows), vocab), np.float32)
        for i, row in enumerate(sparse_rows):
            for t, w in row.items():
                t = int(t)
                if 0 <= t < vocab:
                    q[i, t] += float(w)
        return q

    def _filter_only(self, mask, top_k, *query_args) -> list[list[SearchResult]]:
        batch = self._batch_size(*query_args)
        rows = np.flatnonzero(np.asarray(mask)[: len(self._ids)])[:top_k]
        hits = [self._result_for(int(r), 0.0) for r in rows]
        return [list(hits) for _ in range(max(batch, 1))]

    def _materialize(self, scores, rows) -> list[list[SearchResult]]:
        scores = np.asarray(scores)
        rows = np.asarray(rows)
        out: list[list[SearchResult]] = []
        n = len(self._ids)
        for b in range(rows.shape[0]):
            hits = []
            for score, row in zip(scores[b], rows[b]):
                if row < 0 or row >= n or score <= -1e29:
                    continue
                hits.append(self._result_for(int(row), float(score)))
            out.append(hits)
        return out

    def _result_for(self, row: int, score: float) -> SearchResult:
        return SearchResult(
            id=self._ids[row],
            score=score,
            text=self._texts[row],
            enhanced_text=self._enhanced[row],
            metadata=self._metadata[row],
        )

    # -- browsing -----------------------------------------------------------------

    def get(self, record_id: str) -> SearchResult | None:
        self.flush()
        row = self._row_of.get(record_id)
        if row is None or not self._valid[row]:
            return None
        return self._result_for(row, 0.0)

    def get_by_filter(self, filter: FilterSpec, limit: int = 100) -> list[SearchResult]:
        self.flush()
        n = len(self._ids)
        mask = compile_filter(filter, n, self._promoted, self._metadata)
        keep = self._valid[:n] if mask is None else (self._valid[:n] & mask)
        rows = np.flatnonzero(keep)[:limit]
        return [self._result_for(int(r), 0.0) for r in rows]

    # -- persistence ---------------------------------------------------------------

    def save(self, path: str) -> None:
        """Persist to ``<path>.npz`` + ``<path>.json`` (Milvus Lite file parity)."""
        self.flush()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        n = len(self._ids)
        arrays: dict[str, np.ndarray] = {"valid": self._valid[:n]}
        if self._dense is not None:
            arrays["dense"] = self._dense_rows_f32(n)
            if self._dense_quantized:
                # Persist the codes + scales verbatim so save→load cycles are
                # round-trip stable (re-quantizing the dequantized f32 rows
                # would drift codes and scores slightly on every cycle).
                key = "dense_i4" if self.dense_dtype == "int4" else "dense_i8"
                arrays[key] = np.asarray(self._dense[:n], np.int8)
                arrays["dense_scale"] = np.asarray(self._dense_scale[:n], np.float32)
        if self._sp_ids is not None:
            arrays["sp_ids"] = np.asarray(self._sp_ids[:n])
            arrays["sp_w"] = np.asarray(self._sp_w[:n])
        if self.enable_full_text and self._ft_ids is not None:
            # (guarded like dense/sparse: an empty never-flushed store has
            # no full-text arrays yet)
            arrays["ft_ids"] = np.asarray(self._ft_ids[:n])
            arrays["ft_tf"] = np.asarray(self._ft_tf[:n])
            arrays["doc_len"] = self._doc_len[:n]
            arrays["doc_freq"] = self._doc_freq
        np.savez_compressed(path + ".npz", **arrays)

        with open(path + ".json", "w") as f:
            json.dump(
                {
                    "config": {
                        "dense_dim": self.dense_dim,
                        "sparse_vocab": self.sparse_vocab,
                        "sparse_max_nnz": self.sparse_max_nnz,
                        "enable_full_text": self.enable_full_text,
                        "full_text_vocab": self.full_text_vocab,
                        "full_text_max_nnz": self.full_text_max_nnz,
                        "dense_dtype": self.dense_dtype,
                        "sketch_dtype": self.sketch_dtype,
                        "block": self.block,
                        "sparse_mode": self.sparse_mode,
                        "projection_dim": self.projection_dim,
                        "rescore_depth": self.rescore_depth,
                        "projection_seed": self.projection_seed,
                        "approx_topk": self.approx_topk,
                        "auto_compact_threshold": self.auto_compact_threshold,
                        "allow_exact_at_scale": self.allow_exact_at_scale,
                        "rescore_impl": self.rescore_impl,
                        "candidate_impl": self.candidate_impl_requested,
                        "sparse_weight_dtype": self.sparse_weight_dtype,
                        "sparse_ids_dtype": self.sparse_ids_dtype,
                    },
                    "ids": self._ids,
                    "texts": self._texts,
                    "enhanced": self._enhanced,
                    "metadata": self._metadata,
                },
                f,
                default=json_safe,
            )

    @classmethod
    def load(cls, path: str, mesh=None) -> "DeviceVectorStore":
        """Load a saved index; ``mesh`` re-shards it over devices at load time
        (placement is a runtime decision, never persisted)."""
        with open(path + ".json") as f:
            meta = json.load(f)
        store = cls(**meta["config"], mesh=mesh)
        arrays = np.load(path + ".npz", allow_pickle=False)
        records = []
        dense = arrays.get("dense")
        sp_ids, sp_w = arrays.get("sp_ids"), arrays.get("sp_w")
        for i, rid in enumerate(meta["ids"]):
            rec: dict[str, Any] = {
                "id": rid,
                "text": meta["texts"][i],
                "enhanced_text": meta["enhanced"][i],
                "metadata": meta["metadata"][i],
            }
            if dense is not None:
                rec["dense"] = dense[i]
            if sp_ids is not None:
                rec["sparse"] = {
                    int(t): float(w)
                    for t, w in zip(sp_ids[i], sp_w[i])
                    if w != 0.0
                }
            records.append(rec)
        store.add_vectors(records)
        store.flush()
        codes_key = {"int8": "dense_i8", "int4": "dense_i4"}.get(store.dense_dtype)
        if (
            codes_key is not None
            and codes_key in arrays
            and store._dense is not None
        ):
            # Restore the persisted codes verbatim (legacy files without the
            # codes fall back to the re-quantization the flush just did).
            import jax.numpy as jnp

            codes = jnp.asarray(arrays[codes_key], jnp.int8)
            scales = jnp.asarray(arrays["dense_scale"], jnp.float32)
            store._dense = store._place(_write_rows()(store._dense, codes, 0))
            store._dense_scale = store._place(
                _write_rows()(store._dense_scale, scales, 0)
            )
        dead = [rid for i, rid in enumerate(meta["ids"]) if not bool(arrays["valid"][i])]
        if dead:
            # Tombstone only: auto-compaction is suppressed during load so
            # the verbatim int8 codes restored above survive — compact()
            # rebuilds from dequantized f32 rows and re-quantizing would
            # reintroduce exactly the save/load drift the restoration
            # prevents. The policy re-applies on the next real mutation.
            threshold = store.auto_compact_threshold
            store.auto_compact_threshold = None
            try:
                store.delete(dead)
            finally:
                store.auto_compact_threshold = threshold
        return store

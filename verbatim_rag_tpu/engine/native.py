"""ctypes bindings for the C++ host runtime (`native/verbatim_host.cpp`).

Auto-builds the shared library on first use (g++ is in the image); every
entry point has a numpy fallback so the framework works without a compiler.
The native paths accelerate ingest (SpMM projection, BM25 analyzer) and the
query-time exact rescore — host work the reference delegated to Milvus's
C++ core (SURVEY.md §2.8).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libverbatim_host.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_lib_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            src = os.path.join(_NATIVE_DIR, "verbatim_host.cpp")
            stale = os.path.exists(_LIB_PATH) and (
                os.path.exists(src)
                and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
            )
            if not os.path.exists(_LIB_PATH) or stale:
                # make's own mtime rule handles the rebuild; invoking it on
                # staleness (not only absence) keeps an edited .cpp from
                # silently serving through a stale .so.
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "libverbatim_host.so"],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.project_rows.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ]
            lib.exact_rescore.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ]
            lib.analyze_text.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ]
            lib.analyze_text.restype = ctypes.c_int64
            lib.hash_tokenize.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.hash_tokenize.restype = ctypes.c_int64
            _lib = lib
            logger.info("Loaded native host runtime: %s", _LIB_PATH)
        except Exception as exc:
            logger.warning("Native host runtime unavailable (%s); using numpy", exc)
            _lib_failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def project_rows_native(
    token_ids: np.ndarray, weights: np.ndarray, projection: np.ndarray
) -> np.ndarray | None:
    """C++ SpMM sketching; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    ids = np.ascontiguousarray(token_ids, np.int32)
    w = np.ascontiguousarray(weights, np.float32)
    proj = np.ascontiguousarray(projection, np.float32)
    n, m = ids.shape
    vocab, d = proj.shape
    out = np.empty((n, d), np.float32)
    lib.project_rows(
        ids.ctypes.data, w.ctypes.data, n, m, proj.ctypes.data, vocab, d, out.ctypes.data
    )
    return out


def analyze_text_native(
    text: str, vocab_size: int, max_terms: int = 4096
) -> tuple[np.ndarray, np.ndarray, int] | None:
    """C++ BM25 analyzer; None if the library is unavailable.

    Returns (unique term ids, term frequencies, document length) with the
    same FNV-1a slot layout as the Python fallback.
    """
    lib = _load()
    if lib is None:
        return None
    raw = text.encode("utf-8", errors="ignore")
    term_ids = np.zeros(max_terms, np.int32)
    term_tfs = np.zeros(max_terms, np.int32)
    n_terms = ctypes.c_int64(0)
    dl = lib.analyze_text(
        raw,
        len(raw),
        vocab_size,
        term_ids.ctypes.data,
        term_tfs.ctypes.data,
        max_terms,
        ctypes.byref(n_terms),
    )
    n = n_terms.value
    if n >= max_terms:
        # Buffer saturated: the C scanner drops uniques past the cap, but
        # the Python fallback keeps them all — an index must not differ by
        # machine. Signal "can't handle this text" so the caller falls back.
        logger.debug("analyze_text_native saturated at %d unique terms; falling back", n)
        return None
    return term_ids[:n].copy(), term_tfs[:n].copy(), int(dl)


def hash_tokenize_native(
    text: str, vocab_size: int, reserved: int, max_tokens: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """C++ HashTokenizer scan (bit-exact vs the Python regex+blake2b path).

    Returns ``(ids int32[n], offsets int32[n, 2])`` or None when the library
    is unavailable or the text is not pure ASCII (Python's unicode-aware
    regex/lower() must handle those).
    """
    lib = _load()
    if lib is None or not text.isascii():
        return None
    raw = text.encode("ascii")
    cap = max(1, min(max_tokens, len(raw)))  # ≤1 token per input byte
    ids = np.empty(cap, np.int32)
    offsets = np.empty((cap, 2), np.int32)
    n = lib.hash_tokenize(
        raw, len(raw), vocab_size, reserved, cap,
        ids.ctypes.data, offsets.ctypes.data,
    )
    if n < 0:  # non-ASCII byte seen mid-scan (defensive; isascii covers it)
        return None
    # Copy: callers (HashTokenizer._text_cache) may retain the result, and a
    # view would pin the full cap-sized buffers — breaking the cache's
    # per-entry memory bound for low-token, long-char texts.
    return ids[:n].copy(), offsets[:n].copy()


def exact_rescore_native(
    candidate_rows: np.ndarray,
    sp_ids: np.ndarray,
    sp_weights: np.ndarray,
    q_dense: np.ndarray,
) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    rows = np.ascontiguousarray(candidate_rows, np.int64)
    ids = np.ascontiguousarray(sp_ids, np.int32)
    w = np.ascontiguousarray(sp_weights, np.float32)
    q = np.ascontiguousarray(q_dense, np.float32)
    batch, c = rows.shape
    n, m = ids.shape
    out = np.empty((batch, c), np.float32)
    lib.exact_rescore(
        rows.ctypes.data, batch, c, ids.ctypes.data, w.ctypes.data, n, m,
        q.ctypes.data, q.shape[1], out.ctypes.data,
    )
    out[rows < 0] = -np.inf
    return out

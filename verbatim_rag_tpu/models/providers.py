"""JAX-backed embedding providers for the engine.

The neural implementations of the provider contracts
(`engine/embedding_providers.py`): batched, jitted, bucket-padded forwards —
the TPU equivalents of the torch `SentenceTransformersProvider` and
`SpladeProvider` (`verbatim_rag/embedding_providers.py:52-169`).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from verbatim_rag_tpu.engine.embedding_providers import (
    DenseEmbeddingProvider,
    SparseEmbeddingProvider,
)

from .config import EncoderConfig, minilm_config
from .encoder import embed_texts, init_encoder_params
from .splade import init_splade_params, splade_topk_terms
from .tokenizer import HashTokenizer, Tokenizer

Params = dict[str, Any]


def _length_sorted_chunks(texts: Sequence[str], batch_size: int):
    """Yield ``(original_indices, chunk_texts)`` in approximate-token-length
    order.

    Mixed-length corpora batched in arrival order waste MXU time: one long
    text drags its whole chunk up to the largest padding bucket. Sorting by
    a cheap length proxy (whitespace word count — monotone enough for bucket
    assignment) groups similar lengths so each chunk pads to its OWN bucket.
    Measured on repo text with 30–500-word chunks this roughly halves padded
    tokens; output order is restored by the caller via the yielded indices.
    """
    order = sorted(range(len(texts)), key=lambda i: len(texts[i].split()))
    for start in range(0, len(order), batch_size):
        idx = order[start : start + batch_size]
        yield idx, [texts[i] for i in idx]


def _dispatch_chunks(texts, batch_size, tokenizer, max_length, forward):
    """Length-sorted, pad-to-full-batch dispatch of ``forward`` per chunk.

    The shared core of every provider encode path (host- and device-
    resident, dense and sparse): chunk in length order, pad partial chunks
    to the fixed batch shape (a fresh shape would recompile), tokenize,
    and dispatch the device forward WITHOUT materializing — callers decide
    how to concatenate/reorder. Returns ``(pending, idx_groups, perm)``:

    - ``pending``: per-chunk device outputs, device (length-sorted) order;
    - ``idx_groups``: the original caller indices per chunk, for host-side
      order restore after a single readback;
    - ``perm``: flat ``perm[original_row] = device_row`` permutation, for
      device-side order restore (``jnp.take(..., perm, axis=0)``).
    """
    pending, idx_groups = [], []
    perm = np.empty(len(texts), np.int32)
    for g, (idx, chunk) in enumerate(_length_sorted_chunks(texts, batch_size)):
        idx_groups.append(idx)
        perm[idx] = g * batch_size + np.arange(len(idx), dtype=np.int32)
        if len(chunk) < batch_size:
            chunk += [""] * (batch_size - len(chunk))
        enc = tokenizer.encode_batch(chunk, max_length=max_length)
        pending.append(
            forward(jnp.asarray(enc.input_ids), jnp.asarray(enc.attention_mask))
        )
    return pending, idx_groups, perm


class JaxDenseProvider(DenseEmbeddingProvider):
    """Dense sentence embeddings: encoder → masked mean-pool → L2 norm."""

    def __init__(
        self,
        params: Params | None = None,
        config: EncoderConfig | None = None,
        tokenizer: Tokenizer | None = None,
        max_length: int = 512,
        batch_size: int = 64,
        seed: int = 0,
        checkpoint: str | None = None,
    ):
        self.config = config or minilm_config()
        if params is None and checkpoint:
            params = _load_params_npz(
                checkpoint, init_encoder_params(jax.random.PRNGKey(seed), self.config)
            )
        self._custom_params = params is not None and checkpoint is None
        self.params = params if params is not None else init_encoder_params(
            jax.random.PRNGKey(seed), self.config
        )
        self.tokenizer = tokenizer or HashTokenizer(vocab_size=self.config.vocab_size)
        self.max_length = max_length
        self.batch_size = batch_size
        self.seed = seed
        self.checkpoint = checkpoint

    def embed_text(self, text: str) -> np.ndarray:
        return self.embed_batch([text])[0]

    def embed_batch(self, texts: Sequence[str]) -> np.ndarray:
        """Pipelined batched encode: host tokenization of chunk i+1 overlaps
        the (async-dispatched) device forward of chunk i; results are only
        materialized at the end. Partial final chunks are padded to the full
        batch size — a fresh batch shape would trigger a recompile.

        Materialization is ONE readback: per-chunk results are concatenated
        on device first. On tunneled backends every host sync costs a full
        round-trip (~31 ms), so per-chunk np.asarray serialized the whole
        pipeline (round-1 ingest bottleneck: the encode host was ~98% idle).
        """
        if not texts:
            return np.zeros((0, self.get_dimension()), np.float32)
        pending, idx_groups, _ = _dispatch_chunks(
            texts, self.batch_size, self.tokenizer, self.max_length, self._forward
        )
        full = np.asarray(
            pending[0] if len(pending) == 1 else jnp.concatenate(pending, axis=0)
        )  # one sync
        out = np.empty((len(texts), full.shape[1]), full.dtype)
        for i, idx in enumerate(idx_groups):
            out[idx] = full[i * self.batch_size : i * self.batch_size + len(idx)]
        return out

    def embed_batch_device(self, texts: Sequence[str]) -> jax.Array:
        """Like :meth:`embed_batch` but the embeddings STAY on device.

        The query serving path hands these straight to
        `DeviceVectorStore.query_batch`, which composes them into the fused
        search program — no host readback between encode and search. On a
        tunneled backend that readback is a full round-trip (~31 ms); on any
        TPU it is an HBM→host→HBM copy for nothing. Caller order is restored
        on device with a tiny permutation gather.
        """
        if not texts:
            return jnp.zeros((0, self.get_dimension()), jnp.float32)
        pending, _, perm = _dispatch_chunks(
            texts, self.batch_size, self.tokenizer, self.max_length, self._forward
        )
        full = pending[0] if len(pending) == 1 else jnp.concatenate(pending, axis=0)
        return jnp.take(full, jnp.asarray(perm), axis=0)

    def _forward(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        return embed_texts(self.params, self.config, input_ids, attention_mask)

    def get_dimension(self) -> int:
        return self.config.hidden_size

    def describe(self) -> dict:
        return _describe_jax_provider(self, "JaxDenseProvider")


class JaxSpladeProvider(SparseEmbeddingProvider):
    """SPLADE sparse embeddings with on-device top-k term selection."""

    def __init__(
        self,
        params: Params | None = None,
        config: EncoderConfig | None = None,
        tokenizer: Tokenizer | None = None,
        max_length: int = 512,
        batch_size: int = 32,
        max_nnz: int = 128,
        seed: int = 0,
        checkpoint: str | None = None,
    ):
        self.config = config or minilm_config()
        if params is None and checkpoint:
            params = _load_params_npz(
                checkpoint, init_splade_params(jax.random.PRNGKey(seed), self.config)
            )
        self._custom_params = params is not None and checkpoint is None
        self.params = params if params is not None else init_splade_params(
            jax.random.PRNGKey(seed), self.config
        )
        self.tokenizer = tokenizer or HashTokenizer(vocab_size=self.config.vocab_size)
        self.max_length = max_length
        self.batch_size = batch_size
        self.max_nnz = max_nnz
        self.seed = seed
        self.checkpoint = checkpoint

    def embed_text(self, text: str) -> dict[int, float]:
        return self.embed_batch([text])[0]

    def embed_batch(self, texts: Sequence[str]) -> list[dict[int, float]]:
        """Pipelined like the dense provider: dispatch every chunk's forward
        before materializing any of them, then fetch everything in TWO
        readbacks (device-side concat of ids and weights)."""
        ids_np, w_np = self.embed_batch_arrays(texts)
        return [
            {int(t): float(w) for t, w in zip(ids_np[i], w_np[i]) if w > 0.0}
            for i in range(len(texts))
        ]

    def embed_batch_arrays(
        self, texts: Sequence[str]
    ) -> tuple[np.ndarray, np.ndarray]:
        """Array form of :meth:`embed_batch`: ``(ids int32 [n, max_nnz],
        weights f32 [n, max_nnz])``, zero-weight slots id 0.

        The ingest fast path: the device already produces padded top-nnz
        arrays, and the store consumes padded arrays — round-tripping
        through per-chunk Python dicts (``embed_batch`` → ``_pad_sparse``)
        only costs host time. `VerbatimIndex` uses this when the store can
        accept rows directly."""
        if not texts:
            z = np.zeros((0, self.max_nnz))
            return z.astype(np.int32), z.astype(np.float32)
        pending, idx_groups, _ = _dispatch_chunks(
            texts, self.batch_size, self.tokenizer, self.max_length, self._forward
        )
        if len(pending) == 1:
            ids_np = np.asarray(pending[0][0])
            w_np = np.asarray(pending[0][1])
        else:
            ids_np = np.asarray(jnp.concatenate([p[0] for p in pending], axis=0))
            w_np = np.asarray(jnp.concatenate([p[1] for p in pending], axis=0))
        # Restore caller order and sanitize pad slots (id 0 where weight<=0,
        # the store's forward-index convention).
        ids_out = np.zeros((len(texts), self.max_nnz), np.int32)
        w_out = np.zeros((len(texts), self.max_nnz), np.float32)
        for i, idx in enumerate(idx_groups):
            base = i * self.batch_size
            for j, orig in enumerate(idx):
                row_ids = ids_np[base + j]
                row_w = w_np[base + j].astype(np.float32)
                live = row_w > 0.0
                ids_out[orig] = np.where(live, row_ids, 0)
                w_out[orig] = np.where(live, row_w, 0.0)
        return ids_out, w_out

    def embed_query_arrays_device(
        self, texts: Sequence[str]
    ) -> tuple[jax.Array, jax.Array]:
        """Device-resident query encode: ``(ids int32 [B, max_nnz], weights
        f32 [B, max_nnz])`` as jax arrays, pad slots id 0 / weight 0.

        Counterpart of :meth:`embed_batch_arrays` for the SEARCH side: the
        store consumes these directly in its fused hybrid program, so query
        term selection never round-trips the host (see
        `JaxDenseProvider.embed_batch_device`).
        """
        if not texts:
            z = jnp.zeros((0, self.max_nnz))
            return z.astype(jnp.int32), z.astype(jnp.float32)
        pending, _, perm = _dispatch_chunks(
            texts, self.batch_size, self.tokenizer, self.max_length, self._forward
        )
        if len(pending) == 1:
            ids, w = pending[0]
        else:
            ids = jnp.concatenate([p[0] for p in pending], axis=0)
            w = jnp.concatenate([p[1] for p in pending], axis=0)
        p = jnp.asarray(perm)
        ids, w = jnp.take(ids, p, axis=0), jnp.take(w, p, axis=0)
        live = w > 0.0
        return (
            jnp.where(live, ids, 0).astype(jnp.int32),
            jnp.where(live, w, 0.0).astype(jnp.float32),
        )

    def _forward(
        self, input_ids: jax.Array, attention_mask: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        return splade_topk_terms(
            self.params, self.config, input_ids, attention_mask, max_nnz=self.max_nnz
        )

    def get_dimension(self) -> int:
        return self.config.vocab_size

    def describe(self) -> dict:
        ident = _describe_jax_provider(self, "JaxSpladeProvider")
        ident["max_nnz"] = self.max_nnz
        return ident


def _describe_jax_provider(provider, class_name: str) -> dict:
    """Persisted identity for a JAX provider (ADVICE round 1: an index must
    be reloadable into the SAME vector space, or fail loudly)."""
    import dataclasses

    return {
        "class": class_name,
        "config": dataclasses.asdict(provider.config),
        "seed": provider.seed,
        "checkpoint": provider.checkpoint,
        "max_length": provider.max_length,
        "batch_size": provider.batch_size,
        # With ad-hoc params and no checkpoint path the exact weights are
        # unrecoverable — reconstruction must refuse rather than guess.
        "reconstructible": not provider._custom_params,
        "tokenizer": provider.tokenizer.describe()
        if hasattr(provider.tokenizer, "describe")
        else {"class": type(provider.tokenizer).__name__},
    }


def _load_params_npz(checkpoint: str, template: Params) -> Params:
    """Load a trainer-format ``<dir>/params.npz`` checkpoint into the
    provider's parameter pytree (`training/trainer.py` save layout)."""
    from verbatim_rag_tpu.training.trainer import Trainer

    return Trainer.load_checkpoint(checkpoint, template)


def provider_from_config(config: dict):
    """Reconstruct a JAX provider from its `describe()` identity."""
    from verbatim_rag_tpu.models.config import EncoderConfig

    if not config.get("reconstructible", True):
        raise ValueError(
            f"{config.get('class')} was built with ad-hoc parameters and no "
            "checkpoint path; its weights cannot be reconstructed. Re-save "
            "the index with a checkpoint-backed provider."
        )
    enc = EncoderConfig(**config["config"]) if config.get("config") else None
    tok_cfg = config.get("tokenizer") or {}
    tokenizer = None
    if tok_cfg.get("class") == "HashTokenizer":
        tokenizer = HashTokenizer(vocab_size=int(tok_cfg.get("vocab_size", 30522)))
    elif tok_cfg.get("class") == "HFTokenizer":
        from verbatim_rag_tpu.models.tokenizer import HFTokenizer

        path = tok_cfg.get("path")
        if not path:
            raise ValueError("HFTokenizer identity has no path; cannot reconstruct")
        tokenizer = HFTokenizer(path)
    common = dict(
        config=enc,
        tokenizer=tokenizer,
        max_length=int(config.get("max_length", 512)),
        seed=int(config.get("seed", 0)),
        checkpoint=config.get("checkpoint"),
    )
    name = config.get("class")
    if name == "JaxDenseProvider":
        return JaxDenseProvider(batch_size=int(config.get("batch_size", 64)), **common)
    if name == "JaxSpladeProvider":
        return JaxSpladeProvider(
            batch_size=int(config.get("batch_size", 32)),
            max_nnz=int(config.get("max_nnz", 128)),
            **common,
        )
    raise ValueError(f"Unknown JAX provider class {name!r}")

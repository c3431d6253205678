"""Sequence-parallel encoder forward vs the single-device forward."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from verbatim_rag_tpu.models.config import tiny_test_config  # noqa: E402
from verbatim_rag_tpu.models.encoder import (  # noqa: E402
    encoder_forward,
    encoder_forward_sp,
    init_encoder_params,
)
from verbatim_rag_tpu.parallel.mesh import make_mesh  # noqa: E402

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")

RNG = np.random.default_rng(13)


def test_sp_forward_matches_single_device():
    config = tiny_test_config(type_vocab_size=0)
    params = init_encoder_params(jax.random.PRNGKey(0), config)
    mesh = make_mesh(dp=1, tp=8)

    seq = 64  # 8 tokens per device
    ids_np = RNG.integers(3, config.vocab_size, size=(2, seq)).astype(np.int32)
    mask_np = np.ones((2, seq), np.int32)
    mask_np[1, 50:] = 0
    ids_np[1, 50:] = 0

    expected = np.asarray(
        encoder_forward(params, config, jnp.asarray(ids_np), jnp.asarray(mask_np))
    )

    shard = NamedSharding(mesh, P(None, "tp"))
    ids_sp = jax.device_put(jnp.asarray(ids_np), shard)
    mask_sp = jax.device_put(jnp.asarray(mask_np), shard)
    got = np.asarray(encoder_forward_sp(params, config, ids_sp, mask_sp, mesh))

    np.testing.assert_allclose(got[0], expected[0], rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(got[1, :50], expected[1, :50], rtol=3e-4, atol=3e-4)


def test_sp_modernbert_local_global_matches_single_device():
    """ModernBERT-style stack: ring attention for global layers + halo
    exchange for local layers, RoPE with global positions."""
    config = tiny_test_config(
        position_embedding_type="rope",
        norm_location="pre",
        activation="geglu",
        use_bias=False,
        final_norm=True,
        type_vocab_size=0,
        first_layer_no_attn_norm=True,
        global_attn_every_n_layers=2,
        local_attention_window=16,  # halo 8 ≤ shard_len 8
        num_layers=4,
    )
    params = init_encoder_params(jax.random.PRNGKey(1), config)
    mesh = make_mesh(dp=1, tp=8)

    seq = 64
    ids_np = RNG.integers(3, config.vocab_size, size=(2, seq)).astype(np.int32)
    mask_np = np.ones((2, seq), np.int32)
    mask_np[1, 40:] = 0
    ids_np[1, 40:] = 0

    expected = np.asarray(
        encoder_forward(params, config, jnp.asarray(ids_np), jnp.asarray(mask_np))
    )
    shard = NamedSharding(mesh, P(None, "tp"))
    got = np.asarray(
        encoder_forward_sp(
            params,
            config,
            jax.device_put(jnp.asarray(ids_np), shard),
            jax.device_put(jnp.asarray(mask_np), shard),
            mesh,
        )
    )
    np.testing.assert_allclose(got[0], expected[0], rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(got[1, :40], expected[1, :40], rtol=5e-4, atol=5e-4)


def test_sp_extractor_no_windowing_matches_windowed():
    """sp_mesh extraction (one sharded pass) agrees with the windowed path."""
    from verbatim_rag_tpu.models.highlighter import ModelSpanExtractor
    from verbatim_rag_tpu.models.tokenizer import HashTokenizer

    config = tiny_test_config(
        position_embedding_type="rope",
        norm_location="pre",
        activation="geglu",
        use_bias=False,
        final_norm=True,
        type_vocab_size=0,
        first_layer_no_attn_norm=True,
        global_attn_every_n_layers=2,
        local_attention_window=16,
        num_layers=2,
        max_position_embeddings=1024,
    )
    tokenizer = HashTokenizer(vocab_size=config.vocab_size)
    mesh = make_mesh(dp=1, tp=8)

    common = dict(
        config=config,
        tokenizer=tokenizer,
        threshold=0.4,
        min_span_chars=10,
        merge_gap_chars=5,
        seed=5,
    )
    # Windowed path gets a max_length large enough to hold everything, so
    # both paths see identical token layouts.
    windowed = ModelSpanExtractor(max_length=512, doc_stride=16, **common)
    sp = ModelSpanExtractor(max_length=512, doc_stride=16, sp_mesh=mesh, **common)

    context = " ".join(f"word{i} noteworthy item{i}." for i in range(40))
    spans_w = windowed.process("what is noteworthy?", context)
    spans_sp = sp.process("what is noteworthy?", context)
    assert spans_sp == spans_w


def test_sp_long_row_is_not_truncated_in_layout():
    """SP rows past the last tokenizer bucket used to be clamped to 8192 by
    bucket_length, truncating `row[:seq]` while the aggregation layout still
    expected the full context — a numpy broadcast ValueError on exactly the
    long-context inputs the SP path exists for. The forward is stubbed: this
    exercises the window/layout/aggregation plumbing only."""
    from verbatim_rag_tpu.models.config import tiny_test_config
    from verbatim_rag_tpu.models.highlighter import ModelSpanExtractor

    class StubForward(ModelSpanExtractor):
        def _forward_probs(self, ids, mask):
            return np.ones(ids.shape, np.float32) * mask

    extractor = StubForward(
        config=tiny_test_config(),
        threshold=0.5,
        min_span_chars=3,
        merge_gap_chars=5,
        sp_mesh=object(),  # only truthiness is consulted before the stub
    )
    context = "word " * 9000 + "needle."
    spans = extractor.process("find the needle", context)
    # Every token above threshold → one span covering the whole document,
    # including the region past the old 8192-token clamp.
    assert spans and spans[-1][1] == len(context)

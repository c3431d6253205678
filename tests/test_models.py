"""JAX encoders: shapes, masking, and numerical parity vs HF torch models."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from verbatim_rag_tpu.models.config import tiny_test_config  # noqa: E402
from verbatim_rag_tpu.models.encoder import (  # noqa: E402
    embed_texts,
    encoder_forward,
    init_encoder_params,
)

RNG = np.random.default_rng(1)


def _random_batch(config, batch=2, seq=16, pad_from=None):
    ids = RNG.integers(3, config.vocab_size, size=(batch, seq)).astype(np.int32)
    mask = np.ones((batch, seq), np.int32)
    if pad_from is not None:
        ids[:, pad_from:] = 0
        mask[:, pad_from:] = 0
    return jnp.asarray(ids), jnp.asarray(mask)


class TestEncoderForward:
    def test_output_shape(self):
        config = tiny_test_config()
        params = init_encoder_params(jax.random.PRNGKey(0), config)
        ids, mask = _random_batch(config)
        hidden = encoder_forward(params, config, ids, mask)
        assert hidden.shape == (2, 16, config.hidden_size)
        assert np.isfinite(np.asarray(hidden)).all()

    def test_padding_does_not_leak(self):
        """Same tokens, different pad lengths → same unpadded hidden states."""
        config = tiny_test_config()
        params = init_encoder_params(jax.random.PRNGKey(0), config)
        ids = RNG.integers(3, config.vocab_size, size=(1, 8)).astype(np.int32)

        short_ids = jnp.asarray(ids)
        short_mask = jnp.ones((1, 8), jnp.int32)
        long_ids = jnp.asarray(np.pad(ids, ((0, 0), (0, 8))))
        long_mask = jnp.asarray(np.pad(np.ones((1, 8), np.int32), ((0, 0), (0, 8))))

        h_short = np.asarray(encoder_forward(params, config, short_ids, short_mask))
        h_long = np.asarray(encoder_forward(params, config, long_ids, long_mask))
        np.testing.assert_allclose(h_long[:, :8], h_short, rtol=2e-4, atol=2e-5)

    def test_modernbert_style_forward(self):
        config = tiny_test_config(
            position_embedding_type="rope",
            norm_location="pre",
            activation="geglu",
            use_bias=False,
            final_norm=True,
            type_vocab_size=0,
            first_layer_no_attn_norm=True,
            global_attn_every_n_layers=2,
            local_attention_window=4,
        )
        params = init_encoder_params(jax.random.PRNGKey(0), config)
        ids, mask = _random_batch(config)
        hidden = encoder_forward(params, config, ids, mask)
        assert np.isfinite(np.asarray(hidden)).all()

    def test_embed_texts_normalized(self):
        config = tiny_test_config()
        params = init_encoder_params(jax.random.PRNGKey(0), config)
        ids, mask = _random_batch(config, pad_from=10)
        vecs = np.asarray(embed_texts(params, config, ids, mask))
        np.testing.assert_allclose(np.linalg.norm(vecs, axis=-1), 1.0, rtol=1e-5)


class TestHFParityBert:
    """Convert a RANDOM torch BertModel and match hidden states (offline)."""

    @pytest.fixture(scope="class")
    def torch_and_jax(self):
        torch = pytest.importorskip("torch")
        from transformers import BertConfig, BertModel

        from verbatim_rag_tpu.models.hf_convert import convert_bert_state_dict

        hf_config = BertConfig(
            vocab_size=120,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=64,
            max_position_embeddings=64,
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
        torch.manual_seed(0)
        model = BertModel(hf_config).eval()
        config = tiny_test_config(vocab_size=120)
        params = convert_bert_state_dict(model.state_dict(), config)
        return torch, model, config, params

    def test_hidden_state_parity(self, torch_and_jax):
        torch, model, config, params = torch_and_jax
        ids = RNG.integers(3, 120, size=(2, 12)).astype(np.int64)
        mask = np.ones((2, 12), np.int64)
        mask[1, 9:] = 0
        ids[1, 9:] = 0

        with torch.no_grad():
            expected = model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()

        got = np.asarray(
            encoder_forward(
                params, config, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
            )
        )
        # Compare only unmasked positions.
        np.testing.assert_allclose(got[0], expected[0], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(got[1, :9], expected[1, :9], rtol=2e-4, atol=2e-4)


class TestHFParityModernBert:
    @pytest.fixture(scope="class")
    def torch_and_jax(self):
        torch = pytest.importorskip("torch")
        from transformers import ModernBertConfig, ModernBertModel

        from verbatim_rag_tpu.models.config import modernbert_base_config
        from verbatim_rag_tpu.models.hf_convert import convert_modernbert_state_dict

        hf_config = ModernBertConfig(
            pad_token_id=0,
            bos_token_id=1,
            eos_token_id=2,
            cls_token_id=1,
            sep_token_id=2,
            vocab_size=120,
            hidden_size=32,
            num_hidden_layers=4,
            num_attention_heads=4,
            intermediate_size=48,
            max_position_embeddings=64,
            global_attn_every_n_layers=2,
            local_attention=8,
            attention_dropout=0.0,
            mlp_dropout=0.0,
            embedding_dropout=0.0,
        )
        torch.manual_seed(0)
        model = ModernBertModel(hf_config).eval()
        config = modernbert_base_config(
            compute_dtype="float32",  # parity vs torch f32
            use_flash_attention=False,
            vocab_size=120,
            hidden_size=32,
            num_layers=4,
            num_heads=4,
            intermediate_size=48,
            max_position_embeddings=64,
            global_attn_every_n_layers=2,
            local_attention_window=8,
            layer_norm_eps=hf_config.norm_eps,
            global_rope_theta=hf_config.global_rope_theta,
            local_rope_theta=hf_config.local_rope_theta,
        )
        params = convert_modernbert_state_dict(model.state_dict(), config)
        return torch, model, config, params

    def test_hidden_state_parity(self, torch_and_jax):
        torch, model, config, params = torch_and_jax
        ids = RNG.integers(3, 120, size=(2, 16)).astype(np.int64)
        mask = np.ones((2, 16), np.int64)

        with torch.no_grad():
            expected = model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()

        got = np.asarray(
            encoder_forward(
                params, config, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
            )
        )
        np.testing.assert_allclose(got, expected, rtol=5e-4, atol=5e-4)


class TestSplade:
    def test_nonnegative_and_shape(self):
        from verbatim_rag_tpu.models.splade import init_splade_params, splade_forward

        config = tiny_test_config()
        params = init_splade_params(jax.random.PRNGKey(0), config)
        ids, mask = _random_batch(config, pad_from=10)
        acts = np.asarray(splade_forward(params, config, ids, mask))
        assert acts.shape == (2, config.vocab_size)
        assert (acts >= 0).all()

    def test_topk_terms(self):
        from verbatim_rag_tpu.models.splade import init_splade_params, splade_topk_terms

        config = tiny_test_config()
        params = init_splade_params(jax.random.PRNGKey(0), config)
        ids, mask = _random_batch(config)
        term_ids, weights = splade_topk_terms(params, config, ids, mask, max_nnz=8)
        assert term_ids.shape == (2, 8)
        w = np.asarray(weights)
        assert (np.diff(w, axis=1) <= 1e-6).all()  # sorted descending


class TestCrossEncoder:
    def test_scores(self):
        from verbatim_rag_tpu.models.reranker import JaxCrossEncoder

        ce = JaxCrossEncoder(config=tiny_test_config())
        scores = ce.score("what is solar power", ["solar energy text", "pasta recipe"])
        assert scores.shape == (2,)
        assert np.isfinite(scores).all()


class TestProviderLengthBucketing:
    """embed_batch length-sorts texts into per-bucket chunks; results must
    come back in the caller's original order regardless."""

    def _texts(self):
        rng = np.random.default_rng(11)
        return [
            " ".join(f"word{rng.integers(50)}" for _ in range(n))
            for n in rng.integers(2, 60, size=13)
        ]

    def test_dense_order_restored(self):
        from verbatim_rag_tpu.models.providers import JaxDenseProvider

        prov = JaxDenseProvider(config=tiny_test_config(), max_length=64, batch_size=4)
        texts = self._texts()
        batched = prov.embed_batch(texts)
        assert batched.shape == (len(texts), prov.get_dimension())
        for i in (0, 5, len(texts) - 1):
            solo = prov.embed_text(texts[i])
            np.testing.assert_allclose(batched[i], solo, rtol=2e-2, atol=2e-2)

    def test_dense_empty(self):
        from verbatim_rag_tpu.models.providers import JaxDenseProvider

        prov = JaxDenseProvider(config=tiny_test_config(), max_length=64, batch_size=4)
        assert prov.embed_batch([]).shape == (0, prov.get_dimension())

    def test_sparse_order_restored(self):
        from verbatim_rag_tpu.models.providers import JaxSpladeProvider

        prov = JaxSpladeProvider(
            config=tiny_test_config(), max_length=64, batch_size=4, max_nnz=8
        )
        texts = self._texts()
        batched = prov.embed_batch(texts)
        assert len(batched) == len(texts)
        assert prov.embed_batch([]) == []
        for i in (0, 5, len(texts) - 1):
            solo = prov.embed_text(texts[i])
            assert set(solo) == set(batched[i])

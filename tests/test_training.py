"""Training: dataset encoding, loss, train step convergence, checkpointing."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from verbatim_rag_tpu.models.config import TrainingConfig, tiny_test_config  # noqa: E402
from verbatim_rag_tpu.models.tokenizer import HashTokenizer  # noqa: E402
from verbatim_rag_tpu.training.dataset import (  # noqa: E402
    QADatasetEncoder,
    make_synthetic_qadata,
)
from verbatim_rag_tpu.training.model import init_qa_model_params, sentence_loss  # noqa: E402
from verbatim_rag_tpu.training.trainer import Trainer, metrics_from_counts  # noqa: E402

CONFIG = tiny_test_config(max_position_embeddings=512)


@pytest.fixture(scope="module")
def encoder():
    return QADatasetEncoder(
        HashTokenizer(vocab_size=CONFIG.vocab_size), max_length=256, max_sentences=8
    )


@pytest.fixture(scope="module")
def data():
    return make_synthetic_qadata(n_samples=24)


class TestDatasetEncoding:
    def test_fixed_shapes(self, encoder, data):
        batches = list(encoder.iter_batches(data.filter_split("train"), batch_size=4))
        batch = batches[0]
        assert batch.input_ids.shape[0] == 4
        assert batch.boundaries.shape == (4, 8, 2)
        assert batch.sentence_mask.shape == (4, 8)

    def test_boundaries_are_within_sequence(self, encoder, data):
        for batch in encoder.iter_batches(data.filter_split("train"), batch_size=4):
            seq = batch.input_ids.shape[1]
            assert (batch.boundaries <= seq).all()
            active = batch.sentence_mask.astype(bool)
            starts = batch.boundaries[..., 0][active]
            ends = batch.boundaries[..., 1][active]
            assert (ends > starts).all()

    def test_labels_follow_mask(self, encoder, data):
        for batch in encoder.iter_batches(data.filter_split("train"), batch_size=4):
            assert (batch.labels[batch.sentence_mask == 0] == 0).all()


class TestLossAndStep:
    def test_loss_finite(self, encoder, data):
        params = init_qa_model_params(jax.random.PRNGKey(0), CONFIG)
        batch = next(iter(encoder.iter_batches(data.filter_split("train"), 4)))
        loss, aux = sentence_loss(
            params,
            CONFIG,
            {
                "input_ids": jnp.asarray(batch.input_ids),
                "attention_mask": jnp.asarray(batch.attention_mask),
                "boundaries": jnp.asarray(batch.boundaries),
                "sentence_mask": jnp.asarray(batch.sentence_mask),
                "labels": jnp.asarray(batch.labels),
            },
        )
        assert np.isfinite(float(loss))
        assert float(aux["n_sentences"]) > 0

    def test_training_reduces_loss(self, encoder, data, tmp_path):
        params = init_qa_model_params(jax.random.PRNGKey(0), CONFIG)
        tc = TrainingConfig(learning_rate=5e-4, num_epochs=4, batch_size=8)
        trainer = Trainer(params, CONFIG, tc, output_dir=str(tmp_path))
        batches = list(encoder.iter_batches(data.filter_split("train"), 8))
        result = trainer.train(batches, dev_batches=batches[:1])
        losses = [r["train_loss"] for r in result["history"]]
        assert losses[-1] < losses[0]

    def test_checkpoint_roundtrip(self, encoder, data, tmp_path):
        params = init_qa_model_params(jax.random.PRNGKey(0), CONFIG)
        trainer = Trainer(params, CONFIG, TrainingConfig(num_epochs=1), str(tmp_path))
        trainer.save_checkpoint(str(tmp_path / "ckpt"))
        loaded = Trainer.load_checkpoint(str(tmp_path / "ckpt"), params)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_metrics_from_counts(self):
        m = metrics_from_counts(
            {"tp": 3, "fp": 1, "fn": 1, "n_correct": 8, "n_sentences": 10}
        )
        assert m["precision"] == 0.75
        assert m["recall"] == 0.75
        assert m["f1"] == pytest.approx(0.75)
        assert m["accuracy"] == 0.8


class TestShardedTraining:
    def test_train_step_on_mesh(self, encoder, data, tmp_path):
        from verbatim_rag_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(dp=4, tp=2)
        params = init_qa_model_params(jax.random.PRNGKey(0), CONFIG)
        trainer = Trainer(
            params, CONFIG, TrainingConfig(num_epochs=1, batch_size=8), str(tmp_path), mesh=mesh
        )
        batches = list(encoder.iter_batches(data.filter_split("train"), 8, drop_remainder=True))
        result = trainer.train(batches[:2])
        assert np.isfinite(result["history"][0]["train_loss"])


class TestRagbenchConversion:
    def test_convert_example(self):
        from verbatim_rag_tpu.training.preprocess_ragbench import convert_example

        example = {
            "question": "q?",
            "all_relevant_sentence_keys": ["0a"],
            "documents_sentences": [[["0a", "Relevant sentence."], ["0b", "Noise."]]],
        }
        sample = convert_example(example)
        assert sample.documents[0].sentences[0].relevant is True
        assert sample.documents[0].sentences[1].relevant is False


class TestOrbaxCheckpoint:
    def test_orbax_roundtrip(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        params = init_qa_model_params(jax.random.PRNGKey(0), CONFIG)
        trainer = Trainer(params, CONFIG, TrainingConfig(num_epochs=1), str(tmp_path))
        trainer.save_checkpoint(str(tmp_path / "ck"), format="orbax")
        loaded = Trainer.load_checkpoint_orbax(str(tmp_path / "ck"), params)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEmptyEncodes:
    def test_encode_pairs_empty_returns_empty_batch(self, encoder):
        batch = encoder.encode_pairs([])
        assert batch.input_ids.shape[0] == 0

    def test_token_encode_empty_returns_empty_batch(self):
        from verbatim_rag_tpu.models.tokenizer import HashTokenizer
        from verbatim_rag_tpu.training.token_dataset import TokenDatasetEncoder

        enc = TokenDatasetEncoder(HashTokenizer(vocab_size=1000), max_length=64)
        batch = enc.encode([])
        assert batch.input_ids.shape[0] == 0
